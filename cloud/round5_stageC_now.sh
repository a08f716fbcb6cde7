#!/bin/bash
# Companion: run stage C (exp2_g74zi zero-init validation, corpus_v1
# only) IMMEDIATELY, while queue3's stage 0 is still raytracing
# corpus_v2 on the single host CPU (~35 min) — otherwise the chip sits
# idle.  flock serializes segments against queue3's later stages; by
# the time queue3 reaches its own stage C the eval JSON exists and it
# skips.  Companion script, NOT an edit of the running queue.
cd "$(dirname "$0")/.."
mkdir -p logs results checkpoints
LOCK=.tpu.lock
run () { flock "$LOCK" "$@"; }

# Wait only for corpus_v1 (+eval), not v2.
while [ ! -f data/corpus_v1/scene_0159.png ] || \
      [ ! -f data/corpus_v1_eval/scene_0023.png ]; do sleep 20; done

evalrun () {  # $1=ckpt $2=tag $3=train_dir $4=eval_dir
  run python -u -m fresnel_tpu.cli eval "$1" --data_dir "$3" \
    --output_json "results/eval_$2_train.json" \
    --save_grid "results/$2_train_grid.png" >> "logs/$2.log" 2>&1
  run python -u -m fresnel_tpu.cli eval "$1" --data_dir "$4" \
    --output_json "results/eval_$2_eval.json" \
    --save_grid "results/$2_eval_grid.png" >> "logs/$2.log" 2>&1
}

seg () {  # seg TAG OUTDIR STOP RESUME FLAGS...
  local tag=$1 out=$2 stop=$3 resume=$4; shift 4
  local ck="$out/checkpoint_epoch$stop.msgpack"
  [ -f "$ck" ] && return 0
  mkdir -p "$out"
  local best="" beste=-1 e f
  for f in "$out"/checkpoint_epoch*.msgpack; do
    [ -f "$f" ] || continue
    e=${f##*checkpoint_epoch}; e=${e%.msgpack}
    if [ "$e" -lt "$stop" ] 2>/dev/null && [ "$e" -gt "$beste" ]; then
      best=$f; beste=$e
    fi
  done
  local rflag=""
  [ -n "$best" ] && rflag="--resume $best"
  run python -u -m fresnel_tpu.train.train_gaussian_decoder "$@" \
    --output_dir "$out" --stop_epoch "$stop" $rflag >> "logs/$tag.log" 2>&1
  [ -f "$ck" ] || return 1
  python -m fresnel_tpu.train.thin_ckpt "$ck" "/tmp/${tag}_thin.msgpack" \
    >> "logs/$tag.log" 2>&1 && \
  python tools/durable_store.py put "/tmp/${tag}_thin.msgpack" \
    --name "${tag}_epoch$stop.msgpack" --prune-prefix "${tag}_epoch" \
    >> "logs/$tag.log" 2>&1
}

GZI="--experiment 2 --data_dir data/corpus_v1 --batch_size 8 --lr 2e-4
  --max_per_tile 1024 --depth_offset_init -0.128 --surface_init
  --no_augmentation --train_encoder --epochs 150
  --feature_upsample 2 --gaussians_per_patch 2"
out=checkpoints/exp2_g74zi
if [ ! -f results/eval_exp2_g74zi_eval.json ]; then
  prev=""
  for stop in 50 100; do
    seg exp2_g74zi $out $stop "$prev" $GZI || break
    prev=$stop
  done
  if [ ! -f "$out/final_model.msgpack" ] && \
     [ -f "$out/checkpoint_epoch100.msgpack" ]; then
    run python -u -m fresnel_tpu.train.train_gaussian_decoder $GZI \
      --output_dir "$out" \
      --resume "$out/checkpoint_epoch100.msgpack" >> logs/exp2_g74zi.log 2>&1
  fi
  if [ -f "$out/final_model.msgpack" ]; then
    python -m fresnel_tpu.train.thin_ckpt "$out/final_model.msgpack" \
      results/exp2_g74zi_model.msgpack >> logs/exp2_g74zi.log 2>&1
    python tools/durable_store.py put results/exp2_g74zi_model.msgpack \
      --prune-prefix "exp2_g74zi_epoch" >> logs/exp2_g74zi.log 2>&1
    evalrun "$out/final_model.msgpack" exp2_g74zi \
      data/corpus_v1 data/corpus_v1_eval
  fi
fi
echo "stageC companion done $(date -u)" | tee -a logs/round5_stageC.log
