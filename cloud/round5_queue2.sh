#!/bin/bash
# Round-5 TPU queue, take 2 — the T-048 follow-up: the one untested cell
# in the lattice×capacity matrix.
#
#   E. exp2_e74k2: NATIVE 74×74 encoder lattice (attn-pool 2) at
#      gaussians_per_patch=2 — 74²×2 = 10 952 Gaussians = exactly K=8's
#      budget at 37².  T-048 showed the native fine lattice is the only
#      arm that moves the >9.5-cycle eval bands but that K=1 per-site
#      cannot PLACE the energy (eval 0.686 vs K=8's 0.719) and that
#      epochs 150→300 overfit (0.715→0.686).  e74k2 asks: with per-site
#      anisotropic capacity restored, does the moved spectrum finally
#      pay in SSIM?  Mid-eval at 150 epochs is the decision point the
#      T-048 overfitting analysis calls for; 300 completes the curve.
#
# Launch pattern: started alongside queue1 with a wait-guard — it only
# touches the chip after round5_queue1.sh (PID file /tmp/queue5.pid)
# has exited, so the two queues never interleave training runs.
# Durability: identical to queue1 (thin segment checkpoints on the
# orphan `durable` branch; all TPU commands serialize on .tpu.lock).
cd "$(dirname "$0")/.."
mkdir -p logs results checkpoints

# ---- wait for queue1 to finish ------------------------------------------
if [ -f /tmp/queue5.pid ]; then
  while kill -0 "$(cat /tmp/queue5.pid)" 2>/dev/null; do sleep 120; done
fi

LOCK=.tpu.lock
run () { flock "$LOCK" "$@"; }

# Corpus gate (same as queue1 stage 0 — survives a reset between queues).
if [ ! -f data/corpus_v1/scene_0159.png ] || \
   [ ! -f data/corpus_v1_eval/scene_0023.png ]; then
  bash cloud/make_corpus.sh > logs/make_corpus.log 2>&1
fi

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
  local n e f
  for n in $(python tools/durable_store.py list "${tag}_epoch" \
               | grep -v '\.json$'); do
    e=${n##*_epoch}; e=${e%.msgpack}
    f="$out/checkpoint_epoch$e.msgpack"
    [ -f "$f" ] || python tools/durable_store.py get "$n" "$f"
  done
  [ -f "$ck" ] && return 0
  local best="" beste=-1
  for f in "$out"/checkpoint_epoch*.msgpack; do
    [ -f "$f" ] || continue
    e=${f##*checkpoint_epoch}; e=${e%.msgpack}
    if [ "$e" -lt "$stop" ] 2>/dev/null && [ "$e" -gt "$beste" ]; then
      best=$f; beste=$e
    fi
  done
  local rflag=""
  if [ -n "$best" ]; then
    rflag="--resume $best"
  elif [ -n "$resume" ]; then
    rflag="--resume $out/checkpoint_epoch$resume.msgpack"
  fi
  run python -u -m fresnel_tpu.train.train_gaussian_decoder "$@" \
    --output_dir "$out" --stop_epoch "$stop" $rflag >> "logs/$tag.log" 2>&1
  [ -f "$ck" ] || return 1
  python -m fresnel_tpu.train.thin_ckpt "$ck" "/tmp/${tag}_thin.msgpack" \
    >> "logs/$tag.log" 2>&1 && \
  python tools/durable_store.py put "/tmp/${tag}_thin.msgpack" \
    --name "${tag}_epoch$stop.msgpack" --prune-prefix "${tag}_epoch" \
    >> "logs/$tag.log" 2>&1
}

finalize () {  # finalize TAG OUTDIR LASTSEG FLAGS...
  local tag=$1 out=$2 last=$3; shift 3
  if [ ! -f "$out/final_model.msgpack" ] && \
     [ -f "$out/checkpoint_epoch$last.msgpack" ]; then
    run python -u -m fresnel_tpu.train.train_gaussian_decoder "$@" \
      --output_dir "$out" \
      --resume "$out/checkpoint_epoch$last.msgpack" >> "logs/$tag.log" 2>&1
  fi
  if [ -f "$out/final_model.msgpack" ]; then
    python -m fresnel_tpu.train.thin_ckpt "$out/final_model.msgpack" \
      "results/${tag}_model.msgpack" >> "logs/$tag.log" 2>&1
    python tools/durable_store.py put "results/${tag}_model.msgpack" \
      --prune-prefix "${tag}_epoch" >> "logs/$tag.log" 2>&1
    return 0
  fi
  return 1
}

# ---- stage E: exp2_e74k2 (74² native lattice × K=2 = K=8's budget) ------
E74K2="--experiment 2 --data_dir data/corpus_v1 --batch_size 4 --lr 2e-4
  --max_per_tile 1024 --depth_offset_init -0.128 --surface_init
  --no_augmentation --train_encoder --epochs 300
  --feature_size 74 --encoder_attn_pool 2 --gaussians_per_patch 2"
out=checkpoints/exp2_e74k2
if [ ! -f results/eval_exp2_e74k2_eval.json ]; then
  prev=""
  for stop in 50 100 150 200 250; do
    seg exp2_e74k2 $out $stop "$prev" $E74K2 || break
    prev=$stop
    if [ "$stop" = 150 ] && [ ! -f results/eval_exp2_e74k2_mid_eval.json ]
    then
      evalrun $out/checkpoint_epoch150.msgpack exp2_e74k2_mid \
        data/corpus_v1 data/corpus_v1_eval
      python experiments/spectrum_gap.py \
        results/exp2_e74k2_mid_eval_grid.png \
        > results/spectrum_exp2_e74k2_mid.txt 2>&1
    fi
  done
  if finalize exp2_e74k2 $out 250 $E74K2; then
    evalrun $out/final_model.msgpack exp2_e74k2 \
      data/corpus_v1 data/corpus_v1_eval
    python experiments/spectrum_gap.py results/exp2_e74k2_eval_grid.png \
      > results/spectrum_exp2_e74k2.txt 2>&1
  fi
fi

echo "round5 queue2 done $(date -u)" | tee -a logs/round5_queue2.log
