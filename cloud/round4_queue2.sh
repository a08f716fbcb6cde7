#!/bin/bash
# Round-4 TPU queue, take 2 — chained behind queue1 (waits on its pid file).
#
#   A. Perf follow-ups on the freed chip (both hold .tpu.lock themselves):
#      bench_refine (per-scene optimization cost frontier) and
#      bench_headline_variants (uint8 vs f32 input transfer A/B).
#   B. exp2_e74 — NATIVE finer-lattice arm: --feature_size 74 with
#      --train_encoder (+ pooled attention).  The g74 arms upsample the
#      37x37 features (interpolation adds lattice sites but no new
#      information — its loss plateaued at ~0.38 vs k8's 0.21); the
#      encoder emitting 74x74 directly from the 256^2 image carries REAL
#      high-frequency content past the old grid's Nyquist (T-038/T-045).
#      K=1 -> 5476 Gaussians, budget-matched to the K=4 flagship.
cd "$(dirname "$0")/.."
mkdir -p logs results checkpoints
LOCK=.tpu.lock
run () { flock "$LOCK" "$@"; }

if [ -f /tmp/queue1.pid ]; then
  while kill -0 "$(cat /tmp/queue1.pid)" 2>/dev/null; do sleep 60; done
fi

# ---- A. perf follow-ups ----
if [ ! -f results/bench_refine.json ]; then
  python -u experiments/bench_refine.py --scenes 4 --res 256 \
    > logs/bench_refine.log 2>&1
fi
python -u experiments/bench_headline_variants.py \
  > logs/bench_headline_variants.log 2>&1

# ---- B. exp2_e74 ----
evalrun () {  # $1=ckpt $2=tag
  run python -u -m fresnel_tpu.cli eval "$1" --data_dir data/corpus_v1 \
    --output_json "results/eval_$2_train.json" \
    --save_grid "results/$2_train_grid.png" >> "logs/$2.log" 2>&1
  run python -u -m fresnel_tpu.cli eval "$1" --data_dir data/corpus_v1_eval \
    --output_json "results/eval_$2_eval.json" \
    --save_grid "results/$2_eval_grid.png" >> "logs/$2.log" 2>&1
}

seg () {  # seg TAG OUTDIR STOP RESUME FLAGS...
  local tag=$1 out=$2 stop=$3 resume=$4; shift 4
  local ck="$out/checkpoint_epoch$stop.msgpack"
  [ -f "$ck" ] && return 0
  if [ -f "results/${tag}_epoch$stop.msgpack" ]; then
    mkdir -p "$out"; cp "results/${tag}_epoch$stop.msgpack" "$ck"
    cp -f "results/${tag}_epoch$stop.msgpack.json" "$ck.json" 2>/dev/null
    return 0
  fi
  local rflag=""
  [ -n "$resume" ] && rflag="--resume $out/checkpoint_epoch$resume.msgpack"
  run python -u -m fresnel_tpu.train.train_gaussian_decoder "$@" \
    --output_dir "$out" --stop_epoch "$stop" $rflag >> "logs/$tag.log" 2>&1
  cp -f "$ck" "results/${tag}_epoch$stop.msgpack"
  cp -f "$ck.json" "results/${tag}_epoch$stop.msgpack.json"
}

E74="--experiment 2 --data_dir data/corpus_v1 --batch_size 4 --lr 2e-4
  --max_per_tile 1024 --depth_offset_init -0.128 --surface_init
  --no_augmentation --train_encoder --epochs 300
  --feature_size 74 --encoder_attn_pool 2 --gaussians_per_patch 1"
out=checkpoints/exp2_e74
if [ ! -f results/eval_exp2_e74_eval.json ]; then
  seg exp2_e74 $out 75  ""  $E74
  seg exp2_e74 $out 150 75  $E74
  seg exp2_e74 $out 225 150 $E74
  if [ ! -f $out/final_model.msgpack ]; then
    run python -u -m fresnel_tpu.train.train_gaussian_decoder $E74 \
      --output_dir $out \
      --resume $out/checkpoint_epoch225.msgpack >> logs/exp2_e74.log 2>&1
  fi
  evalrun $out/final_model.msgpack exp2_e74
  cp -f $out/final_model.msgpack results/exp2_e74_model.msgpack
  cp -f $out/final_model.msgpack.json results/exp2_e74_model.msgpack.json
  rm -f results/exp2_e74_epoch*.msgpack results/exp2_e74_epoch*.msgpack.json
fi

echo "queue2 done $(date -u)" | tee -a logs/round4_queue2.log
