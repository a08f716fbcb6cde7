#!/bin/bash
# Round-4 TPU queue, take 4 — chained behind queue3.  Validates the
# T-045 zero-init fix: exp2_g74zi reruns the interpolated-lattice arm
# (feature_upsample=2, K=2) with the now-zero-initialized refinement
# residual, time-boxed to 150 epochs — enough to show whether the
# collapse was the init (loss should track k8's early trajectory) or
# the interpolation itself.
cd "$(dirname "$0")/.."
mkdir -p logs results checkpoints
LOCK=.tpu.lock
run () { flock "$LOCK" "$@"; }

if [ -f /tmp/queue3.pid ]; then
  while kill -0 "$(cat /tmp/queue3.pid)" 2>/dev/null; do sleep 60; done
fi

seg () {
  local tag=$1 out=$2 stop=$3 resume=$4; shift 4
  local ck="$out/checkpoint_epoch$stop.msgpack"
  [ -f "$ck" ] && return 0
  local rflag=""
  [ -n "$resume" ] && rflag="--resume $out/checkpoint_epoch$resume.msgpack"
  run python -u -m fresnel_tpu.train.train_gaussian_decoder "$@" \
    --output_dir "$out" --stop_epoch "$stop" $rflag >> "logs/$tag.log" 2>&1
}

GZI="--experiment 2 --data_dir data/corpus_v1 --batch_size 8 --lr 2e-4
  --max_per_tile 1024 --depth_offset_init -0.128 --surface_init
  --no_augmentation --train_encoder --epochs 150
  --feature_upsample 2 --gaussians_per_patch 2"
out=checkpoints/exp2_g74zi
if [ ! -f results/eval_exp2_g74zi_eval.json ]; then
  seg exp2_g74zi $out 75 "" $GZI
  if [ ! -f $out/final_model.msgpack ]; then
    run python -u -m fresnel_tpu.train.train_gaussian_decoder $GZI \
      --output_dir $out \
      --resume $out/checkpoint_epoch75.msgpack >> logs/exp2_g74zi.log 2>&1
  fi
  run python -u -m fresnel_tpu.cli eval $out/final_model.msgpack \
    --data_dir data/corpus_v1 \
    --output_json results/eval_exp2_g74zi_train.json \
    --save_grid results/exp2_g74zi_train_grid.png >> logs/exp2_g74zi.log 2>&1
  run python -u -m fresnel_tpu.cli eval $out/final_model.msgpack \
    --data_dir data/corpus_v1_eval \
    --output_json results/eval_exp2_g74zi_eval.json \
    --save_grid results/exp2_g74zi_eval_grid.png >> logs/exp2_g74zi.log 2>&1
fi

echo "queue4 done $(date -u)" | tee -a logs/round4_queue4.log
