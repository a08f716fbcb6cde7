#!/bin/bash
# Companion watcher for queue3 stage B: as soon as the 50-epoch CVS-GT
# checkpoint exists (checkpoints_cvs_gt/cvs.msgpack), run the one-step
# eval + denoise curve on it, so round-3 ask #6 (>20 dB one-step or
# adjudicated negative) gets an honest mid-number even if the 100-epoch
# final does not land before the session ends.  Companion script, NOT
# an edit of the running queue.
cd "$(dirname "$0")/.."
LOCK=.tpu.lock
run () { flock "$LOCK" "$@"; }

for _ in $(seq 1 400); do
  if [ -f checkpoints_cvs_gt/cvs.msgpack ] && \
     [ ! -f results/eval_cvs_gt_mid.json ]; then
    sleep 10
    run python -u experiments/eval_cvs.py \
      --ckpt checkpoints_cvs_gt/cvs.msgpack \
      --cache data/cvs_gt_cache.npz --n 24 \
      --grid results/cvs_gt_mid_grid.png \
      --out_json results/eval_cvs_gt_mid.json >> logs/cvs_gt.log 2>&1
    run python -u experiments/cvs_denoise_curve.py \
      --ckpt checkpoints_cvs_gt/cvs.msgpack --n 16 \
      --cache data/cvs_gt_cache.npz \
      --out_json results/cvs_gt_mid_denoise_curve.json \
      >> logs/cvs_gt.log 2>&1
    exit 0
  fi
  [ -f results/eval_cvs_gt.json ] && exit 0
  sleep 60
done
