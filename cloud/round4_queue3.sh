#!/bin/bash
# Round-4 TPU queue, take 3 — chained behind queue2 (waits on its pid
# file).  CVS on exact-GT corpus_v2 pairs, time-boxed to 100 epochs
# (the round-3 arms' budget) so it completes inside the round: queue1's
# 150-epoch CVS arm was preempted to let the exp2_e74 lattice arm run
# first (higher adjudication value).  Segments resume whatever queue1
# already trained.  Ends with the end-to-end CVS -> optimize_3dgs -> GT
# scoring the reference never produced (experiments/eval_cvs_e2e.py).
cd "$(dirname "$0")/.."
mkdir -p logs results
LOCK=.tpu.lock
run () { flock "$LOCK" "$@"; }

if [ -f /tmp/queue2.pid ]; then
  while kill -0 "$(cat /tmp/queue2.pid)" 2>/dev/null; do sleep 60; done
fi

CVS="--gt_multiview --data_dir data/corpus_v2
  --dataset_cache data/cvs_gt_cache.npz
  --image_size 256 --base_channels 128 --batch_size 4 --use_amp
  --concat_input_view --epochs 100 --output_dir checkpoints_cvs_gt"
if [ ! -f results/eval_cvs_gt.json ]; then
  if [ ! -f checkpoints_cvs_gt/cvs.msgpack ]; then
    run python -u -m fresnel_tpu.train.train_cvs $CVS --stop_epoch 25 \
      >> logs/cvs_gt.log 2>&1
  fi
  for STOP in "--stop_epoch 50" "--stop_epoch 75" ""; do
    [ -f checkpoints_cvs_gt/cvs_final.msgpack ] && break
    run python -u -m fresnel_tpu.train.train_cvs $CVS $STOP \
      --resume checkpoints_cvs_gt/cvs.msgpack >> logs/cvs_gt.log 2>&1
  done
  run python -u experiments/eval_cvs.py \
    --ckpt checkpoints_cvs_gt/cvs_final.msgpack \
    --cache data/cvs_gt_cache.npz --n 24 \
    --grid results/cvs_gt_grid.png \
    --out_json results/eval_cvs_gt.json >> logs/cvs_gt.log 2>&1
  run python -u experiments/cvs_denoise_curve.py \
    --ckpt checkpoints_cvs_gt/cvs_final.msgpack --n 16 \
    --cache data/cvs_gt_cache.npz \
    --out_json results/cvs_gt_denoise_curve.json >> logs/cvs_gt.log 2>&1
fi

# End-to-end: CVS views -> multi-view 3DGS fit -> score vs raytraced GT.
if [ -f checkpoints_cvs_gt/cvs_final.msgpack ] && \
   [ ! -f results/eval_cvs_e2e.json ]; then
  python -u experiments/eval_cvs_e2e.py \
    --ckpt checkpoints_cvs_gt/cvs_final.msgpack \
    --scenes data/corpus_v2/scene_0000.png data/corpus_v2/scene_0001.png \
             data/corpus_v2/scene_0002.png \
    --out_json results/eval_cvs_e2e.json > logs/cvs_e2e.log 2>&1
fi

echo "queue3 done $(date -u)" | tee -a logs/round4_queue3.log
