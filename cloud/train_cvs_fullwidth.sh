#!/bin/bash
# Round-3 CVS full-width campaign (VERDICT item #8): base-128 U-Net @256²,
# bf16 AMP, teacher-multiview pairs (480 orbit pairs from the quality
# campaign's SSIM-0.985 per-scene teacher clouds — the closest no-egress
# stand-in for the reference's real multi-view data;
# reference: scripts/training/train_cvs.py + consistency_view_synthesis.py).
#
# Segmented per the axon execution-cache host-RAM leak (T-026): each
# segment is a fresh process resuming the previous boundary checkpoint;
# the consistency-weight ramp spans the full --epochs.
set -e
cd "$(dirname "$0")/.."

FLAGS="--data_dir data/corpus_v1 --dataset_cache data/cvs_multiview_cache.npz \
  --image_size 256 --base_channels 128 --batch_size 4 --use_amp \
  --epochs 100 --output_dir checkpoints_cvs_fw"

python -u -m fresnel_tpu.train.train_cvs $FLAGS --stop_epoch 25
python -u -m fresnel_tpu.train.train_cvs $FLAGS --stop_epoch 50 \
  --resume checkpoints_cvs_fw/cvs.msgpack
python -u -m fresnel_tpu.train.train_cvs $FLAGS --stop_epoch 75 \
  --resume checkpoints_cvs_fw/cvs.msgpack
python -u -m fresnel_tpu.train.train_cvs $FLAGS \
  --resume checkpoints_cvs_fw/cvs.msgpack

python -u experiments/eval_cvs.py --ckpt checkpoints_cvs_fw/cvs_final.msgpack \
  --cache data/cvs_multiview_cache.npz --n 24 \
  --grid logs/cvs_fw_grid.png --out_json logs/eval_cvs_fw.json
