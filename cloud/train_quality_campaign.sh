#!/bin/bash
# Round-3 quality campaign launcher — the T-027/T-028/T-029 recipe.
#
# Long runs MUST be segmented on the axon tunnel (execution cache leaks
# ~input-size host RAM per step, T-026): each segment is a fresh process
# resuming from the previous segment's boundary checkpoint, while the
# cosine/HFTS schedules span the full --epochs.
set -e
cd "$(dirname "$0")/.."

FLAGS="--experiment 2 --data_dir data/corpus_v1 --output_dir checkpoints/exp2_final \
  --batch_size 8 --lr 2e-4 --max_per_tile 1024 --epochs 300 \
  --depth_offset_init -0.128 --surface_init --no_augmentation"

python -u -m fresnel_tpu.train.train_gaussian_decoder $FLAGS --stop_epoch 110
python -u -m fresnel_tpu.train.train_gaussian_decoder $FLAGS --stop_epoch 220 \
  --resume checkpoints/exp2_final/checkpoint_epoch110.msgpack
python -u -m fresnel_tpu.train.train_gaussian_decoder $FLAGS \
  --resume checkpoints/exp2_final/checkpoint_epoch220.msgpack

CKPT=checkpoints/exp2_final/final_model.msgpack
python -u -m fresnel_tpu.cli eval $CKPT --data_dir data/corpus_v1 \
  --output_json logs/eval_final_train.json --save_grid logs/eval_final_train_grid.png
python -u -m fresnel_tpu.cli eval $CKPT --data_dir data/corpus_v1_eval \
  --output_json logs/eval_final_eval.json --save_grid logs/eval_final_eval_grid.png
