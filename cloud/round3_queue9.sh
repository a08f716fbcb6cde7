#!/bin/bash
# Round-3 TPU queue, take 9 — the combined-flagship bet, queued blind
# behind queue7 so the chip never idles:
#
#   v2combo — corpus_v2, K=8 Gaussians/patch (queue6's capacity arm),
#   physically-correct depth geometry + bounded z residual + view loss
#   (queue7's v2view arm), joint encoder training (T-035).  If K=8 moves
#   texture and v2view moves novel-view quality, this is the round's
#   headline model; if either loses, the arms isolate why.
#
# Segments of <=75 epochs (axon host-RAM cache, CLAUDE.md).
cd "$(dirname "$0")/.."
mkdir -p logs results

FLAG="--data_dir data/corpus_v2 --experiment 2 --batch_size 8 --lr 2e-4 \
  --max_per_tile 1024 --surface_init --no_augmentation --train_encoder \
  --epochs 225 --gaussians_per_patch 8 --depth_z_scale 2.0 \
  --z_offset_scale 0.2 --depth_offset_init -1.0 --view_weight 0.5"

out=checkpoints/v2combo
python -u -m fresnel_tpu.train.train_gaussian_decoder $FLAG \
  --output_dir $out --stop_epoch 75 > logs/v2combo.log 2>&1
python -u -m fresnel_tpu.train.train_gaussian_decoder $FLAG \
  --output_dir $out --stop_epoch 150 \
  --resume $out/checkpoint_epoch75.msgpack >> logs/v2combo.log 2>&1
python -u -m fresnel_tpu.train.train_gaussian_decoder $FLAG \
  --output_dir $out \
  --resume $out/checkpoint_epoch150.msgpack >> logs/v2combo.log 2>&1

python -u -m fresnel_tpu.cli eval $out/final_model.msgpack \
  --data_dir data/corpus_v2 \
  --output_json results/eval_v2combo_train.json \
  --save_grid results/v2combo_train_grid.png >> logs/v2combo.log 2>&1
python -u -m fresnel_tpu.cli eval $out/final_model.msgpack \
  --data_dir data/corpus_v2_eval \
  --output_json results/eval_v2combo_eval.json \
  --save_grid results/v2combo_eval_grid.png >> logs/v2combo.log 2>&1
cp -f $out/final_model.msgpack results/v2combo_model.msgpack 2>/dev/null

echo "queue9 done $(date -u)" | tee -a logs/queue9.log
