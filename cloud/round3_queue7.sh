#!/bin/bash
# Round-3 TPU queue, take 7 — view-aware training on corpus_v2.
#
# corpus_v2 (data/raytrace_corpus.py) has exact raytraced GT at 8 orbit
# azimuths, so for the first time novel-view quality is directly
# supervisable and measurable (the reference's exp-011 could only score
# side views by coverage %).  Three arms isolate the two changes:
#
#   1. v2base — flagship T-035 recipe on corpus_v2, reference-parity
#      geometry (depth_z_scale -2.0), frontal-only supervision.
#      Establishes the corpus_v2 frontal baseline + how badly a
#      frontal-only model scores against side-view GT.
#   2. v2geo  — geometry fix only: depth_z_scale +2.0 (physically
#      correct parallax) + z_offset_scale 0.2, still frontal-only.
#      Does correct parallax alone transfer to novel views?
#   3. v2view — geometry fix + --view_weight 0.5: one random non-frontal
#      GT view rendered per sample per step (harness.py view loss).
#
# depth_offset_init -1.0: with depth_z_scale +2.0 and disparity in
# [0,1], content spans [do, do+2]; -1.0 centres it on the origin the
# orbit cameras circle (T-027: init scalar params at their target, Adam
# cannot walk them there).
#
# Segments of <=75 epochs: the axon execution cache retains ~input-size
# host RAM per step and the views tensor adds ~6 MB/step at B=8
# (CLAUDE.md OOM note).
cd "$(dirname "$0")/.."
mkdir -p logs results

FLAG="--data_dir data/corpus_v2 --experiment 2 --batch_size 8 --lr 2e-4 \
  --max_per_tile 1024 --surface_init --no_augmentation --train_encoder \
  --epochs 225"

evalrun () {  # $1=ckpt $2=tag
  python -u -m fresnel_tpu.cli eval "$1" --data_dir data/corpus_v2 \
    --output_json "results/eval_$2_train.json" \
    --save_grid "results/$2_train_grid.png" >> "logs/$2.log" 2>&1
  python -u -m fresnel_tpu.cli eval "$1" --data_dir data/corpus_v2_eval \
    --output_json "results/eval_$2_eval.json" \
    --save_grid "results/$2_eval_grid.png" >> "logs/$2.log" 2>&1
  cp -f "$1" "results/$2_model.msgpack" 2>/dev/null
}

run_segmented () {  # $1=tag $2=extra flags
  local tag=$1; shift
  local out="checkpoints/$tag"
  python -u -m fresnel_tpu.train.train_gaussian_decoder $FLAG "$@" \
    --output_dir "$out" --stop_epoch 75 > "logs/$tag.log" 2>&1
  python -u -m fresnel_tpu.train.train_gaussian_decoder $FLAG "$@" \
    --output_dir "$out" --stop_epoch 150 \
    --resume "$out/checkpoint_epoch75.msgpack" >> "logs/$tag.log" 2>&1
  python -u -m fresnel_tpu.train.train_gaussian_decoder $FLAG "$@" \
    --output_dir "$out" \
    --resume "$out/checkpoint_epoch150.msgpack" >> "logs/$tag.log" 2>&1
  evalrun "$out/final_model.msgpack" "$tag"
}

run_segmented v2base --depth_offset_init -0.128
run_segmented v2geo  --depth_z_scale 2.0 --z_offset_scale 0.2 \
  --depth_offset_init -1.0
run_segmented v2view --depth_z_scale 2.0 --z_offset_scale 0.2 \
  --depth_offset_init -1.0 --view_weight 0.5

echo "queue7 done $(date -u)" | tee -a logs/queue7.log
