#!/usr/bin/env bash
# Overnight baseline training run (reference: scripts/training/train_overnight.sh:
# 8-12 h, 500 LPFF images, tee'd logs, fail-fast).
set -euo pipefail

DATA_DIR="${1:-images}"
OUT="checkpoints/overnight_$(date +%Y%m%d_%H%M%S)"
mkdir -p "$OUT"

python -m fresnel_tpu.data.preprocess "$DATA_DIR" 2>&1 | tee "$OUT/preprocess.log"

python -m fresnel_tpu.train.train_gaussian_decoder \
  --experiment 2 --data_dir "$DATA_DIR" --output_dir "$OUT" \
  --epochs 100 --batch_size 8 --image_size 256 \
  --use_fresnel_zones --use_edge_aware --progressive_schedule \
  2>&1 | tee "$OUT/train.log"

python -m fresnel_tpu.cli eval "$OUT/best_model.msgpack" \
  --data_dir "$DATA_DIR" --max_images 8 \
  --output_json "$OUT/eval_results.json" 2>&1 | tee "$OUT/eval.log"
