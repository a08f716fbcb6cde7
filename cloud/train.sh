#!/usr/bin/env bash
# Training launcher with mode presets.
#
# TPU rebuild of the reference launcher (reference: cloud/train.sh:5-10 —
# modes validate/fast/standard/full on MI300X; same modes here on TPU).
#
# Usage: ./train.sh [validate|fast|standard|full] [data_dir]
set -euo pipefail

MODE="${1:-validate}"
DATA_DIR="${2:-images}"
COMMON="--experiment 2 --data_dir $DATA_DIR --use_fresnel_zones --use_edge_aware"

case "$MODE" in
  validate)
    # ~5 min sanity run
    python -m fresnel_tpu.train.train_gaussian_decoder $COMMON \
      --fast_mode --epochs 2 --max_images 16 ;;
  fast)
    python -m fresnel_tpu.train.train_gaussian_decoder $COMMON \
      --fast_mode --epochs 30 ;;
  standard)
    python -m fresnel_tpu.train.train_gaussian_decoder $COMMON \
      --train_resolution 128 --progressive_schedule --epochs 60 ;;
  full)
    python -m fresnel_tpu.train.train_gaussian_decoder $COMMON \
      --image_size 256 --epochs 100 --use_phase_blending \
      --use_phase_retrieval_loss --use_frequency_loss ;;
  *)
    echo "unknown mode: $MODE (validate|fast|standard|full)"; exit 1 ;;
esac
