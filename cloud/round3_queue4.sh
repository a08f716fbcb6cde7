#!/bin/bash
# Round-3 TPU queue, take 4 — CVS retrain after the T-034 findings.
# Runs AFTER cloud/round3_queue3.sh (the encoder campaign) drains.
#
# Two arms, both 100 epochs at the full-width config (base-128 @256²,
# bf16 AMP, teacher-multiview pairs), segmented per T-026:
#   A. fix-only — the EMA consistency target is now computed on x_t_prev
#      directly (reference parity: consistency_view_synthesis.py:929-933);
#      the earlier path rescaled it by sqrt_alphas_cumprod[t_prev],
#      pulling high-t predictions toward the unconditional mean (T-034).
#   B. concat — same fix + --concat_input_view: the input view as 3 extra
#      U-Net input channels, the rebuild's stronger-conditioning arm
#      (the reference conditions via cross-attention tokens only).
# Evals (1-step SSIM/PSNR + grids) land in tracked results/.
cd "$(dirname "$0")/.."
mkdir -p logs results

if [ -f /tmp/queue3.pid ]; then
  while kill -0 "$(cat /tmp/queue3.pid)" 2>/dev/null; do sleep 60; done
fi

run_arm () {  # $1=tag  $2=extra flags
  local TAG=$1; shift
  local CVS="--data_dir data/corpus_v1 --dataset_cache data/cvs_multiview_cache.npz \
    --image_size 256 --base_channels 128 --batch_size 4 --use_amp \
    --epochs 100 --output_dir checkpoints_cvs_${TAG} $*"
  python -u -m fresnel_tpu.train.train_cvs $CVS --stop_epoch 25 \
    > logs/cvs_${TAG}.log 2>&1
  for STOP in "--stop_epoch 50" "--stop_epoch 75" ""; do
    python -u -m fresnel_tpu.train.train_cvs $CVS $STOP \
      --resume checkpoints_cvs_${TAG}/cvs.msgpack >> logs/cvs_${TAG}.log 2>&1
  done
  python -u experiments/eval_cvs.py \
    --ckpt checkpoints_cvs_${TAG}/cvs_final.msgpack \
    --cache data/cvs_multiview_cache.npz --n 24 \
    --grid results/cvs_${TAG}_grid.png \
    --out_json results/eval_cvs_${TAG}.json >> logs/cvs_${TAG}.log 2>&1
  python -u experiments/cvs_denoise_curve.py \
    --ckpt checkpoints_cvs_${TAG}/cvs_final.msgpack --n 16 \
    --out_json results/cvs_${TAG}_denoise_curve.json \
    >> logs/cvs_${TAG}.log 2>&1
}

run_arm fix
run_arm concat --concat_input_view

echo "queue4 done $(date -u)" | tee -a logs/queue4.log
