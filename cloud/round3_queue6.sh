#!/bin/bash
# Round-3 TPU queue, take 6 — attack the TEXTURE gap (T-035).
#
# T-035 adjudicated the flagship's remaining 0.75->0.99-ceiling gap as
# high-frequency texture (stripes/dots render as mean color), not
# geometry.  Three arms, fastest-signal first:
#
#   1. ftfreq  — fine-tune the T-035 flagship checkpoint (epoch 300) for
#      120 more epochs with the HFGS frequency-domain loss ON.
#   2. freq    — same recipe from scratch, 300 epochs, freq loss on all
#      the way (does early freq pressure change the basin?).
#   3. k8      — capacity control: K=8 Gaussians/patch (2x budget,
#      10 952) with the plain flagship loss — is the texture failure a
#      degrees-of-freedom problem rather than a loss-attraction problem?
#
# --frequency_loss_weight 1e-4, NOT the reference default 0.1: the
# reference formula (unnormalized fft2 magnitude MSE,
# train_gaussian_decoder.py:430-520) scales with H*W; at 512^2 weight
# 0.1 makes the term ~250x the render loss (measured: total 127 vs 0.49
# at init).  1e-4 puts it at ~30% of the base loss at init.  Formula
# stays at parity (losses/physics.py:frequency_domain_loss).
cd "$(dirname "$0")/.."
mkdir -p logs results

FLAG="--experiment 2 --data_dir data/corpus_v1 --batch_size 8 --lr 2e-4 \
  --max_per_tile 1024 --depth_offset_init -0.128 --surface_init \
  --no_augmentation --train_encoder"
FREQ="--use_frequency_loss --frequency_loss_weight 1e-4"

evalrun () {  # $1=ckpt $2=tag
  python -u -m fresnel_tpu.cli eval "$1" --data_dir data/corpus_v1 \
    --output_json "results/eval_$2_train.json" \
    --save_grid "results/$2_train_grid.png" >> "logs/$2.log" 2>&1
  python -u -m fresnel_tpu.cli eval "$1" --data_dir data/corpus_v1_eval \
    --output_json "results/eval_$2_eval.json" \
    --save_grid "results/$2_eval_grid.png" >> "logs/$2.log" 2>&1
  cp -f "$1" "results/$2_model.msgpack" 2>/dev/null
}

# ---- Arm 1: freq fine-tune of the T-035 flagship (fastest signal) ----
FT="$FLAG $FREQ --epochs 420 --output_dir checkpoints/exp2_ftfreq"
mkdir -p checkpoints/exp2_ftfreq
cp -f checkpoints/exp2_enc/checkpoint_epoch300.msgpack* checkpoints/exp2_ftfreq/
python -u -m fresnel_tpu.train.train_gaussian_decoder $FT --stop_epoch 360 \
  --resume checkpoints/exp2_ftfreq/checkpoint_epoch300.msgpack \
  > logs/exp2_ftfreq.log 2>&1
python -u -m fresnel_tpu.train.train_gaussian_decoder $FT \
  --resume checkpoints/exp2_ftfreq/checkpoint_epoch360.msgpack \
  >> logs/exp2_ftfreq.log 2>&1
evalrun checkpoints/exp2_ftfreq/final_model.msgpack exp2_ftfreq

# ---- Arm 2: freq loss from scratch, 300 epochs ----
FS="$FLAG $FREQ --epochs 300 --output_dir checkpoints/exp2_freq"
python -u -m fresnel_tpu.train.train_gaussian_decoder $FS --stop_epoch 100 \
  > logs/exp2_freq.log 2>&1
python -u -m fresnel_tpu.train.train_gaussian_decoder $FS --stop_epoch 200 \
  --resume checkpoints/exp2_freq/checkpoint_epoch100.msgpack \
  >> logs/exp2_freq.log 2>&1
python -u -m fresnel_tpu.train.train_gaussian_decoder $FS \
  --resume checkpoints/exp2_freq/checkpoint_epoch200.msgpack \
  >> logs/exp2_freq.log 2>&1
evalrun checkpoints/exp2_freq/final_model.msgpack exp2_freq

# ---- Arm 3: K=8 capacity control, plain flagship loss ----
K8="$FLAG --gaussians_per_patch 8 --epochs 300 --output_dir checkpoints/exp2_k8"
python -u -m fresnel_tpu.train.train_gaussian_decoder $K8 --stop_epoch 100 \
  > logs/exp2_k8.log 2>&1
python -u -m fresnel_tpu.train.train_gaussian_decoder $K8 --stop_epoch 200 \
  --resume checkpoints/exp2_k8/checkpoint_epoch100.msgpack \
  >> logs/exp2_k8.log 2>&1
python -u -m fresnel_tpu.train.train_gaussian_decoder $K8 \
  --resume checkpoints/exp2_k8/checkpoint_epoch200.msgpack \
  >> logs/exp2_k8.log 2>&1
evalrun checkpoints/exp2_k8/final_model.msgpack exp2_k8

echo "queue6 done $(date -u)" | tee -a logs/queue6.log
