#!/bin/bash
# Round-3 TPU queue, take 3 — the end-to-end encoder campaign.
# Runs AFTER cloud/round3_queue2.sh drains (waits on /tmp/queue2.pid).
#
# Rationale: T-030's achieved quality (SSIM 0.700 train / 0.650 eval)
# trains the decoder against procedural patch-statistic features — the
# zero-egress stand-in for the reference's frozen DINOv2 (T-015).  The
# trainable ImageEncoder (models/image_encoder.py, --train_encoder) is
# the lever that removes that cap: identical recipe to the T-030 winner
# (render loss only, plain head, M=1024, depth_offset_init -0.128,
# surface_init, lr 2e-4 cosine, 300 epochs) plus joint encoder training.
# Segments of ~100 epochs bound the axon execution-cache host-RAM leak
# (T-026: ~27 MB/step at B=8).
cd "$(dirname "$0")/.."
mkdir -p logs results

# Wait for queue2 (exp-4 + CVS + exp-2 rerun) to drain the chip.
if [ -f /tmp/queue2.pid ]; then
  while kill -0 "$(cat /tmp/queue2.pid)" 2>/dev/null; do sleep 60; done
fi

ENC="--experiment 2 --data_dir data/corpus_v1 --output_dir checkpoints/exp2_enc \
  --batch_size 8 --lr 2e-4 --max_per_tile 1024 --epochs 300 \
  --depth_offset_init -0.128 --surface_init --no_augmentation \
  --train_encoder"
python -u -m fresnel_tpu.train.train_gaussian_decoder $ENC --stop_epoch 100 \
  > logs/exp2_enc.log 2>&1
python -u -m fresnel_tpu.train.train_gaussian_decoder $ENC --stop_epoch 200 \
  --resume checkpoints/exp2_enc/checkpoint_epoch100.msgpack \
  >> logs/exp2_enc.log 2>&1
python -u -m fresnel_tpu.train.train_gaussian_decoder $ENC \
  --resume checkpoints/exp2_enc/checkpoint_epoch200.msgpack \
  >> logs/exp2_enc.log 2>&1
CKPT=checkpoints/exp2_enc/final_model.msgpack
python -u -m fresnel_tpu.cli eval $CKPT --data_dir data/corpus_v1 \
  --output_json results/eval_exp2_enc_train.json \
  --save_grid results/exp2_enc_train_grid.png >> logs/exp2_enc.log 2>&1
python -u -m fresnel_tpu.cli eval $CKPT --data_dir data/corpus_v1_eval \
  --output_json results/eval_exp2_enc_eval.json \
  --save_grid results/exp2_enc_eval_grid.png >> logs/exp2_enc.log 2>&1
cp -f $CKPT results/exp2_enc_model.msgpack 2>/dev/null

echo "queue3 done $(date -u)" | tee -a logs/queue3.log
