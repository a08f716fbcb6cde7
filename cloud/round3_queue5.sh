#!/bin/bash
# Round-3 TPU queue, take 5 — exp-4 at MATCHED Gaussian budget.
# Runs AFTER cloud/round3_queue4.sh (CVS retrain arms) drains.
#
# T-033 adjudicated the reference-spec fibonacci decoder (377 spiral
# points) as capacity-capped on this corpus (train SSIM 0.487 vs exp-2's
# 0.700 at 5 476 Gaussians).  This run tests that claim directly:
# same T-030 recipe, spiral points raised to exp-2's budget (5476).
# If capacity was the cap, this should land near exp-2; if the spiral
# parameterization itself is the problem, it won't.
cd "$(dirname "$0")/.."
mkdir -p logs results

if [ -f /tmp/queue4.pid ]; then
  while kill -0 "$(cat /tmp/queue4.pid)" 2>/dev/null; do sleep 60; done
fi

EXP4B="--experiment 4 --data_dir data/corpus_v1 --output_dir checkpoints/exp4_budget \
  --n_spiral_points 5476 --batch_size 8 --lr 2e-4 --max_per_tile 1024 \
  --epochs 150 --depth_offset_init -0.128 --surface_init --no_augmentation"
python -u -m fresnel_tpu.train.train_gaussian_decoder $EXP4B --stop_epoch 75 \
  > logs/exp4_budget.log 2>&1
python -u -m fresnel_tpu.train.train_gaussian_decoder $EXP4B \
  --resume checkpoints/exp4_budget/checkpoint_epoch75.msgpack \
  >> logs/exp4_budget.log 2>&1
CKPT=checkpoints/exp4_budget/final_model.msgpack
python -u -m fresnel_tpu.cli eval $CKPT --data_dir data/corpus_v1 \
  --output_json results/eval_exp4_budget_train.json \
  --save_grid results/exp4_budget_train_grid.png >> logs/exp4_budget.log 2>&1
python -u -m fresnel_tpu.cli eval $CKPT --data_dir data/corpus_v1_eval \
  --output_json results/eval_exp4_budget_eval.json \
  --save_grid results/exp4_budget_eval_grid.png >> logs/exp4_budget.log 2>&1
cp -f $CKPT results/exp4_budget_model.msgpack 2>/dev/null

echo "queue5 done $(date -u)" | tee -a logs/queue5.log
