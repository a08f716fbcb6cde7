#!/bin/bash
# Round-3 TPU queue, take 2 — the VM reset killed the first queue
# (cloud/round3_queue.sh) and wiped every gitignored artifact (corpus,
# teachers, checkpoints, logs, the T-030 eval JSONs).  This queue reruns
# the lost jobs serially on the single chip, writing the verifiable
# artifacts into tracked results/ (see results/README.md) so a second
# reset cannot erase the evidence.  Prereq: cloud/make_corpus.sh.
#
# Jobs, shortest-risk-first:
#   1. exp-2 prox teachers (needed by the CVS multiview dataset; ~30 min)
#   2. exp-4 fibonacci campaign — VERDICT item 9 (T-027/T-030 recipe)
#   3. CVS full-width campaign — VERDICT item 8 (base-128 @256² bf16)
#   4. exp-2 final rerun — restores the lost T-030 artifact set
# Long runs are segmented: the axon execution cache leaks ~input-size
# host RAM per distinct step (T-026), so each segment is a fresh process
# resuming the previous boundary checkpoint while schedules span --epochs.
cd "$(dirname "$0")/.."
mkdir -p logs results

# ---- 1. teachers (geometry-proximal, the adopted v3 set — T-028) ----
python -u -m fresnel_tpu.train.fit_teacher --data_dir data/corpus_v1 \
  --geometry_prox 1.0 > logs/fit_teachers.log 2>&1

# ---- 2. exp-4 (fibonacci, 377 spiral points): render-only recipe ----
# Distillation adjudicated negative (T-029); this is the architecture
# behind the reference's best PSNR (exp-013: 24.21 dB).
EXP4="--experiment 4 --data_dir data/corpus_v1 --output_dir checkpoints/exp4_final \
  --batch_size 8 --lr 2e-4 --max_per_tile 1024 --epochs 150 \
  --depth_offset_init -0.128 --surface_init --no_augmentation"
python -u -m fresnel_tpu.train.train_gaussian_decoder $EXP4 --stop_epoch 75 \
  > logs/exp4_final.log 2>&1
python -u -m fresnel_tpu.train.train_gaussian_decoder $EXP4 \
  --resume checkpoints/exp4_final/checkpoint_epoch75.msgpack \
  >> logs/exp4_final.log 2>&1
CKPT=checkpoints/exp4_final/final_model.msgpack
python -u -m fresnel_tpu.cli eval $CKPT --data_dir data/corpus_v1 \
  --output_json results/eval_exp4_train.json \
  --save_grid results/exp4_train_grid.png >> logs/exp4_final.log 2>&1
python -u -m fresnel_tpu.cli eval $CKPT --data_dir data/corpus_v1_eval \
  --output_json results/eval_exp4_eval.json \
  --save_grid results/exp4_eval_grid.png >> logs/exp4_final.log 2>&1
cp -f $CKPT results/exp4_model.msgpack 2>/dev/null

# ---- 3. CVS full-width (base-128 @256², bf16 AMP, teacher multiview) ----
CVS="--data_dir data/corpus_v1 --dataset_cache data/cvs_multiview_cache.npz \
  --image_size 256 --base_channels 128 --batch_size 4 --use_amp \
  --epochs 100 --output_dir checkpoints_cvs_fw"
python -u -m fresnel_tpu.train.train_cvs $CVS --stop_epoch 25 \
  > logs/cvs_fw.log 2>&1
for STOP in "--stop_epoch 50" "--stop_epoch 75" ""; do
  python -u -m fresnel_tpu.train.train_cvs $CVS $STOP \
    --resume checkpoints_cvs_fw/cvs.msgpack >> logs/cvs_fw.log 2>&1
done
python -u experiments/eval_cvs.py --ckpt checkpoints_cvs_fw/cvs_final.msgpack \
  --cache data/cvs_multiview_cache.npz --n 24 \
  --grid results/cvs_fw_grid.png --out_json results/eval_cvs_fw.json \
  >> logs/cvs_fw.log 2>&1

# ---- 4. exp-2 final rerun (restores the lost T-030 artifacts) ----
EXP2="--experiment 2 --data_dir data/corpus_v1 --output_dir checkpoints/exp2_final \
  --batch_size 8 --lr 2e-4 --max_per_tile 1024 --epochs 300 \
  --depth_offset_init -0.128 --surface_init --no_augmentation"
python -u -m fresnel_tpu.train.train_gaussian_decoder $EXP2 --stop_epoch 110 \
  > logs/exp2_final.log 2>&1
python -u -m fresnel_tpu.train.train_gaussian_decoder $EXP2 --stop_epoch 220 \
  --resume checkpoints/exp2_final/checkpoint_epoch110.msgpack \
  >> logs/exp2_final.log 2>&1
python -u -m fresnel_tpu.train.train_gaussian_decoder $EXP2 \
  --resume checkpoints/exp2_final/checkpoint_epoch220.msgpack \
  >> logs/exp2_final.log 2>&1
CKPT=checkpoints/exp2_final/final_model.msgpack
python -u -m fresnel_tpu.cli eval $CKPT --data_dir data/corpus_v1 \
  --output_json results/eval_exp2_train.json \
  --save_grid results/exp2_train_grid.png >> logs/exp2_final.log 2>&1
python -u -m fresnel_tpu.cli eval $CKPT --data_dir data/corpus_v1_eval \
  --output_json results/eval_exp2_eval.json \
  --save_grid results/exp2_eval_grid.png >> logs/exp2_final.log 2>&1
cp -f $CKPT results/exp2_model.msgpack 2>/dev/null

echo "queue2 done $(date -u)" | tee -a logs/queue2.log
