#!/bin/bash
# Round-3 TPU job queue: runs after the CVS full-width campaign releases
# the chip.  Jobs are skipped when past their start cutoff so the chip is
# free for the driver's end-of-round bench.
cd "$(dirname "$0")/.."

CVS_PID=$(cat /tmp/cvs_fw.pid 2>/dev/null)
while [ -n "$CVS_PID" ] && kill -0 "$CVS_PID" 2>/dev/null; do sleep 20; done

now() { date +%s; }
EXP4_CUTOFF=$(date -d "2026-08-18 11:20 UTC" +%s)
PROF_CUTOFF=$(date -d "2026-08-18 11:50 UTC" +%s)

if [ "$(now)" -lt "$EXP4_CUTOFF" ]; then
  # Exp-4 (fibonacci, 377 spiral points) with the T-027/T-030 recipe —
  # render loss only (distillation adjudicated negative, T-029), the
  # architecture behind the reference's best PSNR (exp-013: 24.21 dB).
  FLAGS="--experiment 4 --data_dir data/corpus_v1 --output_dir checkpoints/exp4_final \
    --batch_size 8 --lr 2e-4 --max_per_tile 1024 --epochs 150 \
    --depth_offset_init -0.128 --surface_init --no_augmentation"
  python -u -m fresnel_tpu.train.train_gaussian_decoder $FLAGS --stop_epoch 75 \
    >> logs/exp4_final.log 2>&1
  python -u -m fresnel_tpu.train.train_gaussian_decoder $FLAGS \
    --resume checkpoints/exp4_final/checkpoint_epoch75.msgpack \
    >> logs/exp4_final.log 2>&1
  CKPT=checkpoints/exp4_final/final_model.msgpack
  python -u -m fresnel_tpu.cli eval $CKPT --data_dir data/corpus_v1 \
    --output_json logs/eval_exp4_train.json \
    --save_grid logs/eval_exp4_train_grid.png >> logs/exp4_final.log 2>&1
  python -u -m fresnel_tpu.cli eval $CKPT --data_dir data/corpus_v1_eval \
    --output_json logs/eval_exp4_eval.json \
    --save_grid logs/eval_exp4_eval_grid.png >> logs/exp4_final.log 2>&1
else
  echo "skip exp4 (past cutoff)" >> logs/exp4_final.log
fi

if [ "$(now)" -lt "$PROF_CUTOFF" ]; then
  python -u experiments/profile_batch_throughput.py \
    > logs/profile_batch_throughput.log 2>&1
fi
echo "queue done $(date -u)" >> logs/exp4_final.log
