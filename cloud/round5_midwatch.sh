#!/bin/bash
# Companion watcher for round5_queue1.sh stage D (r5combo): as soon as
# the epoch-100 segment checkpoint exists, run the held-out eval so the
# round snapshot carries an adjudicable number even if the 225-epoch run
# is still in flight when the round ends (the round-3/-4 failure mode:
# "the central hypothesis is again in flight at snapshot").  Companion
# script, NOT an edit of the running queue (CLAUDE.md rule).
cd "$(dirname "$0")/.."
LOCK=.tpu.lock
run () { flock "$LOCK" "$@"; }

CK=checkpoints/r5combo/checkpoint_epoch100.msgpack
for _ in $(seq 1 400); do            # poll up to ~6.7 h
  if [ -f results/eval_r5combo_mid_eval.json ]; then exit 0; fi
  if [ -f "$CK" ]; then
    sleep 5   # let the writer finish the sidecar
    run python -u -m fresnel_tpu.cli eval "$CK" \
      --data_dir data/corpus_v2 \
      --output_json results/eval_r5combo_mid_train.json \
      --save_grid results/r5combo_mid_train_grid.png \
      >> logs/r5combo_mid.log 2>&1
    run python -u -m fresnel_tpu.cli eval "$CK" \
      --data_dir data/corpus_v2_eval \
      --output_json results/eval_r5combo_mid_eval.json \
      --save_grid results/r5combo_mid_eval_grid.png \
      >> logs/r5combo_mid.log 2>&1
    exit 0
  fi
  sleep 60
done
