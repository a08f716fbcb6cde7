#!/bin/bash
# Companion watcher for round5_queue1.sh stage D (r5combo): eval each
# segment checkpoint (epoch 50, then 100) as soon as it exists, so the
# round snapshot carries an adjudicable novel-view number even if the
# 225-epoch run is still in flight when the round ends (the round-3/-4
# failure mode: "the central hypothesis is again in flight at
# snapshot").  Companion script, NOT an edit of the running queue
# (CLAUDE.md rule).
cd "$(dirname "$0")/.."
LOCK=.tpu.lock
run () { flock "$LOCK" "$@"; }

do_eval () {  # $1=epoch
  local ck=checkpoints/r5combo/checkpoint_epoch$1.msgpack
  sleep 5   # let the writer finish the sidecar
  run python -u -m fresnel_tpu.cli eval "$ck" \
    --data_dir data/corpus_v2_eval \
    --output_json "results/eval_r5combo_mid$1_eval.json" \
    --save_grid "results/r5combo_mid$1_eval_grid.png" \
    >> logs/r5combo_mid.log 2>&1
}

for _ in $(seq 1 400); do            # poll up to ~6.7 h
  for e in 50 100; do
    if [ -f "checkpoints/r5combo/checkpoint_epoch$e.msgpack" ] && \
       [ ! -f "results/eval_r5combo_mid${e}_eval.json" ]; then
      do_eval "$e"
    fi
  done
  # Done once the 100-epoch eval exists (or the final eval landed).
  [ -f results/eval_r5combo_mid100_eval.json ] && exit 0
  [ -f results/eval_r5combo_eval.json ] && exit 0
  sleep 60
done
