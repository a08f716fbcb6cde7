#!/bin/bash
# Post-reset relaunch of the stage-D midwatch, widened: eval r5combo
# segment checkpoints at epochs 50, 100 AND 150 as they land, so the
# snapshot carries an adjudicable novel-view number even if the
# 225-epoch run is in flight when the round ends.  Companion script,
# NOT an edit of a running queue (CLAUDE.md rule).
cd "$(dirname "$0")/.."
LOCK=.tpu.lock
run () { flock "$LOCK" "$@"; }

do_eval () {  # $1=epoch
  local ck=checkpoints/r5combo/checkpoint_epoch$1.msgpack
  sleep 10   # let the writer finish the sidecar + durable put
  run python -u -m fresnel_tpu.cli eval "$ck" \
    --data_dir data/corpus_v2_eval \
    --output_json "results/eval_r5combo_mid$1_eval.json" \
    --save_grid "results/r5combo_mid$1_eval_grid.png" \
    >> logs/r5combo_mid.log 2>&1
}

for _ in $(seq 1 400); do            # poll up to ~6.7 h
  for e in 50 100 150; do
    if [ -f "checkpoints/r5combo/checkpoint_epoch$e.msgpack" ] && \
       [ ! -f "results/eval_r5combo_mid${e}_eval.json" ]; then
      do_eval "$e"
    fi
  done
  [ -f results/eval_r5combo_mid150_eval.json ] && exit 0
  [ -f results/eval_r5combo_eval.json ] && exit 0
  sleep 60
done
