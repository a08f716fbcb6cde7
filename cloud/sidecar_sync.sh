#!/bin/bash
# Sidecar sync — one-shot, bidirectional, generic (advisor r3).
#
# A checkpoint copy without its .msgpack.json config sidecar cannot be
# loaded (load_checkpoint now refuses, harness.py) — and round 3 showed
# both directions matter: queue10 copied weights results->checkpoints on
# reset-recovery WITHOUT sidecars (silently-wrong epoch-0 resume), and
# its cleanup removed weights but left orphaned sidecars behind.  This
# tool repairs both, for every tag, in one pass:
#   1. results/X.msgpack missing X.msgpack.json  <- copy from the matching
#      checkpoints/<tag>/ file when one exists;
#   2. checkpoints/<tag>/Y.msgpack missing Y.msgpack.json <- copy from the
#      matching results/ sidecar;
#   3. delete orphaned results/*_epoch*.msgpack.json whose weights are gone.
# (round4_queue1.sh's seg() already copies pairs atomically in both
# directions; this is the repair path for older artifacts and crashes.)
cd "$(dirname "$0")/.."

# 1. results/ weights missing sidecars.
for w in results/*_epoch*.msgpack results/*_model.msgpack; do
  [ -f "$w" ] || continue
  [ -f "$w.json" ] && continue
  base=$(basename "$w" .msgpack)
  tag=${base%_epoch*}; tag=${tag%_model}
  if [[ "$base" == *_epoch* ]]; then
    src="checkpoints/$tag/checkpoint_epoch${base##*_epoch}.msgpack.json"
  else
    src="checkpoints/$tag/final_model.msgpack.json"
  fi
  [ -f "$src" ] && cp "$src" "$w.json" && echo "restored $w.json"
done

# 2. checkpoints/ weights missing sidecars (reset-recovery direction).
for w in checkpoints/*/checkpoint_epoch*.msgpack checkpoints/*/final_model.msgpack; do
  [ -f "$w" ] || continue
  [ -f "$w.json" ] && continue
  tag=$(basename "$(dirname "$w")")
  base=$(basename "$w" .msgpack)
  if [[ "$base" == checkpoint_epoch* ]]; then
    src="results/${tag}_epoch${base#checkpoint_epoch}.msgpack.json"
  else
    src="results/${tag}_model.msgpack.json"
  fi
  [ -f "$src" ] && cp "$src" "$w.json" && echo "restored $w.json"
done

# 3. Orphaned transient sidecars (weights cleaned up, json left behind).
for j in results/*_epoch*.msgpack.json; do
  [ -f "$j" ] || continue
  [ -f "${j%.json}" ] || { rm -f "$j"; echo "removed orphan $j"; }
done

echo "sidecar sync done $(date -u)"
