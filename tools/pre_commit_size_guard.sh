#!/bin/bash
# Pre-commit guard: refuse staged files > 20 MB (round-4 verdict item 4 —
# committed full checkpoints ballooned .git to >500 MB).  Large model
# snapshots go through fresnel_tpu/train/thin_ckpt.py (bf16 params-only,
# ~1/6 size) or stay in the gitignored checkpoints*/ dirs.
#
# Install (done by cloud/round5_queue1.sh stage 0 and documented in
# CLAUDE.md):  cp tools/pre_commit_size_guard.sh .git/hooks/pre-commit
LIMIT=$((20 * 1024 * 1024))
fail=0
while IFS= read -r f; do
  [ -f "$f" ] || continue
  sz=$(wc -c < "$f")
  if [ "$sz" -gt "$LIMIT" ]; then
    echo "REFUSED: $f is $((sz / 1048576)) MB (> 20 MB)." >&2
    echo "  Thin it first:  python -m fresnel_tpu.train.thin_ckpt $f ..." >&2
    fail=1
  fi
done < <(git diff --cached --name-only --diff-filter=AM)
exit $fail
