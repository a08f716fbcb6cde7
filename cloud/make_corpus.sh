#!/bin/bash
# Regenerate the quality-campaign corpora from scratch (deterministic).
#
# data/corpus*/ is gitignored (PNGs + float32 caches), so a VM reset wipes
# it; this script is the tracked record of exactly how the corpora are
# produced.  The generator is pure numpy and deterministic per
# (seed, index) (fresnel_tpu/data/synthetic_corpus.py), so the TRAIN set
# is bit-identical across regenerations.  Feature caches are rebuilt
# lazily by ImageDataset on first touch.
#
#   corpus_v1       160 scenes, seed 0  (training set)
#   corpus_v1_eval   24 scenes, seed 1  (held-out eval set)
set -e
cd "$(dirname "$0")/.."

python -m fresnel_tpu.data.synthetic_corpus data/corpus_v1 \
  --n_images 160 --seed 0
python -m fresnel_tpu.data.synthetic_corpus data/corpus_v1_eval \
  --n_images 24 --seed 1

# corpus_v2: raytraced true-3D multi-view corpus (novel-view GT).
# 4-way sharded — scene i is deterministic per (seed, i) whichever
# process renders it.
for s in 0 1 2 3; do
  python -m fresnel_tpu.data.raytrace_corpus data/corpus_v2 \
    --n_images 160 --seed 20 --start $s --stride 4 &
done
wait
python -m fresnel_tpu.data.raytrace_corpus data/corpus_v2_eval \
  --n_images 24 --seed 21
