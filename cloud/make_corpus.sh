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
