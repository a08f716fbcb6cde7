#!/usr/bin/env bash
# Provision a TPU VM for fresnel-tpu training.
#
# TPU equivalent of the reference's MI300X cloud scripts (reference:
# cloud/setup.sh, cloud/train.sh) — gcloud instead of vast.ai/runpod.
#
# Usage: ./provision_tpu.sh [name] [type] [zone]
set -euo pipefail

NAME="${1:-fresnel-tpu}"
TYPE="${2:-v5litepod-8}"
ZONE="${3:-us-central1-a}"

gcloud compute tpus tpu-vm create "$NAME" \
  --zone="$ZONE" \
  --accelerator-type="$TYPE" \
  --version=tpu-ubuntu2204-base

gcloud compute tpus tpu-vm ssh "$NAME" --zone="$ZONE" --command='
  pip install -U "jax[tpu]" flax optax orbax-checkpoint einops pillow
'

echo "TPU VM $NAME ready. Sync the repo with:"
echo "  gcloud compute tpus tpu-vm scp --recurse . $NAME:~/fresnel-tpu --zone=$ZONE"
