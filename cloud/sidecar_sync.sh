#!/bin/bash
# Companion to round3_queue10.sh (which must stay byte-identical while a
# bash process executes it): copies each durable checkpoint's .json config
# sidecar into results/ as queue10 produces the msgpack copies.  Without
# the sidecar, a results/ checkpoint cannot be loaded by eval/resume after
# a VM reset (fresnel_tpu/train/reconstruct_sidecar.py is the recovery
# path; this watcher makes recovery unnecessary for queue10's outputs).
cd "$(dirname "$0")/.."
while true; do
  for tag in v2combo exp2_k8; do
    for e in 75 150 225; do
      src="checkpoints/$tag/checkpoint_epoch$e.msgpack.json"
      dst="results/${tag}_epoch$e.msgpack"
      [ -f "$dst" ] && [ -f "$src" ] && [ ! -f "$dst.json" ] && cp "$src" "$dst.json"
    done
    src="checkpoints/$tag/final_model.msgpack.json"
    dst="results/${tag}_model.msgpack"
    [ -f "$dst" ] && [ -f "$src" ] && [ ! -f "$dst.json" ] && cp "$src" "$dst.json"
  done
  # queue10 finished (pid file written by the launcher) -> final sweep done
  if [ -f /tmp/queue10.pid ] && ! kill -0 "$(cat /tmp/queue10.pid)" 2>/dev/null; then
    exit 0
  fi
  sleep 60
done
