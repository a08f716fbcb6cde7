#!/bin/bash
# Companion: continue r5combo after the second device-tunnel wedge
# killed its seg2 client at epoch 90 (same remote-side wedge signature
# as the round-4 ops note; recovery = kill the dead-stream client,
# resume from the newest mid-segment checkpoint).  Caps the run at 150
# epochs (not 225) so the arm FINISHES inside the session — the
# round-3/-4 lesson that an adjudicated 150-epoch verdict beats an
# in-flight 225-epoch one.  Evals the train set at 150; the midwatch
# evals the eval set at 100/150 as checkpoints land.
cd "$(dirname "$0")/.."
LOCK=.tpu.lock
run () { flock "$LOCK" "$@"; }

COMBO="--experiment 2 --data_dir data/corpus_v2 --batch_size 4 --lr 2e-4
  --max_per_tile 1024 --surface_init --no_augmentation --train_encoder
  --epochs 225 --depth_z_scale 2.0 --z_offset_scale 0.2
  --depth_offset_init -1.0 --view_weight 0.5 --gaussians_per_patch 8"
out=checkpoints/r5combo

seg () {  # seg STOP
  local stop=$1
  local ck="$out/checkpoint_epoch$stop.msgpack"
  [ -f "$ck" ] && return 0
  local best="" beste=-1 e f
  for f in "$out"/checkpoint_epoch*.msgpack; do
    [ -f "$f" ] || continue
    e=${f##*checkpoint_epoch}; e=${e%.msgpack}
    if [ "$e" -lt "$stop" ] 2>/dev/null && [ "$e" -gt "$beste" ]; then
      best=$f; beste=$e
    fi
  done
  local rflag=""
  [ -n "$best" ] && rflag="--resume $best"
  run python -u -m fresnel_tpu.train.train_gaussian_decoder $COMBO \
    --output_dir "$out" --stop_epoch "$stop" $rflag >> logs/r5combo.log 2>&1
  [ -f "$ck" ] || return 1
  python -m fresnel_tpu.train.thin_ckpt "$ck" "/tmp/r5combo_thin.msgpack" \
    >> logs/r5combo.log 2>&1 && \
  python tools/durable_store.py put "/tmp/r5combo_thin.msgpack" \
    --name "r5combo_epoch$stop.msgpack" --prune-prefix "r5combo_epoch" \
    >> logs/r5combo.log 2>&1
}

seg 100 && seg 150
if [ -f "$out/checkpoint_epoch150.msgpack" ]; then
  run python -u -m fresnel_tpu.cli eval "$out/checkpoint_epoch150.msgpack" \
    --data_dir data/corpus_v2 \
    --output_json results/eval_r5combo_mid150_train.json \
    --save_grid results/r5combo_mid150_train_grid.png \
    >> logs/r5combo_mid.log 2>&1
fi
echo "stageD continuation done $(date -u)" | tee -a logs/round5_stageD.log
