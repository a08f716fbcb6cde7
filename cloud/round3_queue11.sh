#!/bin/bash
# Round-3 TPU queue, take 11 — chained behind queue10 (waits on its pid
# file): the one remaining queue6 arm, frequency loss FROM SCRATCH.
#
# T-038 adjudicated the freq FINE-TUNE as neutral (spectral energy
# recovered but not placed accurately enough to win pixel metrics) and
# the texture gap as K=4 capacity; this arm closes the matrix by testing
# the basin question — does early frequency pressure land a different
# optimization basin than the plain loss? — so the campaign table has
# all four cells: {plain, freq} x {fine-tune, scratch}.
#
# Durable segments (sidecars copied alongside — lesson of queue10).
cd "$(dirname "$0")/.."
mkdir -p logs results

if [ -f /tmp/queue10.pid ]; then
  while kill -0 "$(cat /tmp/queue10.pid)" 2>/dev/null; do sleep 60; done
fi

evalrun () {  # $1=ckpt $2=tag
  python -u -m fresnel_tpu.cli eval "$1" --data_dir data/corpus_v1 \
    --output_json "results/eval_$2_train.json" \
    --save_grid "results/$2_train_grid.png" >> "logs/$2.log" 2>&1
  python -u -m fresnel_tpu.cli eval "$1" --data_dir data/corpus_v1_eval \
    --output_json "results/eval_$2_eval.json" \
    --save_grid "results/$2_eval_grid.png" >> "logs/$2.log" 2>&1
  cp -f "$1" "results/$2_model.msgpack" 2>/dev/null
  cp -f "$1.json" "results/$2_model.msgpack.json" 2>/dev/null
}

seg () {  # seg TAG OUTDIR STOP RESUME FLAGS...
  local tag=$1 out=$2 stop=$3 resume=$4; shift 4
  local ck="$out/checkpoint_epoch$stop.msgpack"
  [ -f "$ck" ] && return 0
  if [ -f "results/${tag}_epoch$stop.msgpack" ]; then
    mkdir -p "$out"; cp "results/${tag}_epoch$stop.msgpack" "$ck"
    cp -f "results/${tag}_epoch$stop.msgpack.json" "$ck.json" 2>/dev/null
    return 0
  fi
  local rflag=""
  [ -n "$resume" ] && rflag="--resume $out/checkpoint_epoch$resume.msgpack"
  python -u -m fresnel_tpu.train.train_gaussian_decoder "$@" \
    --output_dir "$out" --stop_epoch "$stop" $rflag >> "logs/$tag.log" 2>&1
  cp -f "$ck" "results/${tag}_epoch$stop.msgpack"
  cp -f "$ck.json" "results/${tag}_epoch$stop.msgpack.json"
}

FS="--experiment 2 --data_dir data/corpus_v1 --batch_size 8 --lr 2e-4
  --max_per_tile 1024 --depth_offset_init -0.128 --surface_init
  --no_augmentation --train_encoder --epochs 300
  --use_frequency_loss --frequency_loss_weight 1e-4"
out=checkpoints/exp2_freq
seg exp2_freq $out 100 ""  $FS
seg exp2_freq $out 200 100 $FS
if [ ! -f $out/final_model.msgpack ]; then
  python -u -m fresnel_tpu.train.train_gaussian_decoder $FS \
    --output_dir $out \
    --resume $out/checkpoint_epoch200.msgpack >> logs/exp2_freq.log 2>&1
fi
evalrun $out/final_model.msgpack exp2_freq
rm -f results/exp2_freq_epoch*.msgpack results/exp2_freq_epoch*.msgpack.json
echo "queue11 done $(date -u)" | tee -a logs/queue11.log
