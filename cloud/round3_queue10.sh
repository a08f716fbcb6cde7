#!/bin/bash
# Round-3 TPU queue, take 10 — relaunch after the VM reset that killed
# queue6 arms 2-3, queue7, and queue9 (gitignored data/, checkpoints/,
# logs/ all wiped; results/ survived because it is tracked).
#
# Ordering is chosen so the chip never idles while cloud/make_corpus.sh
# (running separately) raytraces corpus_v2 (~25 min):
#   A. exp2_k8 segment 1 (corpus_v1 is synthetic-numpy and already done)
#      — queue6 arm 3, the isolated capacity control: does K=8 alone
#      move the >16-cycle texture bands (T-038 addendum)?
#   B. v2combo — the queue9 combined-flagship bet (corpus_v2, K=8,
#      physically-correct depth geometry, view loss, joint encoder).
#   C. exp2_k8 remaining segments + eval.
#
# Durability (CLAUDE.md: the VM can reset at any time): every segment
# checkpoint is copied into tracked results/ immediately, so a reset
# costs at most one 75-epoch segment; re-running this script resumes.
cd "$(dirname "$0")/.."
mkdir -p logs results

evalrun () {  # $1=ckpt $2=tag $3=train_dir $4=eval_dir
  python -u -m fresnel_tpu.cli eval "$1" --data_dir "$3" \
    --output_json "results/eval_$2_train.json" \
    --save_grid "results/$2_train_grid.png" >> "logs/$2.log" 2>&1
  python -u -m fresnel_tpu.cli eval "$1" --data_dir "$4" \
    --output_json "results/eval_$2_eval.json" \
    --save_grid "results/$2_eval_grid.png" >> "logs/$2.log" 2>&1
  cp -f "$1" "results/$2_model.msgpack" 2>/dev/null
}

# seg TAG OUTDIR STOP RESUME FLAGS... — run one durable training segment
# (skipped if its checkpoint already exists in checkpoints/ or results/).
seg () {
  local tag=$1 out=$2 stop=$3 resume=$4; shift 4
  local ck="$out/checkpoint_epoch$stop.msgpack"
  [ -f "$ck" ] && return 0
  if [ -f "results/${tag}_epoch$stop.msgpack" ]; then
    mkdir -p "$out"; cp "results/${tag}_epoch$stop.msgpack" "$ck"; return 0
  fi
  local rflag=""
  [ -n "$resume" ] && rflag="--resume $out/checkpoint_epoch$resume.msgpack"
  python -u -m fresnel_tpu.train.train_gaussian_decoder "$@" \
    --output_dir "$out" --stop_epoch "$stop" $rflag >> "logs/$tag.log" 2>&1
  cp -f "$ck" "results/${tag}_epoch$stop.msgpack"
}

K8FLAG="--experiment 2 --data_dir data/corpus_v1 --batch_size 8 --lr 2e-4
  --max_per_tile 1024 --depth_offset_init -0.128 --surface_init
  --no_augmentation --train_encoder --epochs 300 --gaussians_per_patch 8"

# ---- A. exp2_k8 segment 1 while corpus_v2 raytraces ----
seg exp2_k8 checkpoints/exp2_k8 75 "" $K8FLAG

# ---- B. v2combo (queue9 recipe, durable segments) ----
for i in $(seq 360); do
  n_v2=$(ls data/corpus_v2/scene_*.png 2>/dev/null | wc -l)
  n_v2e=$(ls data/corpus_v2_eval/scene_*.png 2>/dev/null | wc -l)
  [ "$n_v2" -ge 160 ] && [ "$n_v2e" -ge 24 ] && break
  sleep 10
done
echo "corpora ready: v2=$n_v2 v2_eval=$n_v2e $(date -u)" | tee -a logs/queue10.log

V2FLAG="--data_dir data/corpus_v2 --experiment 2 --batch_size 8 --lr 2e-4
  --max_per_tile 1024 --surface_init --no_augmentation --train_encoder
  --epochs 225 --gaussians_per_patch 8 --depth_z_scale 2.0
  --z_offset_scale 0.2 --depth_offset_init -1.0 --view_weight 0.5"
out=checkpoints/v2combo
seg v2combo $out 75 "" $V2FLAG
seg v2combo $out 150 75 $V2FLAG
if [ ! -f $out/final_model.msgpack ]; then
  python -u -m fresnel_tpu.train.train_gaussian_decoder $V2FLAG \
    --output_dir $out \
    --resume $out/checkpoint_epoch150.msgpack >> logs/v2combo.log 2>&1
fi
evalrun $out/final_model.msgpack v2combo data/corpus_v2 data/corpus_v2_eval
rm -f results/v2combo_epoch*.msgpack
echo "v2combo done $(date -u)" | tee -a logs/queue10.log

# ---- C. exp2_k8 remaining segments + eval ----
out=checkpoints/exp2_k8
seg exp2_k8 $out 150 75 $K8FLAG
seg exp2_k8 $out 225 150 $K8FLAG
if [ ! -f $out/final_model.msgpack ]; then
  python -u -m fresnel_tpu.train.train_gaussian_decoder $K8FLAG \
    --output_dir $out \
    --resume $out/checkpoint_epoch225.msgpack >> logs/exp2_k8.log 2>&1
fi
evalrun $out/final_model.msgpack exp2_k8 data/corpus_v1 data/corpus_v1_eval
rm -f results/exp2_k8_epoch*.msgpack
echo "queue10 done $(date -u)" | tee -a logs/queue10.log
