#!/bin/bash
# Round-5 TPU queue, take 3 — post-reset relaunch of the open
# adjudications, REORDERED by verdict value (the round-3/-4 lesson:
# run the decisive arm first so the snapshot carries a verdict):
#
#   D. r5combo: view-aware flagship on corpus_v2 with the stage-A winner
#      (round-4 verdict item 7).  T-048 adjudicated e74-K1 BELOW K=8
#      (0.686 < 0.719 eval SSIM), so the winner is the K=8 recipe.
#      225 epochs; the companion watcher (round5_midwatch.sh) evals the
#      50/100/150 segment checkpoints as they land.
#   B. CVS on exact-GT corpus_v2 pairs + end-to-end number (verdict
#      item 2, round-3 ask #6 — open two rounds; 2 segments of 50 to
#      halve the ~20-min-per-segment tunnel compiles vs queue1's 4).
#   C. exp2_g74zi zero-init validation (verdict item 3, T-045 closure).
#   E. exp2_e74k2: native 74x74 lattice at K=2 = K=8's exact budget
#      (T-048 follow-up; decision point is the 150-epoch mid-eval).
#      Last because it is self-imposed science, not a verdict item; the
#      end-of-queue fallback evals whatever epoch is on disk.
#
# Durability: identical to queue1 (thin segment checkpoints on the
# orphan `durable` branch; all TPU commands serialize on .tpu.lock;
# tools with an INTERNAL tpu_lock are not double-wrapped).
cd "$(dirname "$0")/.."
mkdir -p logs results checkpoints
LOCK=.tpu.lock
run () { flock "$LOCK" "$@"; }

# ---- stage 0: corpora — gate on the corpus files themselves ------------
if [ ! -f data/corpus_v1/scene_0159.png ] || \
   [ ! -f data/corpus_v1_eval/scene_0023.png ] || \
   [ ! -f data/corpus_v2/scene_0159.png ] || \
   [ ! -f data/corpus_v2_eval/scene_0023.png ]; then
  bash cloud/make_corpus.sh > logs/make_corpus.log 2>&1
fi
cp -f tools/pre_commit_size_guard.sh .git/hooks/pre-commit 2>/dev/null
chmod +x .git/hooks/pre-commit 2>/dev/null

evalrun () {  # $1=ckpt $2=tag $3=train_dir $4=eval_dir
  run python -u -m fresnel_tpu.cli eval "$1" --data_dir "$3" \
    --output_json "results/eval_$2_train.json" \
    --save_grid "results/$2_train_grid.png" >> "logs/$2.log" 2>&1
  run python -u -m fresnel_tpu.cli eval "$1" --data_dir "$4" \
    --output_json "results/eval_$2_eval.json" \
    --save_grid "results/$2_eval_grid.png" >> "logs/$2.log" 2>&1
}

seg () {  # seg TAG OUTDIR STOP RESUME FLAGS...
  local tag=$1 out=$2 stop=$3 resume=$4; shift 4
  local ck="$out/checkpoint_epoch$stop.msgpack"
  [ -f "$ck" ] && return 0
  mkdir -p "$out"
  local n e f
  for n in $(python tools/durable_store.py list "${tag}_epoch" \
               | grep -v '\.json$'); do
    e=${n##*_epoch}; e=${e%.msgpack}
    f="$out/checkpoint_epoch$e.msgpack"
    [ -f "$f" ] || python tools/durable_store.py get "$n" "$f"
  done
  for f in results/${tag}_epoch*.msgpack; do
    [ -f "$f" ] || continue
    e=${f##*_epoch}; e=${e%.msgpack}
    if [ ! -f "$out/checkpoint_epoch$e.msgpack" ]; then
      cp "$f" "$out/checkpoint_epoch$e.msgpack"
      cp -f "$f.json" "$out/checkpoint_epoch$e.msgpack.json" 2>/dev/null
    fi
  done
  [ -f "$ck" ] && return 0
  local best="" beste=-1
  for f in "$out"/checkpoint_epoch*.msgpack; do
    [ -f "$f" ] || continue
    e=${f##*checkpoint_epoch}; e=${e%.msgpack}
    if [ "$e" -lt "$stop" ] 2>/dev/null && [ "$e" -gt "$beste" ]; then
      best=$f; beste=$e
    fi
  done
  local rflag=""
  if [ -n "$best" ]; then
    rflag="--resume $best"
  elif [ -n "$resume" ]; then
    rflag="--resume $out/checkpoint_epoch$resume.msgpack"
  fi
  run python -u -m fresnel_tpu.train.train_gaussian_decoder "$@" \
    --output_dir "$out" --stop_epoch "$stop" $rflag >> "logs/$tag.log" 2>&1
  [ -f "$ck" ] || return 1
  python -m fresnel_tpu.train.thin_ckpt "$ck" "/tmp/${tag}_thin.msgpack" \
    >> "logs/$tag.log" 2>&1 && \
  python tools/durable_store.py put "/tmp/${tag}_thin.msgpack" \
    --name "${tag}_epoch$stop.msgpack" --prune-prefix "${tag}_epoch" \
    >> "logs/$tag.log" 2>&1
}

finalize () {  # finalize TAG OUTDIR LASTSEG FLAGS...
  local tag=$1 out=$2 last=$3; shift 3
  if [ ! -f "$out/final_model.msgpack" ] && \
     [ -f "$out/checkpoint_epoch$last.msgpack" ]; then
    run python -u -m fresnel_tpu.train.train_gaussian_decoder "$@" \
      --output_dir "$out" \
      --resume "$out/checkpoint_epoch$last.msgpack" >> "logs/$tag.log" 2>&1
  fi
  if [ -f "$out/final_model.msgpack" ]; then
    python -m fresnel_tpu.train.thin_ckpt "$out/final_model.msgpack" \
      "results/${tag}_model.msgpack" >> "logs/$tag.log" 2>&1
    python tools/durable_store.py put "results/${tag}_model.msgpack" \
      --prune-prefix "${tag}_epoch" >> "logs/$tag.log" 2>&1
    return 0
  fi
  return 1
}

# ---- stage D: view-aware combo on corpus_v2, K=8 recipe -----------------
# T-048 winner rule resolved: e74 final eval 0.686 < K=8's 0.719 -> K=8.
COMBO="--experiment 2 --data_dir data/corpus_v2 --batch_size 4 --lr 2e-4
  --max_per_tile 1024 --surface_init --no_augmentation --train_encoder
  --epochs 225 --depth_z_scale 2.0 --z_offset_scale 0.2
  --depth_offset_init -1.0 --view_weight 0.5 --gaussians_per_patch 8"
out=checkpoints/r5combo
if [ ! -f results/eval_r5combo_eval.json ]; then
  prev=""
  for stop in 50 100 150 200; do
    seg r5combo $out $stop "$prev" $COMBO || break
    prev=$stop
  done
  if finalize r5combo $out 200 $COMBO; then
    evalrun $out/final_model.msgpack r5combo \
      data/corpus_v2 data/corpus_v2_eval
  fi
fi

# ---- stage B: CVS on exact-GT pairs + end-to-end ------------------------
CVS="--gt_multiview --data_dir data/corpus_v2
  --dataset_cache data/cvs_gt_cache.npz
  --image_size 256 --base_channels 128 --batch_size 4 --use_amp
  --concat_input_view --epochs 100 --output_dir checkpoints_cvs_gt"
if [ ! -f results/eval_cvs_gt.json ]; then
  if [ ! -f checkpoints_cvs_gt/cvs.msgpack ]; then
    run python -u -m fresnel_tpu.train.train_cvs $CVS --stop_epoch 50 \
      >> logs/cvs_gt.log 2>&1
  fi
  if [ ! -f checkpoints_cvs_gt/cvs_final.msgpack ]; then
    run python -u -m fresnel_tpu.train.train_cvs $CVS \
      --resume checkpoints_cvs_gt/cvs.msgpack >> logs/cvs_gt.log 2>&1
  fi
  if [ -f checkpoints_cvs_gt/cvs_final.msgpack ]; then
    run python -u experiments/eval_cvs.py \
      --ckpt checkpoints_cvs_gt/cvs_final.msgpack \
      --cache data/cvs_gt_cache.npz --n 24 \
      --grid results/cvs_gt_grid.png \
      --out_json results/eval_cvs_gt.json >> logs/cvs_gt.log 2>&1
    run python -u experiments/cvs_denoise_curve.py \
      --ckpt checkpoints_cvs_gt/cvs_final.msgpack --n 16 \
      --cache data/cvs_gt_cache.npz \
      --out_json results/cvs_gt_denoise_curve.json >> logs/cvs_gt.log 2>&1
    python -m fresnel_tpu.train.thin_ckpt \
      checkpoints_cvs_gt/cvs_final.msgpack results/cvs_gt_model.msgpack \
      >> logs/cvs_gt.log 2>&1
  fi
fi
if [ -f checkpoints_cvs_gt/cvs_final.msgpack ] && \
   [ ! -f results/eval_cvs_e2e.json ]; then
  # eval_cvs_e2e takes the tpu_lock internally — no `run` wrapper.
  python -u experiments/eval_cvs_e2e.py \
    --ckpt checkpoints_cvs_gt/cvs_final.msgpack \
    --scenes data/corpus_v2/scene_0000.png data/corpus_v2/scene_0001.png \
             data/corpus_v2/scene_0002.png \
    --out_json results/eval_cvs_e2e.json > logs/cvs_e2e.log 2>&1
fi

# ---- stage C: exp2_g74zi (zero-init validation, T-045 closure) ----------
GZI="--experiment 2 --data_dir data/corpus_v1 --batch_size 8 --lr 2e-4
  --max_per_tile 1024 --depth_offset_init -0.128 --surface_init
  --no_augmentation --train_encoder --epochs 150
  --feature_upsample 2 --gaussians_per_patch 2"
out=checkpoints/exp2_g74zi
if [ ! -f results/eval_exp2_g74zi_eval.json ]; then
  prev=""
  for stop in 50 100; do
    seg exp2_g74zi $out $stop "$prev" $GZI || break
    prev=$stop
  done
  if finalize exp2_g74zi $out 100 $GZI; then
    evalrun $out/final_model.msgpack exp2_g74zi \
      data/corpus_v1 data/corpus_v1_eval
  fi
fi

# ---- stage E: exp2_e74k2 (74^2 native lattice x K=2 = K=8's budget) -----
E74K2="--experiment 2 --data_dir data/corpus_v1 --batch_size 4 --lr 2e-4
  --max_per_tile 1024 --depth_offset_init -0.128 --surface_init
  --no_augmentation --train_encoder --epochs 300
  --feature_size 74 --encoder_attn_pool 2 --gaussians_per_patch 2"
out=checkpoints/exp2_e74k2
if [ ! -f results/eval_exp2_e74k2_eval.json ]; then
  prev=""
  for stop in 50 100 150 200 250; do
    seg exp2_e74k2 $out $stop "$prev" $E74K2 || break
    prev=$stop
    if [ "$stop" = 150 ] && [ ! -f results/eval_exp2_e74k2_mid_eval.json ]
    then
      evalrun $out/checkpoint_epoch150.msgpack exp2_e74k2_mid \
        data/corpus_v1 data/corpus_v1_eval
      python experiments/spectrum_gap.py \
        results/exp2_e74k2_mid_eval_grid.png \
        > results/spectrum_exp2_e74k2_mid.txt 2>&1
    fi
  done
  if finalize exp2_e74k2 $out 250 $E74K2; then
    evalrun $out/final_model.msgpack exp2_e74k2 \
      data/corpus_v1 data/corpus_v1_eval
    python experiments/spectrum_gap.py results/exp2_e74k2_eval_grid.png \
      > results/spectrum_exp2_e74k2.txt 2>&1
  fi
fi

echo "round5 queue3 done $(date -u)" | tee -a logs/round5_queue3.log
