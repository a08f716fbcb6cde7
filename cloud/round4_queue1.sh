#!/bin/bash
# Round-4 TPU queue, take 1.
#
# Science this round (VERDICT r3 #1/#5/#6 follow-ups):
#   A. corpus_v2 baseline rows: the corpus_v1 flagship (exp2_enc) and the
#      K=8 arm evaluated on corpus_v2's exact-GT views — the comparison
#      rows T-041 (v2combo interpretation) was missing.
#   B. exp2_g74  — finer-LATTICE capacity arm: feature_upsample=2, K=2
#      (74x74x2 = 10952 Gaussians, SAME budget as exp2_k8's 37x37x8).
#      T-038/T-040 localized the texture cliff at the 37x37 grid Nyquist
#      and showed K alone doesn't move it; this doubles the lattice rate.
#   C. exp2_g74k1 — equal-budget control at the flagship's N (74x74x1 =
#      5476 = 37x37x4): lattice effect at constant Gaussian count.
#   D. CVS on corpus_v2 exact-GT pairs (--gt_multiview --concat_input_view),
#      150 epochs: remove the teacher-fit error floor from CVS training.
#
# Discipline:
#   * every TPU command runs under flock .tpu.lock (bench.py waits on it —
#     round-3's 38 ms snapshot artifact cannot recur);
#   * durable segments: epoch checkpoints + sidecars copied to results/
#     IN PAIRS and removed IN PAIRS when the final model lands (advisor r3);
#   * relaunchable after a VM reset: segments already in results/ are
#     restored, finished arms are skipped.
cd "$(dirname "$0")/.."
mkdir -p logs results checkpoints
LOCK=.tpu.lock

run () { flock "$LOCK" "$@"; }

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
  if [ -f "results/${tag}_epoch$stop.msgpack" ]; then
    mkdir -p "$out"; cp "results/${tag}_epoch$stop.msgpack" "$ck"
    cp -f "results/${tag}_epoch$stop.msgpack.json" "$ck.json" 2>/dev/null
    return 0
  fi
  local rflag=""
  [ -n "$resume" ] && rflag="--resume $out/checkpoint_epoch$resume.msgpack"
  run python -u -m fresnel_tpu.train.train_gaussian_decoder "$@" \
    --output_dir "$out" --stop_epoch "$stop" $rflag >> "logs/$tag.log" 2>&1
  cp -f "$ck" "results/${tag}_epoch$stop.msgpack"
  cp -f "$ck.json" "results/${tag}_epoch$stop.msgpack.json"
}

# ---- A. corpus_v2 baseline rows (cheap, first) ----
if [ ! -f results/eval_exp2_enc_on_v2_eval.json ]; then
  evalrun results/exp2_enc_model.msgpack exp2_enc_on_v2 \
    data/corpus_v2 data/corpus_v2_eval
fi
if [ ! -f results/eval_exp2_k8_on_v2_eval.json ]; then
  evalrun results/exp2_k8_model.msgpack exp2_k8_on_v2 \
    data/corpus_v2 data/corpus_v2_eval
fi

# ---- B. exp2_g74: finer lattice at the K=8 budget ----
G74="--experiment 2 --data_dir data/corpus_v1 --batch_size 8 --lr 2e-4
  --max_per_tile 1024 --depth_offset_init -0.128 --surface_init
  --no_augmentation --train_encoder --epochs 300
  --feature_upsample 2 --gaussians_per_patch 2"
out=checkpoints/exp2_g74
if [ ! -f results/eval_exp2_g74_eval.json ]; then
  seg exp2_g74 $out 75  ""  $G74
  seg exp2_g74 $out 150 75  $G74
  seg exp2_g74 $out 225 150 $G74
  if [ ! -f $out/final_model.msgpack ]; then
    run python -u -m fresnel_tpu.train.train_gaussian_decoder $G74 \
      --output_dir $out \
      --resume $out/checkpoint_epoch225.msgpack >> logs/exp2_g74.log 2>&1
  fi
  evalrun $out/final_model.msgpack exp2_g74 data/corpus_v1 data/corpus_v1_eval
  cp -f $out/final_model.msgpack results/exp2_g74_model.msgpack
  cp -f $out/final_model.msgpack.json results/exp2_g74_model.msgpack.json
  rm -f results/exp2_g74_epoch*.msgpack results/exp2_g74_epoch*.msgpack.json
fi

# ---- C. exp2_g74k1: finer lattice at the flagship budget ----
G74K1="--experiment 2 --data_dir data/corpus_v1 --batch_size 8 --lr 2e-4
  --max_per_tile 1024 --depth_offset_init -0.128 --surface_init
  --no_augmentation --train_encoder --epochs 300
  --feature_upsample 2 --gaussians_per_patch 1"
out=checkpoints/exp2_g74k1
if [ ! -f results/eval_exp2_g74k1_eval.json ]; then
  seg exp2_g74k1 $out 75  ""  $G74K1
  seg exp2_g74k1 $out 150 75  $G74K1
  seg exp2_g74k1 $out 225 150 $G74K1
  if [ ! -f $out/final_model.msgpack ]; then
    run python -u -m fresnel_tpu.train.train_gaussian_decoder $G74K1 \
      --output_dir $out \
      --resume $out/checkpoint_epoch225.msgpack >> logs/exp2_g74k1.log 2>&1
  fi
  evalrun $out/final_model.msgpack exp2_g74k1 \
    data/corpus_v1 data/corpus_v1_eval
  cp -f $out/final_model.msgpack results/exp2_g74k1_model.msgpack
  cp -f $out/final_model.msgpack.json results/exp2_g74k1_model.msgpack.json
  rm -f results/exp2_g74k1_epoch*.msgpack \
        results/exp2_g74k1_epoch*.msgpack.json
fi

# ---- D. CVS on exact-GT corpus_v2 pairs ----
CVS="--gt_multiview --data_dir data/corpus_v2
  --dataset_cache data/cvs_gt_cache.npz
  --image_size 256 --base_channels 128 --batch_size 4 --use_amp
  --concat_input_view --epochs 150 --output_dir checkpoints_cvs_gt"
if [ ! -f results/eval_cvs_gt.json ]; then
  if [ ! -f checkpoints_cvs_gt/cvs.msgpack ]; then
    run python -u -m fresnel_tpu.train.train_cvs $CVS --stop_epoch 25 \
      > logs/cvs_gt.log 2>&1
  fi
  for STOP in "--stop_epoch 50" "--stop_epoch 75" "--stop_epoch 100" \
              "--stop_epoch 125" ""; do
    [ -f checkpoints_cvs_gt/cvs_final.msgpack ] && break
    run python -u -m fresnel_tpu.train.train_cvs $CVS $STOP \
      --resume checkpoints_cvs_gt/cvs.msgpack >> logs/cvs_gt.log 2>&1
  done
  run python -u experiments/eval_cvs.py \
    --ckpt checkpoints_cvs_gt/cvs_final.msgpack \
    --cache data/cvs_gt_cache.npz --n 24 \
    --grid results/cvs_gt_grid.png \
    --out_json results/eval_cvs_gt.json >> logs/cvs_gt.log 2>&1
  run python -u experiments/cvs_denoise_curve.py \
    --ckpt checkpoints_cvs_gt/cvs_final.msgpack --n 16 \
    --cache data/cvs_gt_cache.npz \
    --out_json results/cvs_gt_denoise_curve.json >> logs/cvs_gt.log 2>&1
fi

echo "queue1 done $(date -u)" | tee -a logs/round4_queue1.log
