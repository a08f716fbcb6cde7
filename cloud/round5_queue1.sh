#!/bin/bash
# Round-5 TPU queue, take 1 — the four open training adjudications, in
# the round-4 verdict's priority order:
#   A. exp2_e74 to 300 epochs (mid-eval at 150) -> T-048 lattice verdict.
#      Resumes from the surviving epoch-50 checkpoint; two rounds of
#      diagnostics (T-038/T-040/T-045) point at the native-74 lattice.
#   A2. `fresnel refine` frontier with ESTIMATED depth on-chip (verdict
#      item 8 — closes the T-046 GT-depth caveat).  Short.
#   B. CVS on exact-GT corpus_v2 pairs + the end-to-end
#      CVS->optimize_3dgs->GT number (verdict item 2, round-3 ask #6).
#   C. exp2_g74zi zero-init validation (verdict item 3, closes T-045).
#   D. view-aware combo on corpus_v2 with the stage-A winner (verdict
#      item 7) — e74 recipe if its mid/final eval beats K=8's
#      0.719/18.37, else K=8.
#
# Durability rules (CLAUDE.md): every TPU command serializes on
# .tpu.lock; tools with an INTERNAL tpu_lock (bench_refine, eval_cvs_e2e,
# bench.py) must NOT also be flock-wrapped — the outer lock would stall
# the inner acquire for its full timeout.  Segment checkpoints go to the
# orphan `durable` branch as THIN bf16 exports (tools/durable_store.py +
# train/thin_ckpt.py), NOT main's results/ — round-4 verdict item 4.
cd "$(dirname "$0")/.."
mkdir -p logs results checkpoints
LOCK=.tpu.lock
run () { flock "$LOCK" "$@"; }

# ---- stage 0: corpora — gate on the corpus dirs themselves, not a
# marker file (advisor r4 medium: the tracked marker survived resets
# that wiped the gitignored corpora, skipping regeneration).
if [ ! -f data/corpus_v1/scene_0159.png ] || \
   [ ! -f data/corpus_v1_eval/scene_0023.png ] || \
   [ ! -f data/corpus_v2/scene_0159.png ] || \
   [ ! -f data/corpus_v2_eval/scene_0023.png ]; then
  bash cloud/make_corpus.sh > logs/make_corpus.log 2>&1
fi
# Size guard hook (idempotent).
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
  # Reset recovery: rehydrate ALL durable copies for this tag that are
  # not on local disk (advisor r4: recovering only the stop epoch made
  # lower segments retrain from 0).  Thin copies resume via the
  # harness's thin loader (fresh optimizer state).
  local n e f
  for n in $(python tools/durable_store.py list "${tag}_epoch" \
               | grep -v '\.json$'); do
    e=${n##*_epoch}; e=${e%.msgpack}
    f="$out/checkpoint_epoch$e.msgpack"
    [ -f "$f" ] || python tools/durable_store.py get "$n" "$f"
  done
  # Also accept tracked results/ thin copies (e.g. exp2_e74_epoch50).
  for f in results/${tag}_epoch*.msgpack; do
    [ -f "$f" ] || continue
    e=${f##*_epoch}; e=${e%.msgpack}
    if [ ! -f "$out/checkpoint_epoch$e.msgpack" ]; then
      cp "$f" "$out/checkpoint_epoch$e.msgpack"
      cp -f "$f.json" "$out/checkpoint_epoch$e.msgpack.json" 2>/dev/null
    fi
  done
  [ -f "$ck" ] && return 0
  # Resume from the newest on-disk checkpoint BELOW stop.
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

finalize () {  # finalize TAG OUTDIR LASTSEG FLAGS... — run final epochs,
               # thin-export the final model into results/ (<=20 MB cap).
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

# ---- stage A: exp2_e74 to 300 (T-048) -----------------------------------
E74="--experiment 2 --data_dir data/corpus_v1 --batch_size 4 --lr 2e-4
  --max_per_tile 1024 --depth_offset_init -0.128 --surface_init
  --no_augmentation --train_encoder --epochs 300
  --feature_size 74 --encoder_attn_pool 2 --gaussians_per_patch 1"
out=checkpoints/exp2_e74
if [ ! -f results/eval_exp2_e74_eval.json ]; then
  prev=""
  for stop in 50 75 100 125 150 175 200 225 250 275; do
    seg exp2_e74 $out $stop "$prev" $E74 || break
    prev=$stop
    if [ "$stop" = 150 ] && [ ! -f results/eval_exp2_e74_mid_eval.json ]; then
      evalrun $out/checkpoint_epoch150.msgpack exp2_e74_mid \
        data/corpus_v1 data/corpus_v1_eval
    fi
  done
  if finalize exp2_e74 $out 275 $E74; then
    evalrun $out/final_model.msgpack exp2_e74 data/corpus_v1 data/corpus_v1_eval
    python experiments/spectrum_gap.py results/exp2_e74_eval_grid.png \
      > results/spectrum_exp2_e74.txt 2>&1
  fi
fi

# ---- stage A2: refine frontier with estimated depth (T-046 closure) -----
if [ ! -f results/bench_refine_estdepth.json ]; then
  python -u experiments/bench_refine.py --estimated_depth \
    --scenes 4 --steps 120 400 800 \
    --out_json results/bench_refine_estdepth.json \
    > logs/bench_refine_estdepth.log 2>&1
fi

# ---- stage B: CVS on exact-GT pairs + end-to-end -------------------------
CVS="--gt_multiview --data_dir data/corpus_v2
  --dataset_cache data/cvs_gt_cache.npz
  --image_size 256 --base_channels 128 --batch_size 4 --use_amp
  --concat_input_view --epochs 100 --output_dir checkpoints_cvs_gt"
if [ ! -f results/eval_cvs_gt.json ]; then
  if [ ! -f checkpoints_cvs_gt/cvs.msgpack ]; then
    run python -u -m fresnel_tpu.train.train_cvs $CVS --stop_epoch 25 \
      >> logs/cvs_gt.log 2>&1
  fi
  for STOP in "--stop_epoch 50" "--stop_epoch 75" ""; do
    [ -f checkpoints_cvs_gt/cvs_final.msgpack ] && break
    run python -u -m fresnel_tpu.train.train_cvs $CVS $STOP \
      --resume checkpoints_cvs_gt/cvs.msgpack >> logs/cvs_gt.log 2>&1
  done
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

# ---- stage D: view-aware combo on corpus_v2 with the stage-A winner -----
# Winner rule: e74 if its FINAL eval SSIM > K=8's 0.719 (fall back to the
# mid eval if the final is not on disk yet); else the K=8 recipe.
pick_winner () {
  python - <<'EOF'
import json, pathlib
k8 = 0.719
for p in ("results/eval_exp2_e74_eval.json",
          "results/eval_exp2_e74_mid_eval.json"):
    f = pathlib.Path(p)
    if f.exists():
        e74 = json.loads(f.read_text()).get("frontal_ssim", 0)
        print("e74" if e74 > k8 else "k8")
        break
else:
    print("k8")
EOF
}
if [ ! -f results/eval_r5combo_eval.json ]; then
  WINNER=$(pick_winner)
  echo "stage D winner: $WINNER $(date -u)" | tee -a logs/r5combo.log
  if [ "$WINNER" = "e74" ]; then
    ARCH="--feature_size 74 --encoder_attn_pool 2 --gaussians_per_patch 1"
  else
    ARCH="--gaussians_per_patch 8"
  fi
  COMBO="--experiment 2 --data_dir data/corpus_v2 --batch_size 4 --lr 2e-4
    --max_per_tile 1024 --surface_init --no_augmentation --train_encoder
    --epochs 225 --depth_z_scale 2.0 --z_offset_scale 0.2
    --depth_offset_init -1.0 --view_weight 0.5 $ARCH"
  out=checkpoints/r5combo
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

echo "round5 queue1 done $(date -u)" | tee -a logs/round5_queue1.log
