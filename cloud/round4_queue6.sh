#!/bin/bash
# Round-4 TPU queue, take 6 — WEDGE RECOVERY.  The queue5 exp2_e74 stage
# hung mid-epoch-23: the training process sat blocked on a device dispatch
# for 15 minutes (one thread in ep_poll on the tunnel socket, device probe
# 71 s for a trivial matmul) and was killed.  Same stages as queue5 in the
# same order, with one upgrade: seg() resumes from the NEWEST local
# checkpoint below the segment stop (kill/reset recovery inside a
# segment), so the 22 epochs e74 already trained are not retrained.
cd "$(dirname "$0")/.."
mkdir -p logs results checkpoints
LOCK=.tpu.lock
run () { flock "$LOCK" "$@"; }

# ---- stage 0: corpora (deterministic; regenerate if a reset ate them)
if [ ! -f data/.corpus_ready ]; then
  bash cloud/make_corpus.sh > logs/make_corpus.log 2>&1 && \
    touch data/.corpus_ready
fi

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
  # Resume from the newest on-disk checkpoint BELOW stop (mid-segment
  # kill/reset recovery), falling back to the declared segment start.
  local best="" beste=-1 f e
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
  cp -f "$ck" "results/${tag}_epoch$stop.msgpack"
  cp -f "$ck.json" "results/${tag}_epoch$stop.msgpack.json"
  local prev
  for prev in results/${tag}_epoch*.msgpack; do
    [ "$prev" = "results/${tag}_epoch$stop.msgpack" ] && continue
    [ "$prev" = "results/${tag}_epoch150.msgpack" ] && continue
    rm -f "$prev" "$prev.json"
  done
}

# ---- stage A: exp2_e74 -------------------------------------------------
E74="--experiment 2 --data_dir data/corpus_v1 --batch_size 4 --lr 2e-4
  --max_per_tile 1024 --depth_offset_init -0.128 --surface_init
  --no_augmentation --train_encoder --epochs 300
  --feature_size 74 --encoder_attn_pool 2 --gaussians_per_patch 1"
out=checkpoints/exp2_e74
if [ ! -f results/eval_exp2_e74_eval.json ]; then
  prev=""
  for stop in 25 50 75 100 125 150 175 200 225 250 275; do
    seg exp2_e74 $out $stop "$prev" $E74 || break
    prev=$stop
    if [ "$stop" = 150 ] && [ ! -f results/eval_exp2_e74_mid_eval.json ]; then
      evalrun $out/checkpoint_epoch150.msgpack exp2_e74_mid \
        data/corpus_v1 data/corpus_v1_eval
    fi
  done
  if [ -f $out/checkpoint_epoch275.msgpack ] && \
     [ ! -f $out/final_model.msgpack ]; then
    run python -u -m fresnel_tpu.train.train_gaussian_decoder $E74 \
      --output_dir $out \
      --resume $out/checkpoint_epoch275.msgpack >> logs/exp2_e74.log 2>&1
  fi
  if [ -f $out/final_model.msgpack ]; then
    evalrun $out/final_model.msgpack exp2_e74 \
      data/corpus_v1 data/corpus_v1_eval
    cp -f $out/final_model.msgpack results/exp2_e74_model.msgpack
    cp -f $out/final_model.msgpack.json results/exp2_e74_model.msgpack.json
    rm -f results/exp2_e74_epoch*.msgpack results/exp2_e74_epoch*.msgpack.json
  fi
fi

# ---- stage B: CVS on exact-GT pairs + end-to-end ------------------------
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
  [ -f checkpoints_cvs_gt/cvs_final.msgpack ] || exit 1
  run python -u experiments/eval_cvs.py \
    --ckpt checkpoints_cvs_gt/cvs_final.msgpack \
    --cache data/cvs_gt_cache.npz --n 24 \
    --grid results/cvs_gt_grid.png \
    --out_json results/eval_cvs_gt.json >> logs/cvs_gt.log 2>&1
  run python -u experiments/cvs_denoise_curve.py \
    --ckpt checkpoints_cvs_gt/cvs_final.msgpack --n 16 \
    --cache data/cvs_gt_cache.npz \
    --out_json results/cvs_gt_denoise_curve.json >> logs/cvs_gt.log 2>&1
  cp -f checkpoints_cvs_gt/cvs_final.msgpack results/cvs_gt_model.msgpack
  cp -f checkpoints_cvs_gt/cvs_final.msgpack.json \
    results/cvs_gt_model.msgpack.json 2>/dev/null
fi
if [ -f checkpoints_cvs_gt/cvs_final.msgpack ] && \
   [ ! -f results/eval_cvs_e2e.json ]; then
  python -u experiments/eval_cvs_e2e.py \
    --ckpt checkpoints_cvs_gt/cvs_final.msgpack \
    --scenes data/corpus_v2/scene_0000.png data/corpus_v2/scene_0001.png \
             data/corpus_v2/scene_0002.png \
    --out_json results/eval_cvs_e2e.json > logs/cvs_e2e.log 2>&1
fi

# ---- stage C: exp2_g74zi (zero-init validation, T-045) ------------------
GZI="--experiment 2 --data_dir data/corpus_v1 --batch_size 8 --lr 2e-4
  --max_per_tile 1024 --depth_offset_init -0.128 --surface_init
  --no_augmentation --train_encoder --epochs 150
  --feature_upsample 2 --gaussians_per_patch 2"
out=checkpoints/exp2_g74zi
if [ ! -f results/eval_exp2_g74zi_eval.json ]; then
  prev=""
  for stop in 25 50 75 100 125; do
    seg exp2_g74zi $out $stop "$prev" $GZI || break
    prev=$stop
  done
  if [ -f $out/checkpoint_epoch125.msgpack ] && \
     [ ! -f $out/final_model.msgpack ]; then
    run python -u -m fresnel_tpu.train.train_gaussian_decoder $GZI \
      --output_dir $out \
      --resume $out/checkpoint_epoch125.msgpack >> logs/exp2_g74zi.log 2>&1
  fi
  if [ -f $out/final_model.msgpack ]; then
    evalrun $out/final_model.msgpack exp2_g74zi \
      data/corpus_v1 data/corpus_v1_eval
    rm -f results/exp2_g74zi_epoch*.msgpack \
      results/exp2_g74zi_epoch*.msgpack.json
  fi
fi

echo "queue6 done $(date -u)" | tee -a logs/round4_queue6.log
