"""MFU / roofline accounting for the three headline programs.

Round-4 verdict item 5: the headline latency (9.716 ms), the training
step (89.4 img/s/chip), and the 1M-raster floor (146 ms) have never
been stated as achieved TFLOP/s vs the v5e's peak.  This script counts
the FLOPs of the exact jitted programs with XLA's own post-optimization
cost model (``compiled.cost_analysis()``) and divides by the measured
wall-clock records.

Two modes:

``--flops`` (default; forced-CPU so it never touches the busy chip —
the HLO arithmetic count is backend-independent even though fusion
details differ):
  * headline image->3DGS pipeline, B=1 (bench.py construction)
  * exp-2 training step, B=128 @256² full loss stack incl. LPIPS
    (bench_mi300x_match.py construction)
  * tiled rasterizer forward, 1M @512² (render/tile.py)
  Writes results/mfu.json with flops, bytes, and MFU vs v5e peak.

``--batched`` (real TPU, serialized on .tpu.lock): times the SAME
headline pipeline vmapped at B=8 — the compute-vs-dispatch split T-047
left open.  If per-image time at B=8 is far below the B=1 8.3 ms
"compute+dispatch" residue, the B=1 floor is per-call dispatch over the
tunnel, not compute — i.e. the headline has no model-side milliseconds
left worth chasing single-stream.

v5e-1 peaks (public spec): 197 TFLOP/s bf16, 819 GB/s HBM.
Reference anchor: the reference publishes no FLOP accounting at all —
its only latency claim is ~2 s end-to-end (reference README.md:207).
"""

import argparse
import json

import numpy as np

V5E_BF16_PEAK = 197e12          # FLOP/s
V5E_HBM_BW = 819e9              # B/s

# Measured wall-clock records these FLOP counts are read against.
HEADLINE_MS = 9.716             # BENCH_r04 (quiet-chip record 9.666)
TRAIN_IMG_S = 89.4              # T-025, B=128 @256² one v5e chip
TRAIN_B = 128
RASTER_1M_MS = 146.0            # docs/perf.md scaling table


def _analysis(compiled) -> dict:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):   # older jax returns [dict]
        ca = ca[0]
    return {"flops": float(ca.get("flops", -1)),
            "bytes": float(ca.get("bytes accessed", -1))}


def headline_lowered(jax, jnp, batch: int = 1):
    from fresnel_tpu.core.camera import Camera
    from fresnel_tpu.models.decoders import DirectPatchDecoder
    from fresnel_tpu.models.vit import DINOv2, DepthAnything
    from fresnel_tpu.render.tile import render_tiled

    res = 512
    dino = DINOv2(dtype=jnp.bfloat16)
    depth_model = DepthAnything(dtype=jnp.bfloat16)
    decoder = DirectPatchDecoder(gaussians_per_patch=4)
    camera = Camera.default_training(res)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    dummy518 = jnp.zeros((1, 518, 518, 3), jnp.float32)
    dino_params = dino.init(k1, dummy518)
    depth_params = depth_model.init(k2, dummy518)
    feats0 = dino.apply(dino_params, dummy518)
    depth0 = depth_model.apply(depth_params, dummy518)
    dec_params = decoder.init(k3, feats0, depth0)

    def one(dino_params, depth_params, dec_params, image):
        x518 = jax.image.resize(image, (518, 518, 3), "linear")[None]
        feats = dino.apply(dino_params, x518)
        depth = depth_model.apply(depth_params, x518)
        out = decoder.apply(dec_params, feats, depth)
        img = render_tiled(
            out["positions"][0], out["scales"][0], out["rotations"][0],
            out["colors"][0], out["opacities"][0], camera)
        return out["positions"], img

    if batch == 1:
        fn, arg = one, jnp.zeros((res, res, 3), jnp.float32)
    else:
        fn = jax.vmap(one, in_axes=(None, None, None, 0))
        arg = jnp.zeros((batch, res, res, 3), jnp.float32)
    params = (dino_params, depth_params, dec_params)
    return jax.jit(fn), params, arg


def flops_mode():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    rows = {}

    # --- headline pipeline, B=1 ---
    jfn, params, arg = headline_lowered(jax, jnp, 1)
    a = _analysis(jfn.lower(*params, arg).compile())
    t = HEADLINE_MS / 1e3
    rows["headline_b1"] = {
        **a, "measured_s": t,
        "achieved_tflops": a["flops"] / t / 1e12,
        "mfu_vs_bf16_peak": a["flops"] / t / V5E_BF16_PEAK,
        "hbm_bw_needed_gbs": a["bytes"] / t / 1e9,
        "record": "BENCH_r04 9.716 ms"}

    # --- exp-2 training step, B=128 @256², full default loss stack ---
    from fresnel_tpu.losses.lpips import random_lpips
    from fresnel_tpu.train.config import TrainingConfig
    from fresnel_tpu.train.harness import Trainer

    B, RES = TRAIN_B, 256
    cfg = TrainingConfig(experiment=2, batch_size=B, image_size=RES,
                         epochs=200)
    trainer = Trainer(cfg, lpips=random_lpips())
    rng = np.random.default_rng(0)
    batch = {
        "features": jnp.asarray(
            rng.standard_normal((B, 37, 37, 384), dtype=np.float32)),
        "depth": jnp.asarray(rng.random((B, RES, RES), dtype=np.float32)),
        "image": jnp.asarray(
            rng.random((B, 3, RES, RES), dtype=np.float32)),
    }
    state = trainer.init_state({k: np.asarray(v[:1])
                                for k, v in batch.items()})
    step = trainer.get_step(cfg.gaussians_per_patch, None)
    a = _analysis(step.lower(state, batch, jax.random.PRNGKey(0)).compile())
    t = TRAIN_B / TRAIN_IMG_S
    rows["train_step_b128"] = {
        **a, "measured_s": t,
        "achieved_tflops": a["flops"] / t / 1e12,
        "mfu_vs_bf16_peak": a["flops"] / t / V5E_BF16_PEAK,
        "hbm_bw_needed_gbs": a["bytes"] / t / 1e9,
        "record": "T-025 89.4 img/s/chip"}

    # --- tiled rasterizer forward, 1M @512² ---
    from fresnel_tpu.core.camera import Camera
    from fresnel_tpu.core.gaussians import GaussianCloud
    from fresnel_tpu.render.tile import render_tiled
    cloud = GaussianCloud.test_cloud(1_000_000, seed=0, spread=0.6,
                                     z_offset=-2.0)
    camera = Camera.default_training(512)
    jr = jax.jit(lambda p, s, r, c, o: render_tiled(p, s, r, c, o, camera))
    a = _analysis(jr.lower(cloud.positions, cloud.scales, cloud.rotations,
                           cloud.colors, cloud.opacities).compile())
    t = RASTER_1M_MS / 1e3
    rows["raster_1m_fwd"] = {
        **a, "measured_s": t,
        "achieved_tflops": a["flops"] / t / 1e12,
        "mfu_vs_bf16_peak": a["flops"] / t / V5E_BF16_PEAK,
        "hbm_bw_needed_gbs": a["bytes"] / t / 1e9,
        "record": "docs/perf.md 146 ms"}

    out = {"v5e_bf16_peak_tflops": V5E_BF16_PEAK / 1e12,
           "v5e_hbm_gbs": V5E_HBM_BW / 1e9, "rows": rows}
    with open("results/mfu.json", "w") as f:
        json.dump(out, f, indent=2)
    for k, v in rows.items():
        print(f"{k}: {v['flops'] / 1e9:.2f} GFLOP, "
              f"{v['achieved_tflops']:.2f} TFLOP/s achieved, "
              f"MFU {100 * v['mfu_vs_bf16_peak']:.1f}%, "
              f"bytes/s {v['hbm_bw_needed_gbs']:.0f} GB/s "
              f"[{v['record']}]")


def batched_mode(batch: int, iters: int):
    from fresnel_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import time

    import jax
    import jax.numpy as jnp

    from fresnel_tpu.utils.tpu_lock import tpu_lock

    rng = np.random.default_rng(0)
    inputs = [jnp.asarray(rng.uniform(size=(batch, 512, 512, 3))
                          .astype(np.float32)) for _ in range(4)]
    jfn, params, _ = headline_lowered(jax, jnp, batch)
    with tpu_lock(timeout_s=7200.0):
        t0 = time.perf_counter()
        outs = jfn(*params, inputs[0])
        jax.block_until_ready(outs)
        print(f"compile + first: {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        outs = [jfn(*params, inputs[i % 4]) for i in range(iters)]
        jax.block_until_ready(outs)
        ms = (time.perf_counter() - t0) / iters * 1000.0
    row = {"batch": batch, "ms_per_call": round(ms, 3),
           "ms_per_image": round(ms / batch, 3)}
    print(json.dumps(row))
    try:
        with open("results/mfu.json") as f:
            out = json.load(f)
    except FileNotFoundError:
        out = {"rows": {}}
    out["rows"][f"headline_b{batch}_tpu"] = row
    with open("results/mfu.json", "w") as f:
        json.dump(out, f, indent=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batched", action="store_true",
                    help="time the vmapped headline at --batch on the TPU")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()
    if args.batched:
        batched_mode(args.batch, args.iters)
    else:
        flops_mode()


if __name__ == "__main__":
    main()
