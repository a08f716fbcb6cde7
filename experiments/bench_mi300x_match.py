"""Matched-config training-step throughput vs the reference's MI300X run.

VERDICT round-1 item #6: adjudicate the >=3x MI300X v5e-8 target with
arithmetic, not extrapolation.

Reference side (derived from its own published numbers):
  cloud/train.sh "standard" mode (reference cloud/train.sh:99-109) trains
  experiment 2 for 200 epochs at batch_size=128, image_size=256 with the
  DEFAULT loss stack (L1 + SSIM 0.5 + LPIPS 0.1 + depth 0.1 - no fast_mode
  flags) on the 500-image LPFF set (reference README.md:433), estimated at
  ~6 h on a $1.99/h MI300X (reference README.md:354-359).
    image-visits = 500 images x 200 epochs = 100,000
    throughput   = 100,000 / 21,600 s = 4.63 img/s
    steps        = 200 x floor(500/128 -> 3..4)  ~= 27 s / B=128 step

This script measures the SAME config on one v5e chip: experiment 2
decoder (K=4, 37x37 patches -> 5476 Gaussians), B=128 @256^2, the full
default loss stack INCLUDING LPIPS (random-weight AlexNet - identical
FLOPs/timing to pretrained weights, which are not downloadable here).

Cycles 3 distinct batches (the axon runtime caches identical executions).

Run:  python -u experiments/bench_mi300x_match.py
"""

import time

import numpy as np


def main():
    from fresnel_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from fresnel_tpu.losses.lpips import random_lpips
    from fresnel_tpu.train.config import TrainingConfig
    from fresnel_tpu.train.harness import Trainer

    B, RES = 128, 256
    cfg = TrainingConfig(experiment=2, batch_size=B, image_size=RES,
                        epochs=200)
    trainer = Trainer(cfg, lpips=random_lpips())

    rng = np.random.default_rng(0)
    batches = []
    for _ in range(3):
        batches.append({
            "features": jnp.asarray(
                rng.standard_normal((B, 37, 37, 384), dtype=np.float32)),
            "depth": jnp.asarray(
                rng.random((B, RES, RES), dtype=np.float32)),
            "image": jnp.asarray(
                rng.random((B, 3, RES, RES), dtype=np.float32)),
        })

    state = trainer.init_state({k: np.asarray(v[:1]) for k, v in
                                batches[0].items()})
    step = trainer.get_step(cfg.gaussians_per_patch, None)
    key = jax.random.PRNGKey(0)

    # Warm up / compile (donated state: keep threading it through).
    t0 = time.perf_counter()
    state, ld = step(state, batches[0], key)
    jax.block_until_ready(ld)
    print(f"compile + first step: {time.perf_counter() - t0:.1f}s")

    times = []
    for i in range(9):
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        state, ld = step(state, batches[i % 3], k)
        jax.block_until_ready(ld)
        times.append(time.perf_counter() - t0)
    step_s = float(np.median(times))

    img_s_chip = B / step_s
    img_s_pod = img_s_chip * 8          # dp over v5e-8 (dryrun-validated);
    # gradient all-reduce is ~1 MB (2.5M-param decoder) — sub-ms on ICI.
    ref_img_s = 100_000 / 21_600.0      # derived above
    ratio = img_s_pod / ref_img_s

    print(f"v5e B={B} @{RES}^2 step: {step_s * 1e3:.0f} ms "
          f"({img_s_chip:.1f} img/s/chip)")
    print(f"v5e-8 dp projection: {img_s_pod:.0f} img/s")
    print(f"reference MI300X standard (derived): {ref_img_s:.2f} img/s "
          f"(~27 s / B=128 step)")
    print(f"ratio: {ratio:.0f}x (target >=3x) -> "
          f"{'PASS' if ratio >= 3 else 'FAIL'}")
    print(f"single-chip-only ratio: {img_s_chip / ref_img_s:.0f}x")


if __name__ == "__main__":
    main()
