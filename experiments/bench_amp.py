"""bf16 mixed-precision speedup benchmark on the real TPU.

Measures fp32 vs bf16 (--use_amp) for the three matmul-heavy paths:
  1. CVS one-step view generation (T-006 config: 256 px, base 128);
  2. v2 DirectSLatDecoder train step (T-004 config: 3 layers, 512 voxels);
  3. decoder train step (T-004 config: batch 2 @64 px).

Run:  python -u experiments/bench_amp.py [--skip cvs,v2,dec]
"""

import argparse
import time

import numpy as np


def _time(fn, inputs, iters=12):
    """Steady-state ms/iter over distinct inputs (the TPU runtime caches
    identical executions)."""
    import jax

    out = fn(*inputs[0])
    jax.block_until_ready(out)
    outs = []
    t0 = time.perf_counter()
    for i in range(iters):
        outs.append(fn(*inputs[i % len(inputs)]))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1000.0


def bench_cvs(use_amp: bool) -> float:
    import jax
    import jax.numpy as jnp

    from fresnel_tpu.models.cvs import CVSConfig, ConsistencyViewSynthesizer

    cfg = CVSConfig(image_size=256, base_channels=128,
                    dtype=jnp.bfloat16 if use_amp else None)
    model = ConsistencyViewSynthesizer(cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(1, 37, 37, 384)).astype(np.float32))
    img = jnp.asarray(rng.uniform(size=(1, 3, 256, 256)).astype(np.float32))
    R = jnp.eye(3)[None]
    t = jnp.asarray([[0.0, 0.0, 2.0]], jnp.float32)
    noise0 = jnp.asarray(rng.normal(size=(1, 3, 256, 256)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img, feats, R, t,
                                 noise=noise0)

    gen = jax.jit(lambda p, f, n: model.apply(p, f, R, t, n, 1,
                                              method=model.generate))
    noises = [jnp.asarray(rng.normal(size=(1, 3, 256, 256)).astype(np.float32))
              for _ in range(4)]
    return _time(gen, [(params, feats, n) for n in noises])


def bench_v2(use_amp: bool) -> float:
    import jax
    import jax.numpy as jnp

    from fresnel_tpu.data.trellis import SyntheticTrellisDataset
    from fresnel_tpu.train.train_direct_decoder import V2Config, V2Trainer

    cfg = V2Config(num_layers=3, max_coords=512, max_gaussians=1024,
                   batch_size=2, use_amp=use_amp)
    ds = SyntheticTrellisDataset(n_samples=8, seed=0,
                                 feature_dim=cfg.feature_dim)
    trainer = V2Trainer(cfg)
    nprng = np.random.default_rng(0)
    batches = [jax.tree.map(jnp.asarray, b)
               for b in ds.batches(cfg.batch_size, nprng)]
    state = trainer.init_state(batches[0])
    step = trainer._build_step()

    # step donates state; keep threading it.
    state, _ = step(state, batches[0], jax.random.PRNGKey(0))
    jax.block_until_ready(state["step"])
    t0 = time.perf_counter()
    iters = 12
    for i in range(iters):
        state, ld = step(state, batches[i % len(batches)],
                         jax.random.PRNGKey(i))
    jax.block_until_ready(state["step"])
    return (time.perf_counter() - t0) / iters * 1000.0


def bench_decoder(use_amp: bool) -> float:
    import jax
    import jax.numpy as jnp

    from fresnel_tpu.data.dataset import SyntheticGaussianDataset
    from fresnel_tpu.train.config import (
        HFGSConfig, HFTSConfig, PhysicsConfig, TrainingConfig)
    from fresnel_tpu.train.harness import Trainer

    ds = SyntheticGaussianDataset(n_samples=8, image_size=64,
                                  n_gaussians=64, seed=1)
    cfg = TrainingConfig(
        experiment=2, batch_size=2, image_size=64, gaussians_per_patch=4,
        use_fresnel_zones=True, use_edge_aware=True, lpips_weight=0.0,
        output_dir="/tmp/bench_amp", use_amp=use_amp)
    trainer = Trainer(cfg, PhysicsConfig(), HFGSConfig(), HFTSConfig())
    nprng = np.random.default_rng(0)
    batches = [jax.tree.map(jnp.asarray, b)
               for b in ds.batches(cfg.batch_size, nprng)]
    state = trainer.init_state(batches[0])
    step = trainer.get_step(K=4, stochastic_k=None)
    state, _ = step(state, batches[0], jax.random.PRNGKey(0))
    jax.block_until_ready(state["step"])
    t0 = time.perf_counter()
    iters = 12
    for i in range(iters):
        state, ld = step(state, batches[i % len(batches)],
                         jax.random.PRNGKey(i))
    jax.block_until_ready(state["step"])
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip", default="")
    args = p.parse_args()
    skip = set(args.skip.split(","))

    benches = {"cvs": bench_cvs, "v2": bench_v2, "dec": bench_decoder}
    for name, fn in benches.items():
        if name in skip:
            continue
        f32 = fn(False)
        bf16 = fn(True)
        print(f"{name:4s}  fp32 {f32:8.2f} ms   bf16 {bf16:8.2f} ms   "
              f"speedup {f32 / bf16:.2f}x", flush=True)


if __name__ == "__main__":
    main()
