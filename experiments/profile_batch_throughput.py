"""Round-2 item: why is batched throughput flat (T-016: ~85-105 img/s at
every B)?  Isolates the batched RENDER stage and captures an optional
jax.profiler trace.

Stages timed per-image at B in {1, 4, 8}:
  render     vmap(render_tiled) on B independent 20k-Gaussian clouds @512²
  render_xla same with backend="xla" (scan compositor) — if pallas-vmap
             serializes, xla-vmap shows different scaling
  pipeline   full ViT features + depth + decoder + render (bench.py shape)

Run:  python -u experiments/profile_batch_throughput.py [--trace DIR]
"""

import argparse
import time


def bench(fn, args_list, warm):
    """Times each args entry exactly ONCE — the axon runtime caches
    repeated identical executions, so re-running the same inputs (the
    previous iters loop) reports fake sub-real latencies.  The loop ends
    with a SCALAR host read: axon block_until_ready lags one execution
    (T-031), so without it the last dispatch is untimed (~1/K error)."""
    import jax
    import jax.numpy as jnp

    jax.block_until_ready(fn(*warm))
    t0 = time.perf_counter()
    out = None
    for a in args_list:
        out = fn(*a)
        jax.block_until_ready(out)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / len(args_list)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None)
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--res", type=int, default=512)
    args = ap.parse_args()

    from fresnel_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fresnel_tpu.core.camera import Camera
    from fresnel_tpu.core.gaussians import GaussianCloud
    from fresnel_tpu.render.tile import TileRendererConfig, render_tiled

    cam = Camera.default_training(args.res)
    rng = np.random.default_rng(0)

    def stacked(B, seed0):
        cs = [GaussianCloud.test_cloud(args.n, seed=seed0 + i, spread=0.6,
                                       z_offset=-2.0)
              for i in range(B)]
        return tuple(
            jnp.stack([getattr(c, f) for c in cs])
            for f in ("positions", "scales", "rotations", "colors",
                      "opacities"))

    print(f"== batched render, {args.n} gaussians @{args.res}² ==")
    results = {}
    for backend in ("pallas", "xla"):
        cfg = TileRendererConfig(backend=backend)

        @jax.jit
        def rb(p, s, r, c, o):
            return jax.vmap(lambda pp, ss, rr, cc, oo: render_tiled(
                pp, ss, rr, cc, oo, cam, config=cfg))(p, s, r, c, o)

        for B in (1, 4, 8):
            batches = [stacked(B, 100 * B + 10 * k) for k in range(1, 7)]
            dt = bench(rb, batches, warm=stacked(B, 9000 + B))
            per_img = dt / B * 1e3
            results[(backend, B)] = per_img
            print(f"  {backend:6s} B={B}: {dt * 1e3:7.1f} ms/batch "
                  f"= {per_img:6.2f} ms/img ({1e3 / per_img:6.1f} img/s)")

    if args.trace:
        cfg = TileRendererConfig()

        @jax.jit
        def rb8(p, s, r, c, o):
            return jax.vmap(lambda pp, ss, rr, cc, oo: render_tiled(
                pp, ss, rr, cc, oo, cam, config=cfg))(p, s, r, c, o)

        batch = stacked(8, 999)
        jax.block_until_ready(rb8(*batch))
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(rb8(*batch))
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
