"""Rasterizer scaling benchmark: forward (+ backward) latency vs Gaussian
count on the real TPU.

The reference viewer handles 500k default / 5M max Gaussians through a
global sort + per-pixel full-list loop (reference: src/core/renderer/
renderer.hpp:133-134, renderer.cpp:201-282).  This measures our tile-binned
renderer across that range to find where the binning data structures stop
scaling.

Run:  python -u experiments/bench_raster_scaling.py [--grad] [--res 512]
"""

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=512)
    p.add_argument("--grad", action="store_true")
    p.add_argument("--sizes", type=int, nargs="*",
                   default=[20_000, 50_000, 100_000, 200_000, 500_000])
    p.add_argument("--max_per_tile", type=int, default=256)
    p.add_argument("--window", type=int, default=5,
                   help="binning tile window (3 clamps radii to 16 px)")
    p.add_argument("--backend", default="auto")
    p.add_argument("--binning", default="auto")
    p.add_argument("--depth_sort", default="auto")
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from fresnel_tpu.core.camera import Camera
    from fresnel_tpu.core.gaussians import GaussianCloud
    from fresnel_tpu.render.tile import TileRendererConfig, render_tiled

    cam = Camera.default_training(args.res)
    cfg = TileRendererConfig(max_per_tile=args.max_per_tile,
                             tile_window=args.window, backend=args.backend,
                             binning=args.binning, depth_sort=args.depth_sort)

    def fwd(p_, s_, r_, c_, o_):
        return jnp.sum(render_tiled(p_, s_, r_, c_, o_, cam, config=cfg))

    grad_fn = jax.jit(jax.grad(fwd, argnums=(0, 1, 2, 3, 4)))
    fwd_fn = jax.jit(fwd)

    for n in args.sizes:
        # Distinct clouds per iteration (the TPU runtime caches identical
        # executions).
        clouds = [GaussianCloud.test_cloud(n, seed=i, spread=0.8,
                                           z_offset=-2.0, scale=0.02)
                  for i in range(4)]
        f = grad_fn if args.grad else fwd_fn

        def run(c):
            return f(c.positions, c.scales, c.rotations, c.colors,
                     c.opacities)

        try:
            t0 = time.perf_counter()
            out = run(clouds[0])
            jax.block_until_ready(out)
            compile_s = time.perf_counter() - t0

            outs = []
            t0 = time.perf_counter()
            for i in range(args.iters):
                outs.append(run(clouds[i % len(clouds)]))
            jax.block_until_ready(outs)
            ms = (time.perf_counter() - t0) / args.iters * 1000.0
            print(f"N={n:>9,}  {'fwd+bwd' if args.grad else 'fwd'}: "
                  f"{ms:8.2f} ms   (compile {compile_s:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — report OOM/compile failures
            print(f"N={n:>9,}  FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
