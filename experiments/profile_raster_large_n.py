"""Stage-by-stage profile of the tiled rasterizer at large N.

Times (a) projection + depth sort, (b) + binning, (c) + packed gather,
(d) full forward, at a given Gaussian count, to locate the linear-in-N
bottleneck seen in bench_raster_scaling.py.

Run:  python -u experiments/profile_raster_large_n.py --n 500000
"""

import argparse
import dataclasses
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=500_000)
    p.add_argument("--res", type=int, default=512)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from fresnel_tpu.core.camera import Camera
    from fresnel_tpu.core.gaussians import GaussianCloud
    from fresnel_tpu.render.projection import (
        depth_sort_indices, project_gaussians)
    from fresnel_tpu.render.tile import (
        TileRendererConfig, _bin_gaussians, render_tiled)

    cam = Camera.default_training(args.res)
    cfg = TileRendererConfig()
    ts = cfg.tile_size
    ntx = -(-args.res // ts)
    nty = -(-args.res // ts)
    eff_r = min(cfg.max_radius, (cfg.tile_window // 2) * ts)

    clouds = [GaussianCloud.test_cloud(args.n, seed=i, spread=0.8,
                                       z_offset=-2.0, scale=0.02)
              for i in range(4)]

    @jax.jit
    def stage_a(p_, s_, r_, o_):
        proj = project_gaussians(p_, s_, r_, cam, max_radius=eff_r)
        proj = dataclasses.replace(proj, visible=proj.visible & (o_ > 0.0))
        order = depth_sort_indices(proj)
        return (proj.means2d[order], proj.radii[order], proj.visible[order])

    @jax.jit
    def stage_b(p_, s_, r_, o_):
        m2, rad, vis = stage_a(p_, s_, r_, o_)
        ti, tv = _bin_gaussians(m2, rad, vis, ntx, nty, ts, 256,
                                tile_window=cfg.tile_window)
        return ti.sum(), tv.sum()

    @jax.jit
    def full(p_, s_, r_, c_, o_):
        return jnp.sum(render_tiled(p_, s_, r_, c_, o_, cam, config=cfg))

    def timeit(name, fn, use_colors=False):
        def call(c):
            if use_colors:
                return fn(c.positions, c.scales, c.rotations, c.colors,
                          c.opacities)
            return fn(c.positions, c.scales, c.rotations, c.opacities)

        out = call(clouds[0])
        jax.block_until_ready(out)
        outs = []
        t0 = time.perf_counter()
        for i in range(args.iters):
            outs.append(call(clouds[i % len(clouds)]))
        jax.block_until_ready(outs)
        ms = (time.perf_counter() - t0) / args.iters * 1000.0
        print(f"{name:24s} {ms:8.2f} ms", flush=True)
        return ms

    timeit("project+sort", stage_a)
    timeit("project+sort+bin", stage_b)
    timeit("full forward", full, use_colors=True)


if __name__ == "__main__":
    main()
