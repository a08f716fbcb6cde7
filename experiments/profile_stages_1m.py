"""Stage isolation for the current (two-level search) rasterizer at large N.

Successor to profile_search_binning.py, matched to the post-T-013 code:
calls the REAL library functions per stage so drift between the profile
and the implementation is impossible.  Stage cost = difference between
cumulative timings (each stage returns materialized device output).

Run:  python -u experiments/profile_stages_1m.py --n 1000000
"""

import argparse
import dataclasses
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    from fresnel_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from fresnel_tpu.core.camera import Camera
    from fresnel_tpu.core.gaussians import GaussianCloud
    from fresnel_tpu.render.projection import (
        depth_sort_indices, project_gaussians)
    from fresnel_tpu.render import tile as T

    ts = 16
    ntx = nty = args.res // ts
    M = 256

    cam = Camera.default_training(args.res)
    clouds = [GaussianCloud.test_cloud(args.n, seed=i, spread=0.8,
                                       z_offset=-2.0, scale=0.02)
              for i in range(3)]

    def proj_only(p_, s_, r_, o_):
        proj = project_gaussians(p_, s_, r_, cam, max_radius=32.0)
        return dataclasses.replace(
            proj, visible=proj.visible & (o_ > 0.0))

    def sorted_proj(p_, s_, r_, o_):
        proj = proj_only(p_, s_, r_, o_)
        order = depth_sort_indices(proj)
        return proj.means2d[order], proj.radii[order], proj.visible[order]

    def binned(p_, s_, r_, o_):
        m2, rad, vis = sorted_proj(p_, s_, r_, o_)
        return T._bin_gaussians_search(m2, rad, vis, ntx, nty, ts, M)

    def full(p_, s_, r_, o_):
        from fresnel_tpu.render.tile import render_tiled
        return render_tiled(p_, s_, r_, clouds[0].colors[:args.n],
                            o_, cam)

    stages = [
        ("projection", jax.jit(proj_only)),
        ("..+sort+gather", jax.jit(sorted_proj)),
        ("..+binning", jax.jit(binned)),
        ("full forward", jax.jit(lambda p, s, r, o: T.render_tiled(
            p, s, r, clouds[0].colors, o, cam))),
    ]
    for name, fn in stages:
        def call(cl):
            return fn(cl.positions, cl.scales, cl.rotations, cl.opacities)

        out = call(clouds[0])
        jax.block_until_ready(out)
        outs = []
        t0 = time.perf_counter()
        for i in range(args.iters):
            outs.append(call(clouds[i % len(clouds)]))
        jax.block_until_ready(outs)
        ms = (time.perf_counter() - t0) / args.iters * 1000.0
        del outs
        print(f"{name:16s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
