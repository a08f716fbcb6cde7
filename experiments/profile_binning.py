"""Micro-profile of _bin_gaussians substages at large N.

Times, at a given N and 512² (32x32 tiles):
  masks     — separable interval masks + (T, N) hit matrix build
  +cumsum   — hit matrix + per-tile rank cumsum
  +gather   — + the (N, K) pair rank gather
  full      — the real _bin_gaussians (adds the scatter)

Run:  python -u experiments/profile_binning.py --n 500000
"""

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--window", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fresnel_tpu.core.camera import Camera
    from fresnel_tpu.core.gaussians import GaussianCloud
    from fresnel_tpu.render.projection import (
        depth_sort_indices, project_gaussians)
    from fresnel_tpu.render.tile import _bin_gaussians

    ts = 16
    ntx = nty = args.res // ts
    T = ntx * nty
    M = 256
    half = args.window // 2

    cam = Camera.default_training(args.res)

    def prep(seed):
        c = GaussianCloud.test_cloud(args.n, seed=seed, spread=0.8,
                                     z_offset=-2.0, scale=0.02)
        proj = project_gaussians(c.positions, c.scales, c.rotations, cam,
                                 max_radius=half * ts)
        order = depth_sort_indices(proj)
        return (jax.device_put(proj.means2d[order]),
                jax.device_put(proj.radii[order]),
                jax.device_put(proj.visible[order]))

    inputs = [prep(i) for i in range(4)]

    def masks_and_hit(means2d, radii, visible):
        u, v, r = means2d[:, 0], means2d[:, 1], radii
        cxlo = jnp.floor((u - r) / ts).astype(jnp.int32)
        cxhi = jnp.floor((u + r) / ts).astype(jnp.int32)
        cylo = jnp.floor((v - r) / ts).astype(jnp.int32)
        cyhi = jnp.floor((v + r) / ts).astype(jnp.int32)
        ax = jnp.arange(ntx, dtype=jnp.int32)
        ay = jnp.arange(nty, dtype=jnp.int32)
        hx = (ax[:, None] >= cxlo[None]) & (ax[:, None] <= cxhi[None])
        hy = ((ay[:, None] >= cylo[None]) & (ay[:, None] <= cyhi[None])
              & visible[None, :])
        return (hy[:, None, :] & hx[None, :, :]).reshape(T, args.n)

    @jax.jit
    def stage_masks(m, r, v):
        return jnp.sum(masks_and_hit(m, r, v))

    @jax.jit
    def stage_cumsum(m, r, v):
        hit = masks_and_hit(m, r, v)
        C = jnp.cumsum(hit, axis=1, dtype=jnp.int32)
        return C[:, -1].sum()

    @jax.jit
    def stage_gather(m, r, v):
        hit = masks_and_hit(m, r, v)
        C = jnp.cumsum(hit, axis=1, dtype=jnp.int32)
        u, vv = m[:, 0], m[:, 1]
        K = args.window * args.window
        offs = jnp.arange(args.window, dtype=jnp.int32) - half
        oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
        ox, oy = ox.reshape(-1), oy.reshape(-1)
        cx = jnp.clip((u // ts).astype(jnp.int32), 0, ntx - 1)
        cy = jnp.clip((vv // ts).astype(jnp.int32), 0, nty - 1)
        txp = cx[:, None] + ox[None]
        typ = cy[:, None] + oy[None]
        inb = (txp >= 0) & (txp < ntx) & (typ >= 0) & (typ < nty)
        t_lin = jnp.where(inb, typ * ntx + txp, 0)
        j_idx = jnp.broadcast_to(
            jnp.arange(args.n, dtype=jnp.int32)[:, None], (args.n, K))
        return C[t_lin, j_idx].sum()

    @jax.jit
    def stage_full(m, r, v):
        ti, tv = _bin_gaussians(m, r, v, ntx, nty, ts, M,
                                tile_window=args.window)
        return ti.sum() + tv.sum()

    for name, fn in [("masks+hit", stage_masks), ("+cumsum", stage_cumsum),
                     ("+gather", stage_gather), ("full binning", stage_full)]:
        out = fn(*inputs[0])
        jax.block_until_ready(out)
        outs = []
        t0 = time.perf_counter()
        for i in range(args.iters):
            outs.append(fn(*inputs[i % len(inputs)]))
        jax.block_until_ready(outs)
        ms = (time.perf_counter() - t0) / args.iters * 1000.0
        print(f"{name:16s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
