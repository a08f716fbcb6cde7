"""Stage isolation for the search-binning path at large N.

Each stage returns its full materialized output (device-resident) so XLA
cannot simplify the work away; stage cost = difference between cumulative
timings.

Run:  python -u experiments/profile_search_binning.py --n 1000000
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

    import jax
    import jax.numpy as jnp

    from fresnel_tpu.core.camera import Camera
    from fresnel_tpu.core.gaussians import GaussianCloud
    from fresnel_tpu.render.projection import (
        depth_sort_indices, project_gaussians)

    ts = 16
    ntx = nty = args.res // ts
    T = ntx * nty
    M = 256
    cap = M + 1
    c = 256

    cam = Camera.default_training(args.res)
    clouds = [GaussianCloud.test_cloud(args.n, seed=i, spread=0.8,
                                       z_offset=-2.0, scale=0.02)
              for i in range(3)]

    def sorted_proj(p_, s_, r_, o_):
        proj = project_gaussians(p_, s_, r_, cam, max_radius=32.0)
        proj = dataclasses.replace(proj, visible=proj.visible & (o_ > 0.0))
        order = depth_sort_indices(proj)
        return proj.means2d[order], proj.radii[order], proj.visible[order]

    def intervals(m2, rad, vis):
        u, v, r = m2[:, 0], m2[:, 1], rad
        tsf = float(ts)
        cxlo = jnp.floor((u - r) / tsf).astype(jnp.int32)
        cxhi = jnp.floor((u + r) / tsf).astype(jnp.int32)
        cylo = jnp.floor((v - r) / tsf).astype(jnp.int32)
        cyhi = jnp.floor((v + r) / tsf).astype(jnp.int32)
        return cxlo, cxhi, cylo, cyhi, vis

    n2 = -(-args.n // c) * c
    nch = n2 // c

    def build_hb(m2, rad, vis):
        cxlo, cxhi, cylo, cyhi, vis = intervals(m2, rad, vis)
        pad = n2 - args.n
        if pad:
            cxlo = jnp.pad(cxlo, (0, pad))
            cxhi = jnp.pad(cxhi, (0, pad), constant_values=-1)
            cylo = jnp.pad(cylo, (0, pad))
            cyhi = jnp.pad(cyhi, (0, pad), constant_values=-1)
            vis = jnp.pad(vis, (0, pad))
        ax = jnp.arange(ntx, dtype=jnp.int32)
        ay = jnp.arange(nty, dtype=jnp.int32)
        hx = (ax[None] >= cxlo[:, None]) & (ax[None] <= cxhi[:, None])
        hy = ((ay[None] >= cylo[:, None]) & (ay[None] <= cyhi[:, None])
              & vis[:, None])
        hit = (hy[:, :, None] & hx[:, None, :]).reshape(n2, T)
        return hit.reshape(nch, c, T).astype(jnp.bfloat16)

    def build_C(m2, rad, vis):
        hb = build_hb(m2, rad, vis)
        L = jnp.tril(jnp.ones((c, c), jnp.bfloat16))
        C_in = jnp.einsum("ij,njt->nit", L, hb,
                          preferred_element_type=jnp.bfloat16)
        totals = C_in[:, -1, :].astype(jnp.int32)
        base = jnp.cumsum(totals, axis=0) - totals
        C = jnp.minimum(C_in.astype(jnp.int32) + base[:, None, :], cap)
        return C.astype(jnp.int16).reshape(n2, T)

    def build_Ct(m2, rad, vis):
        return build_C(m2, rad, vis).T

    def search(m2, rad, vis):
        Ct = build_Ct(m2, rad, vis)
        target = (jnp.arange(M, dtype=jnp.int32) + 1)[None, :]
        lo = jnp.zeros((T, M), jnp.int32)
        hi = jnp.full((T, M), n2, jnp.int32)
        for _ in range(max(1, n2.bit_length())):
            mid = (lo + hi) >> 1
            val = jnp.take_along_axis(Ct, jnp.minimum(mid, n2 - 1), axis=1)
            ge = val.astype(jnp.int32) >= target
            hi = jnp.where(ge, mid, hi)
            lo = jnp.where(ge, lo, mid + 1)
        return hi

    stages = [
        ("proj+sort", jax.jit(sorted_proj)),
        ("..+hb", jax.jit(lambda p, s, r, o: build_hb(*sorted_proj(p, s, r, o)))),
        ("..+C", jax.jit(lambda p, s, r, o: build_C(*sorted_proj(p, s, r, o)))),
        ("..+transpose", jax.jit(lambda p, s, r, o: build_Ct(*sorted_proj(p, s, r, o)))),
        ("..+search", jax.jit(lambda p, s, r, o: search(*sorted_proj(p, s, r, o)))),
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
        print(f"{name:14s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
