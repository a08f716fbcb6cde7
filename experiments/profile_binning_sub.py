"""Sub-stage isolation for search binning at large N (round-2 item #3).

Measures, on identical sorted/projected inputs:
  a) hit-mask + in-chunk cumsum einsum, (nch, c, T) layout (current)
  b) a) + the (T, N2) transpose (current full table build)
  c) einsum emitting the TRANSPOSED layout directly ("ij,njt->tni")
  d) full _bin_gaussians_search (build + two-level search) for reference

Run:  python -u experiments/profile_binning_sub.py --n 1000000
"""

import argparse
import dataclasses
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    from fresnel_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from fresnel_tpu.core.camera import Camera
    from fresnel_tpu.core.gaussians import GaussianCloud
    from fresnel_tpu.render import tile as T
    from fresnel_tpu.render.projection import (
        depth_sort_indices, project_gaussians)

    ts = 16
    ntx = nty = args.res // ts
    Ttiles = ntx * nty
    M = 256
    c = 256
    cam = Camera.default_training(args.res)
    clouds = [GaussianCloud.test_cloud(args.n, seed=i, spread=0.8,
                                       z_offset=-2.0, scale=0.02)
              for i in range(3)]

    def masks(p_, s_, r_, o_):
        proj = project_gaussians(p_, s_, r_, cam, max_radius=32.0)
        proj = dataclasses.replace(proj, visible=proj.visible & (o_ > 0.0))
        order = depth_sort_indices(proj)
        m2, rad, vis = (proj.means2d[order], proj.radii[order],
                        proj.visible[order])
        u, v, r = m2[:, 0], m2[:, 1], rad
        cxlo = jnp.floor((u - r) / ts).astype(jnp.int32)
        cxhi = jnp.floor((u + r) / ts).astype(jnp.int32)
        cylo = jnp.floor((v - r) / ts).astype(jnp.int32)
        cyhi = jnp.floor((v + r) / ts).astype(jnp.int32)
        n2 = -(-args.n // c) * c
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
        return hx, hy, m2, rad, vis

    n2 = -(-args.n // c) * c
    nch = n2 // c
    L = jnp.tril(jnp.ones((c, c), jnp.bfloat16))

    def build_a(p_, s_, r_, o_):
        hx, hy, *_ = masks(p_, s_, r_, o_)
        hit = (hy[:, :, None] & hx[:, None, :]).reshape(n2, Ttiles)
        hb = hit.reshape(nch, c, Ttiles).astype(jnp.bfloat16)
        C_in = jnp.einsum("ij,njt->nit", L, hb,
                          preferred_element_type=jnp.bfloat16)
        return C_in

    def build_b(p_, s_, r_, o_):
        C_in = build_a(p_, s_, r_, o_)
        totals = C_in[:, -1, :].astype(jnp.int32)
        cumtot_t = jnp.cumsum(totals, axis=0).T
        Cin_t = C_in.reshape(n2, Ttiles).T
        return Cin_t, cumtot_t

    def build_c(p_, s_, r_, o_):
        hx, hy, *_ = masks(p_, s_, r_, o_)
        hit = (hy[:, :, None] & hx[:, None, :]).reshape(n2, Ttiles)
        hb = hit.reshape(nch, c, Ttiles).astype(jnp.bfloat16)
        Cin_t = jnp.einsum("ij,njt->tni", L, hb,
                           preferred_element_type=jnp.bfloat16
                           ).reshape(Ttiles, n2)
        totals = Cin_t.reshape(Ttiles, nch, c)[:, :, -1].astype(jnp.int32)
        cumtot_t = jnp.cumsum(totals, axis=1)
        return Cin_t, cumtot_t

    def full_d(p_, s_, r_, o_):
        hx, hy, m2, rad, vis = masks(p_, s_, r_, o_)
        return T._bin_gaussians_search(m2, rad, vis, ntx, nty, ts, M)

    def search_c(p_, s_, r_, o_):
        Cin_t, cumtot_t = build_c(p_, s_, r_, o_)
        return T._two_level_search(Cin_t, cumtot_t, M)

    variants = [("a: einsum (nch,c,T)", build_a),
                ("b: a + transpose(T,N2)", build_b),
                ("c: einsum ->tni direct", build_c),
                ("d: full search (current)", full_d),
                ("e: build_c + search", search_c)]
    for name, fn in variants:
        f = jax.jit(fn)
        for cl in clouds:
            jax.block_until_ready(f(cl.positions, cl.scales, cl.rotations,
                                    cl.opacities))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            for cl in clouds:
                jax.block_until_ready(f(cl.positions, cl.scales,
                                        cl.rotations, cl.opacities))
        dt = (time.perf_counter() - t0) / (args.iters * len(clouds)) * 1e3
        print(f"{name:28s} {dt:8.2f} ms")

    # parity: c-search must equal current
    cl = clouds[0]
    ti1, tv1 = jax.jit(full_d)(cl.positions, cl.scales, cl.rotations,
                               cl.opacities)
    ti2, tv2 = jax.jit(search_c)(cl.positions, cl.scales, cl.rotations,
                                 cl.opacities)
    import numpy as np
    print("tables identical:",
          bool((np.asarray(ti1) == np.asarray(ti2)).all()
               and (np.asarray(tv1) == np.asarray(tv2)).all()))


if __name__ == "__main__":
    main()
