"""Stream-vs-search binning benchmark at large N (round-3 item #3).

Measures _bin_gaussians_search and bin_gaussians_stream on identical
sorted/projected inputs, one timed call per DISTINCT input (the axon
runtime caches repeated identical executions), plus the full render_tiled
forward for the headline table.

Run:  python -u experiments/bench_stream_binning.py --n 1000000
      python -u experiments/bench_stream_binning.py --n 5000000 --full
"""

import argparse
import dataclasses
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--full", action="store_true",
                    help="also time the full render_tiled forward with "
                         "each binning mode")
    ap.add_argument("--sweep", action="store_true",
                    help="sweep stream kernel constants")
    args = ap.parse_args()

    from fresnel_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from fresnel_tpu.core.camera import Camera
    from fresnel_tpu.core.gaussians import GaussianCloud
    from fresnel_tpu.render.pallas_stream_binning import bin_gaussians_stream
    from fresnel_tpu.render.projection import (depth_sort_indices,
                                               project_gaussians)
    from fresnel_tpu.render.tile import (TileRendererConfig,
                                         _bin_gaussians_search, render_tiled)

    ts = 16
    ntx = nty = args.res // ts
    M = 256
    cam = Camera.default_training(args.res)

    def make(seed):
        cloud = GaussianCloud.test_cloud(args.n, seed=seed, spread=0.8,
                                         z_offset=-2.0, scale=0.02)
        proj = project_gaussians(cloud.positions, cloud.scales,
                                 cloud.rotations, cam, max_radius=32.0)
        proj = dataclasses.replace(
            proj, visible=proj.visible & (cloud.opacities > 0.0))
        order = depth_sort_indices(proj)
        return (proj.means2d[order], proj.radii[order], proj.visible[order],
                cloud)

    inputs = [make(s) for s in range(args.iters + 1)]

    def sink(out):
        # block_until_ready on the axon backend returns before the freshly
        # dispatched execution completes (it lags one call behind); forcing
        # a SCALAR host read is the only reliable completion barrier.
        arr = out[0] if isinstance(out, tuple) else out
        return float(jnp.sum(arr.astype(jnp.float32)))

    def timed(name, fn):
        sink(fn(inputs[-1]))      # compile on the holdout
        times = []
        for a in inputs[:-1]:
            t0 = time.perf_counter()
            sink(fn(a))
            times.append(round((time.perf_counter() - t0) * 1e3, 1))
        med = sorted(times)[len(times) // 2]
        print(f"  {name:28s} median {med:7.1f} ms  {times}")
        return med

    print(f"== binning only, N={args.n} @{args.res}², M={M} ==")
    timed("search", lambda a: _bin_gaussians_search(
        a[0], a[1], a[2], ntx, nty, ts, M))
    timed("stream (tuned defaults)", lambda a: bin_gaussians_stream(
        a[0], a[1], a[2], ntx, nty, ts, M))
    if args.sweep:
        for tb in (16, 32, 64):
            for cpc in (8, 16, 32):
                timed(f"stream tb={tb} cpc={cpc}",
                      lambda a, tb=tb, cpc=cpc: bin_gaussians_stream(
                          a[0], a[1], a[2], ntx, nty, ts, M,
                          tile_block=tb, cpc=cpc))

    if args.full:
        print(f"== full forward, N={args.n} @{args.res}² ==")
        for mode in ("search", "stream"):
            cfg = TileRendererConfig(binning=mode)

            def fwd(a, cfg=cfg):
                c = a[3]
                return render_tiled(c.positions, c.scales, c.rotations,
                                    c.colors, c.opacities, cam, config=cfg)

            timed(f"forward [{mode}]", fwd)


if __name__ == "__main__":
    main()
