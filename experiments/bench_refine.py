"""`fresnel refine` on the real TPU: quality-vs-wall-clock frontier.

The reference's END-TO-END image->3D path costs ~2 s for a feedforward
result (README.md:207).  Per-scene test-time optimization through our
differentiable tiled rasterizer reaches the representation ceiling
(T-023, SSIM ~0.985) — this measures how much wall-clock that costs on
one v5e chip, step-batched so dispatch overhead doesn't pollute the
numbers (the axon runtime caches identical executions; every step has
distinct params so the loop is cache-proof by construction).

Run:  python -u experiments/bench_refine.py [--scenes 4] [--res 256]
Prints one line per (steps, scene): wall ms + SSIM/PSNR, then a summary.
"""

import argparse
import json
import time
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="data/corpus_v1")
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--steps", type=int, nargs="*",
                    default=[100, 200, 400, 800])
    ap.add_argument("--out_json", default="results/bench_refine.json")
    args = ap.parse_args()

    from fresnel_tpu.utils.compile_cache import enable_compilation_cache
    from fresnel_tpu.utils.tpu_lock import tpu_lock

    enable_compilation_cache()

    from fresnel_tpu.data.dataset import ImageDataset
    from fresnel_tpu.train.fit_teacher import fit_scene

    ds = ImageDataset(args.data_dir, image_size=args.res,
                      use_augmentation=False, max_images=args.scenes)
    cache: dict = {}
    rows = []
    with tpu_lock():
        for steps in args.steps:
            for i in range(min(args.scenes, len(ds))):
                s = ds._samples[i]                 # Sample: image (S, S, 3)
                t0 = time.perf_counter()
                _, m = fit_scene(
                    np.transpose(s.image, (2, 0, 1)),
                    s.depth, steps=steps, res=args.res,
                    depth_offset_init=-0.13, step_fn_cache=cache)
                ms = (time.perf_counter() - t0) * 1000
                rows.append({"steps": steps, "scene": i, "ms": round(ms, 1),
                             "ssim": round(m["ssim"], 4),
                             "psnr": round(m["psnr"], 2)})
                print(rows[-1], flush=True)

    summary = {}
    for steps in args.steps:
        rs = [r for r in rows if r["steps"] == steps]
        # First fit per step-count pays compile; report the warm median.
        warm = rs[1:] if len(rs) > 1 else rs
        summary[str(steps)] = {
            "median_ms": float(np.median([r["ms"] for r in warm])),
            "mean_ssim": float(np.mean([r["ssim"] for r in rs])),
            "mean_psnr": float(np.mean([r["psnr"] for r in rs])),
        }
    out = {"rows": rows, "summary": summary, "res": args.res}
    Path(args.out_json).write_text(json.dumps(out, indent=2))
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
