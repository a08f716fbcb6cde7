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
    ap.add_argument("--estimated_depth", action="store_true",
                    help="Estimate depth from the image (gradient/DPT "
                         "estimator, same path as `fresnel refine`) "
                         "instead of using the corpus GT depth — the "
                         "honest no-GT frontier (T-046 caveat)")
    ap.add_argument("--depth_estimator", default="auto")
    args = ap.parse_args()

    from fresnel_tpu.utils.compile_cache import enable_compilation_cache
    from fresnel_tpu.utils.tpu_lock import tpu_lock

    enable_compilation_cache()

    from fresnel_tpu.data.dataset import ImageDataset
    from fresnel_tpu.train.fit_teacher import fit_scene

    ds = ImageDataset(args.data_dir, image_size=args.res,
                      use_augmentation=False, max_images=args.scenes)
    estimator = None
    if args.estimated_depth:
        from fresnel_tpu.models.encoders import create_depth_estimator
        estimator = create_depth_estimator(args.depth_estimator)
        print(f"depth estimator: {estimator.kind}", flush=True)
    cache: dict = {}
    rows = []
    with tpu_lock():
        for steps in args.steps:
            for i in range(min(args.scenes, len(ds))):
                s = ds._samples[i]                 # Sample: image (S, S, 3)
                t0 = time.perf_counter()
                depth = s.depth
                if estimator is not None:
                    # Estimation is timed in: it is part of the no-GT
                    # reconstruction path, exactly like cli.py cmd_refine.
                    depth = np.asarray(estimator(s.image, 256), np.float32)
                _, m = fit_scene(
                    np.transpose(s.image, (2, 0, 1)),
                    depth, steps=steps, res=args.res,
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
