"""TRELLIS teacher-data generation driver.

Rebuild of the reference's generator (reference:
scripts/distillation/generate_trellis_data.py:37-363 +
run_trellis_generation.sh): drives a sibling TRELLIS installation as a
subprocess per image, writes per-sample {features.pt, coords.pt,
gaussians.ply}, keeps a failure log, supports --resume, and auto-restarts
the worker on crashes (the reference restarts to flush VRAM leaks).

Availability-gated: without a TRELLIS install the CLI says so and points to
the synthetic teacher (fresnel_tpu.data.trellis.SyntheticTrellisDataset).

Run:  python -m fresnel_tpu.data.generate_trellis_data IMAGES OUT \
          --trellis_dir /path/to/TRELLIS
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

WORKER_TEMPLATE = r"""
import sys, torch
sys.path.insert(0, {trellis_dir!r})
from trellis.pipelines import TrellisImageTo3DPipeline
from PIL import Image

pipe = TrellisImageTo3DPipeline.from_pretrained("JeffreyXiang/TRELLIS-image-large")
pipe.cuda()

for line in sys.stdin:
    line = line.strip()
    if not line:
        continue
    img_path, out_dir = line.split("\t")
    try:
        image = Image.open(img_path)
        out = pipe.run(image, formats=["gaussian"])
        import os
        os.makedirs(out_dir, exist_ok=True)
        torch.save(pipe.last_features.cpu(), out_dir + "/features.pt")
        torch.save(pipe.last_coords.cpu(), out_dir + "/coords.pt")
        out["gaussian"][0].save_ply(out_dir + "/gaussians.ply")
        print("OK " + img_path, flush=True)
    except Exception as e:
        print("FAIL " + img_path + " " + str(e), flush=True)
"""


def generate(images_dir: str, out_dir: str, trellis_dir: str,
             python_bin: str = "python", resume: bool = True,
             max_restarts: int = 10) -> int:
    from fresnel_tpu.data.dataset import IMG_EXTS

    images = sorted(p for p in Path(images_dir).glob("*")
                    if p.suffix.lower() in IMG_EXTS)
    out_root = Path(out_dir)
    out_root.mkdir(parents=True, exist_ok=True)
    fail_log = out_root / "failures.log"

    todo = []
    for p in images:
        sample_dir = out_root / p.stem
        if resume and (sample_dir / "gaussians.ply").exists():
            continue
        todo.append((p, sample_dir))
    if not todo:
        print("nothing to do")
        return 0

    if not Path(trellis_dir).exists():
        print(f"TRELLIS not found at {trellis_dir}.\n"
              f"Install TRELLIS or use the synthetic teacher:\n"
              f"  python -m fresnel_tpu.train.train_direct_decoder --synthetic",
              file=sys.stderr)
        return 1

    worker_script = out_root / "_trellis_worker.py"
    worker_script.write_text(WORKER_TEMPLATE.format(trellis_dir=trellis_dir))

    done = 0
    restarts = 0
    i = 0
    while i < len(todo) and restarts <= max_restarts:
        proc = subprocess.Popen([python_bin, str(worker_script)],
                                stdin=subprocess.PIPE,
                                stdout=subprocess.PIPE, text=True)
        try:
            while i < len(todo):
                img, sample_dir = todo[i]
                proc.stdin.write(f"{img}\t{sample_dir}\n")
                proc.stdin.flush()
                line = proc.stdout.readline()
                if not line:
                    raise RuntimeError("worker died")
                if line.startswith("OK"):
                    done += 1
                else:
                    with open(fail_log, "a") as f:
                        f.write(line)
                i += 1
        except (RuntimeError, BrokenPipeError):
            restarts += 1
            print(f"worker crashed — restart {restarts}/{max_restarts}",
                  file=sys.stderr)
        finally:
            proc.kill()
    print(f"generated {done}/{len(todo)} samples "
          f"({restarts} worker restarts)")
    return 0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("images_dir")
    p.add_argument("out_dir")
    p.add_argument("--trellis_dir", default="../TRELLIS")
    p.add_argument("--python_bin", default="python")
    p.add_argument("--no_resume", action="store_true")
    args = p.parse_args(argv)
    return generate(args.images_dir, args.out_dir, args.trellis_dir,
                    args.python_bin, resume=not args.no_resume)


if __name__ == "__main__":
    sys.exit(main())
