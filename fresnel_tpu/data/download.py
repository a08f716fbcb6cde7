"""Training-data download (HuggingFace streaming).

Rebuild of the reference downloader (reference:
scripts/preprocessing/download_training_data.py): streams LPFF/FFHQ/CelebA
images from the HuggingFace hub.  Network-gated: offline environments (TPU
pods with zero egress) get a clear message instead of a stack trace.

Run:  python -m fresnel_tpu.data.download --dataset lpff --count 500 --out images
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

DATASETS = {
    "lpff": ("nuwandaa/lpff", "image"),
    "ffhq": ("Dmini/FFHQ-64x64", "image"),
    "celeba": ("nielsr/CelebA-faces", "image"),
}


def download(dataset: str, count: int, out_dir: str) -> int:
    try:
        from datasets import load_dataset
    except ImportError:
        print("`datasets` package unavailable — install it or provide images "
              "manually in the data dir", file=sys.stderr)
        return 0
    name, column = DATASETS[dataset]
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    try:
        ds = load_dataset(name, split="train", streaming=True)
    except Exception as e:
        print(f"download unavailable (offline environment?): {e}",
              file=sys.stderr)
        print("fallback: use --synthetic training or place images in the "
              "data dir manually", file=sys.stderr)
        return 0
    n = 0
    for sample in ds:
        img = sample[column]
        img.convert("RGB").save(out / f"{dataset}_{n:05d}.png")
        n += 1
        if n >= count:
            break
    print(f"downloaded {n} images to {out}")
    return n


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", choices=list(DATASETS), default="lpff")
    p.add_argument("--count", type=int, default=500)
    p.add_argument("--out", default="images")
    args = p.parse_args(argv)
    download(args.dataset, args.count, args.out)


if __name__ == "__main__":
    main()
