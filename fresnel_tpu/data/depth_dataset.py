"""Depth datasets (folder pseudo-labels + synthetic) and pseudo-label
generation.

Rebuild of the reference's depth-side-quest tooling (reference:
scripts/utils/depth_dataset.py and preprocessing/generate_pseudo_labels.py):
folder datasets of (image, depth) pairs with augmentation, a synthetic
depth dataset (procedural shapes), and pseudo-depth generation for image
folders.  The torch-hub Depth-Anything teacher is replaced by this
framework's depth estimators (a learned model when weights are available,
the gradient estimator otherwise).
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Dict, Iterator, Optional

import numpy as np

from fresnel_tpu.data.dataset import IMG_EXTS, _load_image, color_jitter


def generate_pseudo_labels(image_dir: str, out_dir: Optional[str] = None,
                           depth_size: int = 256,
                           estimator: str = "gradient") -> int:
    """Write {name}_pseudo_depth.bin float32 maps for every image."""
    import jax.numpy as jnp
    from fresnel_tpu.models.encoders import create_depth_estimator

    est = create_depth_estimator(estimator)
    root = Path(image_dir)
    out = Path(out_dir) if out_dir else root
    out.mkdir(parents=True, exist_ok=True)
    n = 0
    for p in sorted(root.glob("*")):
        if p.suffix.lower() not in IMG_EXTS:
            continue
        img = jnp.asarray(_load_image(p, 512))
        depth = np.asarray(est(img, depth_size), np.float32)
        depth.tofile(out / f"{p.stem}_pseudo_depth.bin")
        n += 1
    return n


class FolderDepthDataset:
    """(image, depth) pairs from a folder: images plus {name}_depth.bin or
    {name}_pseudo_depth.bin float32 maps."""

    def __init__(self, data_dir: str, image_size: int = 256,
                 augment: bool = True):
        self.image_size = image_size
        self.augment = augment
        root = Path(data_dir)
        self._items = []
        for p in sorted(root.glob("*")):
            if p.suffix.lower() not in IMG_EXTS:
                continue
            for cand in (root / f"{p.stem}_depth.bin",
                         root / f"{p.stem}_pseudo_depth.bin"):
                if cand.exists():
                    self._items.append((p, cand))
                    break
        if not self._items:
            raise FileNotFoundError(f"no (image, depth) pairs in {data_dir}")

    def __len__(self):
        return len(self._items)

    def batches(self, batch_size: int, rng: np.random.Generator,
                shuffle: bool = True) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self._items))
        if shuffle:
            rng.shuffle(order)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            imgs, depths = [], []
            for j in order[i : i + batch_size]:
                ip, dp = self._items[j]
                img = _load_image(ip, self.image_size)
                if self.augment:
                    img = color_jitter(rng, img)
                d = np.fromfile(dp, np.float32)
                side = int(round(len(d) ** 0.5))
                depths.append(d.reshape(side, side))
                imgs.append(np.transpose(img, (2, 0, 1)))
            yield {"image": np.stack(imgs), "depth": np.stack(depths)}


class SyntheticDepthDataset:
    """Procedural (image, depth) pairs: colored spheres/boxes on gradients."""

    def __init__(self, n_samples: int = 32, image_size: int = 128,
                 seed: int = 0):
        rng = np.random.default_rng(seed)
        self._items = []
        S = image_size
        yy, xx = np.mgrid[0:S, 0:S].astype(np.float32) / S
        for _ in range(n_samples):
            depth = np.full((S, S), 0.9, np.float32)
            img = np.full((S, S, 3), 0.1, np.float32)
            for _ in range(rng.integers(2, 6)):
                cx, cy = rng.uniform(0.2, 0.8, 2)
                r = rng.uniform(0.08, 0.25)
                z = rng.uniform(0.1, 0.7)
                col = rng.uniform(0.3, 1.0, 3)
                dist = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
                inside = dist < r
                closer = inside & (z < depth)
                depth[closer] = z + (dist[closer] / r) * 0.1  # sphere bulge
                img[closer] = col * (1 - dist[closer, None] / r * 0.5)
            self._items.append((img, depth))

    def __len__(self):
        return len(self._items)

    def batches(self, batch_size: int, rng: np.random.Generator,
                shuffle: bool = True) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self._items))
        if shuffle:
            rng.shuffle(order)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            imgs = [np.transpose(self._items[j][0], (2, 0, 1))
                    for j in order[i : i + batch_size]]
            depths = [self._items[j][1] for j in order[i : i + batch_size]]
            yield {"image": np.stack(imgs), "depth": np.stack(depths)}


def main(argv=None):
    p = argparse.ArgumentParser(description="Generate pseudo depth labels")
    p.add_argument("image_dir")
    p.add_argument("--out_dir", default=None)
    p.add_argument("--depth_size", type=int, default=256)
    p.add_argument("--estimator", default="gradient",
                   choices=["gradient", "center", "auto"])
    args = p.parse_args(argv)
    n = generate_pseudo_labels(args.image_dir, args.out_dir, args.depth_size,
                               args.estimator)
    print(f"generated {n} pseudo-depth labels")


if __name__ == "__main__":
    main()
