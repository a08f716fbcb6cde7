"""Preprocessing: image dir -> cached feature/depth files.

TPU rebuild of the reference preprocessing CLI (reference:
scripts/preprocessing/preprocess_training_data.py): DINOv2 features cached as
{name}_dinov2[suffix].bin raw float32 (37,37,C) and depth as
{name}_depth.bin raw float32 (256,256) — identical cache contract, so caches
are interchangeable between the two systems.  The ONNX sessions collapse into
jit-compiled extractors; rembg background removal is availability-gated like
the reference (:82-169).

Run:  python -m fresnel_tpu.data.preprocess IMAGES_DIR [--feature_dim 384]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

from fresnel_tpu.data.dataset import IMG_EXTS, _DIM_SUFFIX, _load_image


def remove_background(img: np.ndarray) -> np.ndarray:
    """Optional u2net background removal (gated on rembg availability)."""
    try:
        from rembg import remove
        from PIL import Image

        out = remove(Image.fromarray((img * 255).astype(np.uint8)))
        rgba = np.asarray(out, np.float32) / 255.0
        alpha = rgba[..., 3:4]
        return rgba[..., :3] * alpha + (1 - alpha)  # white background
    except ImportError:
        print("rembg unavailable — skipping background removal",
              file=sys.stderr)
        return img


def preprocess_dataset(data_dir: str, image_size: int = 518,
                       feature_dim: int = 384, depth_size: int = 256,
                       use_rembg: bool = False, overwrite: bool = False,
                       vlm_density: bool = False) -> int:
    import jax.numpy as jnp

    from fresnel_tpu.models.encoders import (
        create_depth_estimator, create_feature_extractor)

    extractor = create_feature_extractor(dim=feature_dim)
    estimator = create_depth_estimator("auto")
    for name, obj in (("features", extractor), ("depth", estimator)):
        print(f"{name}: {obj.kind}"
              + (f" ({obj.weights_path})" if obj.weights_path
                 else " (procedural fallback — no weights found)"))
    suffix = _DIM_SUFFIX.get(feature_dim, f"_{feature_dim}")
    root = Path(data_dir)
    paths = sorted(p for p in root.glob("*") if p.suffix.lower() in IMG_EXTS)
    done = 0
    vlm_client = None
    if vlm_density:
        from fresnel_tpu.utils.vlm_guidance import VLMGuidance
        vlm_client = VLMGuidance()
        if not vlm_client.is_available():
            print("VLM endpoint unavailable — skipping density maps",
                  file=sys.stderr)
            vlm_client = None

    for p in paths:
        feat_path = root / f"{p.stem}_dinov2{suffix}.bin"
        depth_path = root / f"{p.stem}_depth.bin"
        if feat_path.exists() and depth_path.exists() and not overwrite:
            continue
        img = _load_image(p, image_size)
        if use_rembg:
            img = remove_background(img)
        jimg = jnp.asarray(img)
        feats = np.asarray(extractor(jimg), np.float32)
        depth = np.asarray(estimator(jimg, depth_size), np.float32)
        feats.tofile(feat_path)
        depth.tofile(depth_path)
        if vlm_client is not None:
            dens = vlm_client.get_density_grid(p)
            if dens is not None:
                np.save(root / f"{p.stem}_vlm_density.npy", dens)
        done += 1
        print(f"  {p.name}: features {feats.shape} depth {depth.shape}")
    return done


def main(argv=None):
    p = argparse.ArgumentParser(description="Preprocess training images")
    p.add_argument("data_dir")
    p.add_argument("--image_size", type=int, default=518)
    p.add_argument("--feature_dim", type=int, default=384,
                   choices=[384, 768, 1024])
    p.add_argument("--depth_size", type=int, default=256)
    p.add_argument("--rembg", action="store_true")
    p.add_argument("--vlm_density", action="store_true")
    p.add_argument("--overwrite", action="store_true")
    args = p.parse_args(argv)
    n = preprocess_dataset(args.data_dir, args.image_size, args.feature_dim,
                           args.depth_size, args.rembg, args.overwrite,
                           args.vlm_density)
    print(f"preprocessed {n} images")


if __name__ == "__main__":
    main()
