"""Side-by-side multi-angle decoder comparison.

Rebuild of the reference's compare_decoders CLI (reference:
scripts/evaluation/compare_decoders.py): renders checkpoints from several
azimuths into one PNG grid (PIL, no matplotlib dependency).

Run:  python -m fresnel_tpu.evaluation.compare_decoders CKPT_A [CKPT_B ...] \
          --image test.png --out compare.png
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def load_and_decode(checkpoint: str, image):
    import jax.numpy as jnp
    from fresnel_tpu.models.encoders import (
        create_feature_extractor, gradient_depth_estimate)
    from fresnel_tpu.train.config import (
        HFGSConfig, HFTSConfig, PhysicsConfig, TrainingConfig)
    from fresnel_tpu.train.harness import Trainer

    meta = json.loads(Path(checkpoint + ".json").read_text())
    cfg = TrainingConfig(**meta["config"])
    trainer = Trainer(cfg, PhysicsConfig(**meta["physics_config"]),
                      HFGSConfig(**meta["hfgs_config"]),
                      HFTSConfig(**meta["hfts_config"]))
    feats = create_feature_extractor(dim=cfg.feature_dim)(image)[None]
    depth = gradient_depth_estimate(image, 256)[None]
    batch = {"features": np.asarray(feats), "depth": np.asarray(depth)}
    state, _ = trainer.load_checkpoint(checkpoint, batch)
    out = trainer.model.apply(state["params"]["model"], jnp.asarray(feats),
                              jnp.asarray(depth))
    return {k: v[0] for k, v in out.items()
            if k in ("positions", "scales", "rotations", "colors",
                     "opacities")}


def compare(checkpoints, image_path: str, out_path: str,
            azimuths=(0, 45, 90, 180), render_size: int = 256):
    import jax.numpy as jnp
    from PIL import Image
    from fresnel_tpu.evaluation.novel_view_eval import render_views

    img = Image.open(image_path).convert("RGB").resize((512, 512))
    image = jnp.asarray(np.asarray(img, np.float32) / 255.0)

    rows = []
    labels = []
    for ckpt in checkpoints:
        g = load_and_decode(ckpt, image)
        views = render_views(g, render_size=render_size,
                             azimuths_deg=azimuths)
        rows.append(np.concatenate(
            [np.asarray(v).transpose(1, 2, 0) for v in views], axis=1))
        labels.append(Path(ckpt).stem)

    grid = np.concatenate(rows, axis=0)
    Image.fromarray((np.clip(grid, 0, 1) * 255).astype(np.uint8)).save(out_path)
    print(f"comparison grid ({len(rows)} checkpoints x {len(azimuths)} views)"
          f" -> {out_path}")
    for lbl in labels:
        print(f"  row: {lbl}")


def main(argv=None):
    p = argparse.ArgumentParser(description="Compare decoder checkpoints")
    p.add_argument("checkpoints", nargs="+")
    p.add_argument("--image", required=True)
    p.add_argument("--out", default="compare.png")
    p.add_argument("--size", type=int, default=256)
    args = p.parse_args(argv)
    compare(args.checkpoints, args.image, args.out, render_size=args.size)


if __name__ == "__main__":
    main()
