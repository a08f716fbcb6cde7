"""Binary-protocol bridge CLIs — drop-in replacements for the reference's
ONNX subprocess scripts, speaking the SAME file/stdout contracts so the
reference's C++ viewer can call this framework directly (SURVEY.md §1 L3):

  dinov2:  IMAGE OUT.bin [small|base|large]
           writes raw float32 (37,37,C) HWC, prints "H W C"
           (reference: scripts/inference/dinov2_inference.py)
  depth:   IMAGE OUT.bin [W] [H]
           writes raw float32 square depth map
           (reference: scripts/inference/depth_inference.py)
  decoder: FEATURES.bin DEPTH.bin OUT.bin [checkpoint]
           reads (37,37,384) features + square depth, writes N x 14 float32
           Gaussians, prints "N"
           (reference: scripts/inference/decoder_inference.py:35-142)

Invoke: python -m fresnel_tpu.inference.bridges {dinov2|depth|decoder} ...
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

DIMS = {"small": 384, "base": 768, "large": 1024}


def _load_any_image(path: str, size: int):
    import jax.numpy as jnp
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((size, size), Image.BILINEAR)
    return jnp.asarray(np.asarray(img, np.float32) / 255.0)


def cmd_dinov2(argv) -> int:
    if len(argv) < 2:
        print("usage: dinov2 IMAGE OUT.bin [small|base|large]",
              file=sys.stderr)
        return 1
    model_size = argv[2] if len(argv) > 2 else "small"
    dim = DIMS[model_size]
    from fresnel_tpu.models.encoders import create_feature_extractor

    img = _load_any_image(argv[0], 518)
    feats = np.asarray(create_feature_extractor(dim=dim)(img), np.float32)
    feats.tofile(argv[1])
    h, w, c = feats.shape
    print(f"{h} {w} {c}")
    return 0


def cmd_depth(argv) -> int:
    if len(argv) < 2:
        print("usage: depth IMAGE OUT.bin [W] [H]", file=sys.stderr)
        return 1
    out_size = int(argv[2]) if len(argv) > 2 else 256
    from fresnel_tpu.models.encoders import gradient_depth_estimate

    img = _load_any_image(argv[0], 518)
    depth = np.asarray(gradient_depth_estimate(img, out_size), np.float32)
    depth.tofile(argv[1])
    return 0


def cmd_decoder(argv) -> int:
    if len(argv) < 3:
        print("usage: decoder FEATURES.bin DEPTH.bin OUT.bin [checkpoint]",
              file=sys.stderr)
        return 1
    import jax
    import jax.numpy as jnp
    from fresnel_tpu.models.decoders import DirectPatchDecoder

    feats = np.fromfile(argv[0], np.float32)
    dim = feats.size // (37 * 37)
    feats = feats.reshape(1, 37, 37, dim)
    d = np.fromfile(argv[1], np.float32)
    side = int(round(d.size ** 0.5))
    depth = d.reshape(1, side, side)

    ckpt = argv[3] if len(argv) > 3 else None
    model = DirectPatchDecoder(feature_dim=dim, gaussians_per_patch=4)
    if ckpt and Path(ckpt).exists():
        import flax.serialization as ser
        import json as _json
        from fresnel_tpu.train.config import (
            HFGSConfig, HFTSConfig, PhysicsConfig, TrainingConfig)
        from fresnel_tpu.train.harness import Trainer

        meta = _json.loads(Path(ckpt + ".json").read_text())
        trainer = Trainer(TrainingConfig(**meta["config"]),
                          PhysicsConfig(**meta["physics_config"]),
                          HFGSConfig(**meta["hfgs_config"]),
                          HFTSConfig(**meta["hfts_config"]))
        batch = {"features": feats, "depth": depth}
        state, _ = trainer.load_checkpoint(ckpt, batch)
        model = trainer.model
        params = state["params"]["model"]
    else:
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                            jnp.asarray(depth))

    out = model.apply(params, jnp.asarray(feats), jnp.asarray(depth))
    n = out["positions"].shape[1]
    flat = np.concatenate(
        [np.asarray(out["positions"][0]), np.asarray(out["scales"][0]),
         np.asarray(out["rotations"][0]), np.asarray(out["colors"][0]),
         np.asarray(out["opacities"][0])[:, None]], -1).astype(np.float32)
    flat.tofile(argv[2])
    print(n)
    return 0


def cmd_test_novel_views(argv) -> int:
    """Validation mode: image -> decode -> orbit renders, saved as PNGs.

    Mirrors the reference's `test_novel_views` debug entry (reference:
    scripts/inference/decoder_inference.py:147-280) — a checkpoint sanity
    check that the decoder does not produce dark/black novel views before
    CVS data regeneration.  Prints one 'az=<deg> mean=<brightness>
    coverage=<frac>' line per view plus PASS/DARK."""
    if len(argv) < 2:
        print("usage: test_novel_views IMAGE OUT_DIR [checkpoint] "
              "[num_views] [size]", file=sys.stderr)
        return 1
    import jax
    import jax.numpy as jnp

    from fresnel_tpu.evaluation.novel_view_eval import render_views
    from fresnel_tpu.models.decoders import DirectPatchDecoder
    from fresnel_tpu.models.encoders import (create_feature_extractor,
                                             gradient_depth_estimate)

    out_dir = Path(argv[1])
    out_dir.mkdir(parents=True, exist_ok=True)
    ckpt = argv[2] if len(argv) > 2 and argv[2] != "-" else None
    num_views = int(argv[3]) if len(argv) > 3 else 8
    size = int(argv[4]) if len(argv) > 4 else 256

    img = _load_any_image(argv[0], 518)
    feats = np.asarray(create_feature_extractor(dim=384)(img),
                       np.float32)[None]
    depth = np.asarray(gradient_depth_estimate(img, 256), np.float32)[None]

    if ckpt and Path(ckpt).exists():
        import json as _json
        from fresnel_tpu.train.config import (
            HFGSConfig, HFTSConfig, PhysicsConfig, TrainingConfig)
        from fresnel_tpu.train.harness import Trainer

        meta = _json.loads(Path(ckpt + ".json").read_text())
        trainer = Trainer(TrainingConfig(**meta["config"]),
                          PhysicsConfig(**meta["physics_config"]),
                          HFGSConfig(**meta["hfgs_config"]),
                          HFTSConfig(**meta["hfts_config"]))
        S = trainer.config.image_size
        img_chw = np.asarray(jax.image.resize(
            jnp.transpose(img, (2, 0, 1)), (3, S, S), "linear"))[None]
        batch = {"features": feats, "depth": depth, "image": img_chw}
        state, _ = trainer.load_checkpoint(ckpt, batch)
        model, params = trainer.model, state["params"]["model"]
        if getattr(trainer.config, "train_encoder", False):
            # Encoder-trained checkpoints condition on THEIR encoder's
            # features, not the procedural extractor's.
            feats = np.asarray(
                trainer.encode(state["params"], jnp.asarray(img_chw)))
    else:
        model = DirectPatchDecoder(feature_dim=384, gaussians_per_patch=4)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                            jnp.asarray(depth))

    out = model.apply(params, jnp.asarray(feats), jnp.asarray(depth))
    gaussians = {k: out[k][0] for k in ("positions", "scales", "rotations",
                                        "colors", "opacities")}
    azimuths = tuple(np.linspace(0.0, 360.0, num_views, endpoint=False))
    views = np.asarray(render_views(gaussians, render_size=size,
                                    azimuths_deg=azimuths))

    from PIL import Image

    dark = 0
    for az, v in zip(azimuths, views):
        mean = float(v.mean())
        coverage = float((v.max(axis=0) > 0.02).mean())
        print(f"az={az:.0f} mean={mean:.4f} coverage={coverage:.3f}")
        if mean < 0.01:
            dark += 1
        Image.fromarray(
            (np.clip(v.transpose(1, 2, 0), 0, 1) * 255).astype(np.uint8)
        ).save(out_dir / f"novel_view_az{int(az):03d}.png")
    print("DARK" if dark else "PASS")
    return 1 if dark else 0


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("usage: bridges {dinov2|depth|decoder|test_novel_views} ...",
              file=sys.stderr)
        return 1
    return {"dinov2": cmd_dinov2, "depth": cmd_depth,
            "decoder": cmd_decoder,
            "test_novel_views": cmd_test_novel_views}[argv[0]](argv[1:])


if __name__ == "__main__":
    sys.exit(main())
