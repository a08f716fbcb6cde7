"""CVS multi-view generation + 3DGS optimization from generated views.

Rebuild of the reference CLI (reference: scripts/inference/cvs_multiview.py):
orbit / hemisphere camera paths, CVS one-step generation per pose, and —
unlike the reference, whose optimize_3dgs was a stub TODO (:358-399) — a REAL
implementation: fit a Gaussian cloud to the generated views by gradient
descent through the differentiable tiled rasterizer.

Run:  python -m fresnel_tpu.inference.cvs_multiview IMAGE --checkpoint CKPT \
          --path orbit --views 8 --optimize_3dgs out.ply
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import List, Tuple

import numpy as np


def camera_path(kind: str, n_views: int, distance: float = 2.0
                ) -> List[Tuple[float, float]]:
    """(elevation, azimuth) radians per view."""
    if kind == "orbit":
        return [(0.0, az) for az in np.linspace(0, 2 * np.pi, n_views,
                                                endpoint=False)]
    if kind == "hemisphere":
        out = []
        rings = max(1, n_views // 4)
        per = max(1, n_views // rings)
        for el in np.linspace(0.1, 1.0, rings):
            for az in np.linspace(0, 2 * np.pi, per, endpoint=False):
                out.append((float(el), float(az)))
        return out[:n_views]
    raise ValueError(kind)


def optimize_3dgs(views, poses, image_size: int, n_gaussians: int = 2000,
                  steps: int = 300, lr: float = 1e-2, seed: int = 0):
    """Fit a Gaussian cloud to (V, 3, S, S) views at the given poses by
    gradient descent through the tiled rasterizer."""
    import jax
    import jax.numpy as jnp
    import optax
    from fresnel_tpu.core.camera import Camera
    from fresnel_tpu.core.gaussians import GaussianCloud
    from fresnel_tpu.render.tile import TileRendererConfig, render_tiled
    from fresnel_tpu.losses.ssim import ssim

    views = jnp.asarray(views)
    cams = [Camera.from_pose(el, az, image_size) for el, az in poses]
    cfg = TileRendererConfig(max_per_tile=256)

    rng = np.random.default_rng(seed)
    init = {
        "positions": jnp.asarray(
            rng.normal(size=(n_gaussians, 3)).astype(np.float32) * 0.4),
        "log_scales": jnp.full((n_gaussians, 3), np.log(0.05), jnp.float32),
        "rotations": jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32),
                              (n_gaussians, 1)),
        "color_logits": jnp.zeros((n_gaussians, 3), jnp.float32),
        "opacity_logits": jnp.zeros((n_gaussians,), jnp.float32),
    }

    def render_all(p):
        scales = jnp.exp(p["log_scales"])
        colors = jax.nn.sigmoid(p["color_logits"])
        op = jax.nn.sigmoid(p["opacity_logits"])
        imgs = [render_tiled(p["positions"], scales, p["rotations"], colors,
                             op, cam, config=cfg) for cam in cams]
        return jnp.stack(imgs)

    def loss_fn(p):
        imgs = render_all(p)
        return (jnp.mean(jnp.abs(imgs - views))
                + 0.5 * (1.0 - ssim(imgs, views)))

    opt = optax.adam(lr)
    opt_state = opt.init(init)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    p = init
    for i in range(steps):
        p, opt_state, loss = step(p, opt_state)
        if (i + 1) % 50 == 0:
            print(f"  3dgs fit step {i + 1}/{steps} loss={float(loss):.4f}")

    return GaussianCloud(
        positions=p["positions"], scales=jnp.exp(p["log_scales"]),
        rotations=p["rotations"] / jnp.linalg.norm(
            p["rotations"], axis=-1, keepdims=True),
        colors=jax.nn.sigmoid(p["color_logits"]),
        opacities=jax.nn.sigmoid(p["opacity_logits"]))


def main(argv=None):
    p = argparse.ArgumentParser(description="CVS multi-view generation")
    p.add_argument("image")
    p.add_argument("--checkpoint", required=True,
                   help="CVS checkpoint (.msgpack from train_cvs)")
    p.add_argument("--output_dir", default="cvs_views")
    p.add_argument("--path", choices=["orbit", "hemisphere"], default="orbit")
    p.add_argument("--views", type=int, default=8)
    p.add_argument("--num_steps", type=int, default=1)
    p.add_argument("--optimize_3dgs", default=None,
                   help="fit a Gaussian cloud to the views -> PLY path")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import flax.serialization as ser
    from PIL import Image
    from fresnel_tpu.models.encoders import create_feature_extractor
    from fresnel_tpu.train.train_cvs import CVSTrainer, CVSTrainConfig
    from fresnel_tpu.core.camera import Camera

    meta = json.loads(Path(args.checkpoint + ".json").read_text())
    cfg = CVSTrainConfig(**meta["config"])
    trainer = CVSTrainer(cfg)
    S = cfg.image_size

    img = Image.open(args.image).convert("RGB").resize((S, S))
    image = jnp.asarray(np.asarray(img, np.float32) / 255.0)
    feats = create_feature_extractor(dim=384)(image)[None]

    # Restore checkpoint.
    batch = {
        "input_image": np.transpose(np.asarray(image), (2, 0, 1))[None],
        "features": np.asarray(feats),
        "R_rel": np.eye(3, dtype=np.float32)[None],
        "t_rel": np.zeros((1, 3), np.float32),
        "target_image": np.transpose(np.asarray(image), (2, 0, 1))[None],
    }
    template = trainer.init_state(batch)
    state = ser.from_bytes(template, Path(args.checkpoint).read_bytes())

    poses = camera_path(args.path, args.views)
    base_cam = Camera.from_pose(0.0, 0.0, S)
    R0 = np.asarray(base_cam.view[:3, :3])
    t0 = np.asarray(base_cam.view[:3, 3])

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)
    views = []
    for i, (el, az) in enumerate(poses):
        cam = Camera.from_pose(el, az, S)
        R = np.asarray(cam.view[:3, :3])
        t = np.asarray(cam.view[:3, 3])
        R_rel = jnp.asarray((R @ R0.T)[None])
        t_rel = jnp.asarray((t - (R @ R0.T) @ t0)[None])
        rng, nrng = jax.random.split(rng)
        gen = trainer.generate(state, feats, R_rel, t_rel, nrng,
                               num_steps=args.num_steps)
        arr = np.clip(np.asarray(gen[0]).transpose(1, 2, 0), 0, 1)
        views.append(np.asarray(gen[0]))
        Image.fromarray((arr * 255).astype(np.uint8)).save(
            out_dir / f"view_{i:03d}.png")
    print(f"generated {len(views)} views -> {out_dir}")

    if args.optimize_3dgs:
        cloud = optimize_3dgs(np.stack(views), poses, S)
        from fresnel_tpu.core import io as gio
        gio.save_ply(args.optimize_3dgs, cloud)
        print(f"optimized 3DGS -> {args.optimize_3dgs}")


if __name__ == "__main__":
    main()
