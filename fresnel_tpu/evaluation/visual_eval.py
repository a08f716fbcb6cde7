"""Visual evaluation: rendered-vs-target SSIM/PSNR.

Port of the reference evaluator semantics (reference:
scripts/training/visual_eval.py:25-131): frontal camera with
view[2,3] = -2 (the Exp-003 sign-bug fix), SSIM comparator; PSNR added.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fresnel_tpu.core.camera import Camera
from fresnel_tpu.losses.ssim import ssim
from fresnel_tpu.render.tile import TileRendererConfig, render_tiled


def compute_ssim(img1: jax.Array, img2: jax.Array) -> float:
    """SSIM between (3, H, W) or (B, 3, H, W) images in [0, 1]."""
    return float(ssim(jnp.asarray(img1), jnp.asarray(img2)))


def compute_psnr(img1: jax.Array, img2: jax.Array) -> float:
    mse = float(jnp.mean((jnp.asarray(img1) - jnp.asarray(img2)) ** 2))
    if mse <= 1e-12:
        return 99.0
    return float(10.0 * np.log10(1.0 / mse))


class VisualEvaluator:
    """Renders a Gaussian dict and scores it against a target image."""

    # max_per_tile matches the TRAINING default (TrainingConfig.max_per_tile
    # = 256): a decoder trained under a 256-cap must be scored under the
    # same compositing truncation (VERDICT r2 weak #8).  Standalone cloud
    # rendering (fresnel render/orbit) keeps a higher 512 cap — no
    # gradients there and SAAG clouds are larger.
    def __init__(self, render_size: int = 256, max_per_tile: int = 256):
        self.render_size = render_size
        self.camera = Camera.default_training(render_size)
        self.cfg = TileRendererConfig(max_per_tile=max_per_tile)

    def render(self, gaussians: Dict[str, jax.Array],
               camera: Optional[Camera] = None) -> jax.Array:
        cam = camera or self.camera
        return render_tiled(
            gaussians["positions"], gaussians["scales"],
            gaussians["rotations"], gaussians["colors"],
            gaussians["opacities"], cam, config=self.cfg)

    def evaluate(self, gaussians: Dict[str, jax.Array],
                 target: jax.Array) -> Dict[str, float]:
        """target: (3, H, W) in [0, 1].  Returns ssim/psnr/coverage."""
        img = self.render(gaussians)
        target = jnp.asarray(target)
        if target.shape[-1] != self.render_size:
            target = jax.image.resize(
                target, (3, self.render_size, self.render_size), "linear")
        return {
            "ssim": compute_ssim(img, target),
            "psnr": compute_psnr(img, target),
            "coverage": float(jnp.mean(
                (jnp.mean(img, axis=0) > 0.01).astype(jnp.float32))),
        }
