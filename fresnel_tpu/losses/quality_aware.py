"""Quality-aware losses for Gaussian-bootstrap CVS training.

Port of the reference module (reference:
scripts/models/quality_aware_losses.py): bootstrap targets are themselves
Gaussian renders with artifacts, so instead of trusting them uniformly,
down-weight regions whose rendered-depth Laplacian indicates splat artifacts.

  * depth_laplacian — 5-point |∇²depth| (:21-41)
  * quality_mask    — sigmoid(-sharpness · (laplacian − threshold)) (:44-68)
  * gradient_penalty — TV penalty, optionally quality-masked (:71-104)
  * consistency_weight_schedule — staircase ramp 0.1 / 0.3 / 1.0 at the
    33% / 66% marks (:107-151)
  * quality_aware_cvs_loss — masked L1 + gradient penalty + scheduled
    consistency term (:153-307)
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def depth_laplacian(depth: jax.Array) -> jax.Array:
    """(B, H, W) -> |5-point Laplacian| with edge padding."""
    d = jnp.pad(depth, ((0, 0), (1, 1), (1, 1)), mode="edge")
    lap = (d[:, :-2, 1:-1] + d[:, 2:, 1:-1] + d[:, 1:-1, :-2]
           + d[:, 1:-1, 2:] - 4.0 * d[:, 1:-1, 1:-1])
    return jnp.abs(lap)


def quality_mask(rendered_depth: jax.Array, threshold: float = 0.1,
                 sharpness: float = 10.0) -> jax.Array:
    """(B, H, W) depth -> (B, H, W) quality in [0, 1] (1 = trustworthy)."""
    return jax.nn.sigmoid(-sharpness * (depth_laplacian(rendered_depth)
                                        - threshold))


def gradient_penalty(image: jax.Array,
                     mask: Optional[jax.Array] = None) -> jax.Array:
    """TV penalty on (B, C, H, W), optionally weighted by (B, H, W) mask."""
    gx = jnp.abs(image[..., :, 1:] - image[..., :, :-1])
    gy = jnp.abs(image[..., 1:, :] - image[..., :-1, :])
    if mask is not None:
        return (jnp.mean(gx * mask[:, None, :, 1:])
                + jnp.mean(gy * mask[:, None, 1:, :]))
    return jnp.mean(gx) + jnp.mean(gy)


def consistency_weight_schedule(epoch: int, total_epochs: int) -> float:
    """Staircase ramp: bootstrap data is noisy, so consistency pressure
    grows only once reconstruction has stabilized."""
    progress = epoch / max(total_epochs, 1)
    if progress < 1 / 3:
        return 0.1
    if progress < 2 / 3:
        return 0.3
    return 1.0


def quality_aware_cvs_loss(
    x0_pred: jax.Array,              # (B, 3, H, W)
    target: jax.Array,               # (B, 3, H, W) bootstrap render
    target_depth: Optional[jax.Array] = None,   # (B, H, W) bootstrap depth
    x0_ema: Optional[jax.Array] = None,
    consistency_weight: float = 1.0,
    lambda_gradient: float = 0.05,
    threshold: float = 0.1,
) -> Dict[str, jax.Array]:
    ld: Dict[str, jax.Array] = {}
    if target_depth is not None:
        qm = quality_mask(target_depth, threshold=threshold)
        l1 = jnp.mean(jnp.abs(x0_pred - target) * qm[:, None])
        ld["quality_coverage"] = jnp.mean(qm)
    else:
        qm = None
        l1 = jnp.mean(jnp.abs(x0_pred - target))
    ld["l1"] = l1
    ld["gradient"] = gradient_penalty(x0_pred, qm) * lambda_gradient
    total = l1 + ld["gradient"]
    if x0_ema is not None:
        cons = jnp.mean((x0_pred - jax.lax.stop_gradient(x0_ema)) ** 2)
        ld["consistency"] = cons * consistency_weight
        total = total + ld["consistency"]
    ld["total"] = total
    return ld
