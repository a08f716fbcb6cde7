"""Bidirectional Chamfer Gaussian-matching loss (Fresnel v2 distillation).

Port of the reference GaussianMatchingLoss semantics (reference:
scripts/training/train_direct_decoder.py:158-357): forward direction matches
every prediction to its nearest target (quality), backward direction matches
every target to its nearest prediction (coverage); component losses are
position/scale MSE, quaternion-dot rotation distance 1 − |q·q'|, color and
opacity MSE, and a weighted coverage bundle.

TPU-native shape discipline: the reference's per-batch Python loops, dynamic
validity filtering, and chunked cdist become one fully-batched masked
computation — invalid entries get +inf distance so they are never selected,
and masked means replace filtering.  Optional subsampling to max_match_points
uses a static stride.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MatchingWeights:
    position: float = 10.0
    scale: float = 5.0
    rotation: float = 2.0
    color: float = 5.0
    opacity: float = 3.0
    coverage: float = 1.0


def _valid_mask(g: jax.Array, extra: Optional[jax.Array]) -> jax.Array:
    """Zero-padded Gaussians (zero position AND opacity) are invalid."""
    v = (jnp.sum(jnp.abs(g[..., :3]), -1) > 1e-6) | (jnp.abs(g[..., 13]) > 1e-6)
    if extra is not None:
        v = v & extra.astype(bool)
    return v


def _subsample(g: jax.Array, mask: jax.Array, k: int):
    n = g.shape[0]
    if n <= k:
        return g, mask
    stride = n / k
    idx = jnp.floor(jnp.arange(k) * stride).astype(jnp.int32)
    return g[idx], mask[idx]


def _nearest(a_pos, a_valid, b_pos, b_valid):
    """For each a: index of nearest valid b (masked, full cdist)."""
    diff = a_pos[:, None, :] - b_pos[None, :, :]
    d2 = jnp.sum(diff * diff, -1)
    d2 = jnp.where(b_valid[None, :], d2, jnp.inf)
    return jnp.argmin(d2, axis=1)


def _masked_mse(a, b, mask):
    se = jnp.sum((a - b) ** 2, axis=-1) if a.ndim > 1 else (a - b) ** 2
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    per_dim = a.shape[-1] if a.ndim > 1 else 1
    return jnp.sum(jnp.where(mask, se, 0.0)) / (denom * per_dim)


def gaussian_matching_loss(
    pred: jax.Array,                    # (B, Np, 14)
    target: jax.Array,                  # (B, Nt, 14)
    pred_mask: Optional[jax.Array] = None,
    target_mask: Optional[jax.Array] = None,
    weights: MatchingWeights = MatchingWeights(),
    max_match_points: int = 4096,
) -> Dict[str, jax.Array]:
    w = weights

    def one(p, t, pm, tm):
        pv = _valid_mask(p, pm)
        tv = _valid_mask(t, tm)
        p, pv = _subsample(p, pv, max_match_points)
        t, tv = _subsample(t, tv, max_match_points * 2)

        # Forward: predictions -> nearest targets (quality).
        fwd = _nearest(p[:, :3], pv, t[:, :3], tv)
        tm_ = t[fwd]
        pos_l = _masked_mse(p[:, :3], tm_[:, :3], pv)
        scale_l = _masked_mse(p[:, 3:6], tm_[:, 3:6], pv)
        qp = p[:, 6:10]
        qt = tm_[:, 6:10]
        qp = qp / jnp.maximum(jnp.linalg.norm(qp, axis=-1, keepdims=True), 1e-8)
        qt = qt / jnp.maximum(jnp.linalg.norm(qt, axis=-1, keepdims=True), 1e-8)
        qdot = jnp.abs(jnp.sum(qp * qt, -1))
        rot_l = jnp.sum(jnp.where(pv, 1.0 - qdot, 0.0)) / jnp.maximum(
            jnp.sum(pv), 1.0)
        color_l = _masked_mse(p[:, 10:13], tm_[:, 10:13], pv)
        op_l = _masked_mse(p[:, 13:14], tm_[:, 13:14], pv)

        # Backward: targets -> nearest predictions (coverage).
        bwd = _nearest(t[:, :3], tv, p[:, :3], pv)
        pm_ = p[bwd]
        cov = (2.0 * _masked_mse(t[:, :3], pm_[:, :3], tv)
               + 0.5 * _masked_mse(t[:, 3:6], pm_[:, 3:6], tv)
               + 0.5 * _masked_mse(t[:, 10:13], pm_[:, 10:13], tv)
               + 2.0 * _masked_mse(t[:, 13:14], pm_[:, 13:14], tv))

        total = (w.position * pos_l + w.scale * scale_l + w.rotation * rot_l
                 + w.color * color_l + w.opacity * op_l + w.coverage * cov)
        return total, pos_l, scale_l, rot_l, color_l, op_l, cov

    pm = pred_mask if pred_mask is not None else jnp.ones(pred.shape[:2], bool)
    tm = target_mask if target_mask is not None else jnp.ones(
        target.shape[:2], bool)
    total, pos_l, scale_l, rot_l, color_l, op_l, cov = jax.vmap(one)(
        pred, target, pm, tm)
    return {
        "total": jnp.mean(total),
        "position": jnp.mean(pos_l),
        "scale": jnp.mean(scale_l),
        "rotation": jnp.mean(rot_l),
        "color": jnp.mean(color_l),
        "opacity": jnp.mean(op_l),
        "coverage": jnp.mean(cov),
    }


def occupancy_bce_loss(logits: jax.Array, targets: jax.Array,
                       mask: Optional[jax.Array] = None) -> jax.Array:
    """Masked binary cross-entropy on occupancy logits."""
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    if mask is not None:
        return jnp.sum(jnp.where(mask, loss, 0.0)) / jnp.maximum(
            jnp.sum(mask), 1.0)
    return jnp.mean(loss)


def proximity_occupancy_targets(coords: jax.Array, gaussian_positions: jax.Array,
                                coord_valid: jax.Array, gauss_valid: jax.Array,
                                threshold: float = 0.15,
                                grid_resolution: int = 64) -> jax.Array:
    """A voxel is occupied if any valid target Gaussian lies within
    `threshold` (in [-1,1] units) of its center (reference:
    scripts/distillation/trellis_dataset.py:77-121)."""
    centers = coords[..., 1:4].astype(jnp.float32) / grid_resolution * 2 - 1
    diff = centers[:, None, :] - gaussian_positions[None, :, :]
    d2 = jnp.sum(diff * diff, -1)
    d2 = jnp.where(gauss_valid[None, :], d2, jnp.inf)
    occ = jnp.min(d2, axis=1) < threshold ** 2
    return (occ & coord_valid.astype(bool)).astype(jnp.float32)
