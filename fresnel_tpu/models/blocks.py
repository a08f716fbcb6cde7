"""Shared model building blocks (Flax, NHWC).

Ports of the reference building blocks with TPU-friendly layouts
(reference: scripts/models/gaussian_decoder_models.py:279-417, 577-615):
  * MLP — ReLU stack with optional dropout.
  * PoseEncoder — sinusoidal encoding (8 freqs x sin/cos x 2 angles) -> MLP.
  * bilinear_sample / FeatureInterpolator — grid_sample equivalent in jnp.
  * DepthEncoder — 3-conv depth feature encoder pooled to the 37x37 DINOv2
    patch grid.
  * fibonacci_spiral_positions / rotate_positions_for_pose / tensegrity_loss —
    geometry helpers used by the decoder family.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


class MLP(nn.Module):
    hidden_dims: Sequence[int]
    output_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        for h in self.hidden_dims:
            x = nn.relu(nn.Dense(h)(x))
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.output_dim)(x)


def sinusoidal_encode(x: jax.Array, num_frequencies: int = 8) -> jax.Array:
    """(...,) angles -> (..., 2*num_frequencies) [sin | cos] at 2^k freqs."""
    freqs = 2.0 ** jnp.arange(num_frequencies, dtype=x.dtype)
    xe = x[..., None] * freqs
    return jnp.concatenate([jnp.sin(xe), jnp.cos(xe)], axis=-1)


class PoseEncoder(nn.Module):
    """Camera pose (elevation, azimuth) -> (B, embed_dim) embedding."""

    embed_dim: int = 64
    num_frequencies: int = 8

    @nn.compact
    def __call__(self, elevation: jax.Array, azimuth: jax.Array) -> jax.Array:
        enc = jnp.concatenate(
            [sinusoidal_encode(elevation, self.num_frequencies),
             sinusoidal_encode(azimuth, self.num_frequencies)], axis=-1)
        h = nn.relu(nn.Dense(self.embed_dim)(enc))
        return nn.Dense(self.embed_dim)(h)


def bilinear_sample(features: jax.Array, positions: jax.Array) -> jax.Array:
    """Bilinear sampling of an NHWC grid at normalized positions.

    features: (H, W, C); positions: (N, 2) in [0, 1] as (x, y).
    Border padding, align_corners=False convention (pixel centers at
    (i + 0.5) / size), matching the reference's grid_sample usage.
    Returns (N, C).
    """
    H, W, _ = features.shape
    x = positions[:, 0] * W - 0.5
    y = positions[:, 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def at(yi, xi):
        yi = jnp.clip(yi.astype(jnp.int32), 0, H - 1)
        xi = jnp.clip(xi.astype(jnp.int32), 0, W - 1)
        return features[yi, xi]

    f00 = at(y0, x0)
    f01 = at(y0, x0 + 1)
    f10 = at(y0 + 1, x0)
    f11 = at(y0 + 1, x0 + 1)
    top = f00 * (1 - wx[:, None]) + f01 * wx[:, None]
    bot = f10 * (1 - wx[:, None]) + f11 * wx[:, None]
    return top * (1 - wy[:, None]) + bot * wy[:, None]


class FeatureInterpolator(nn.Module):
    """Batched bilinear feature lookup: (B, H, W, C) x (B, N, 2) -> (B, N, C)."""

    @nn.compact
    def __call__(self, features: jax.Array, positions: jax.Array) -> jax.Array:
        return jax.vmap(bilinear_sample)(features, positions)


def adaptive_average_pool(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Average-pool an (B, H, W, C) grid to (B, out_h, out_w, C).

    Uses resize-by-area semantics (linear antialiased resize), the smooth
    TPU-friendly stand-in for torch adaptive_avg_pool2d.
    """
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, out_hw[0], out_hw[1], C), method="linear")


class DepthEncoder(nn.Module):
    """(B, H, W, 1) depth -> (B, 37, 37, out_channels) features."""

    out_channels: int = 64
    grid_size: int = 37

    @nn.compact
    def __call__(self, depth: jax.Array) -> jax.Array:
        if depth.ndim == 3:
            depth = depth[..., None]
        x = nn.relu(nn.Conv(32, (3, 3), padding="SAME")(depth))
        x = nn.relu(nn.Conv(64, (3, 3), padding="SAME")(x))
        x = nn.relu(nn.Conv(self.out_channels, (3, 3), padding="SAME")(x))
        return adaptive_average_pool(x, (self.grid_size, self.grid_size))


def fibonacci_spiral_positions(n_points: int) -> Tuple[jax.Array, jax.Array]:
    """Vogel golden-angle spiral: n points in [-1, 1]^2 with sqrt radial
    density (equal area per point)."""
    golden_angle = math.pi * (3.0 - math.sqrt(5.0))
    idx = jnp.arange(n_points, dtype=jnp.float32)
    r = jnp.sqrt(idx / n_points)
    theta = idx * golden_angle
    return r * jnp.cos(theta), r * jnp.sin(theta)


def rotate_positions_for_pose(positions: jax.Array, elevation: jax.Array,
                              azimuth: jax.Array) -> jax.Array:
    """Rotate a (B, ..., 3) position grid to face the camera at the given pose
    (azimuth about Y then elevation about X) — the Exp-010 view-aware fix
    (reference: gaussian_decoder_models.py:51-104)."""
    nd = positions.ndim - 2  # broadcast dims between batch and xyz
    shape = (-1,) + (1,) * nd
    cos_az = jnp.cos(azimuth).reshape(shape)
    sin_az = jnp.sin(azimuth).reshape(shape)
    cos_el = jnp.cos(elevation).reshape(shape)
    sin_el = jnp.sin(elevation).reshape(shape)

    x, y, z = positions[..., 0], positions[..., 1], positions[..., 2]
    x_rot = x * cos_az + z * sin_az
    z_rot = -x * sin_az + z * cos_az
    y_rot = y * cos_el - z_rot * sin_el
    z_fin = y * sin_el + z_rot * cos_el
    return jnp.stack([x_rot, y_rot, z_fin], axis=-1)


GOLDEN_RATIO = 1.618033988749895


def tensegrity_loss(positions: jax.Array, k_neighbors: int = 6,
                    target_spacing: float = 0.1) -> jax.Array:
    """Golden-ratio kNN spring-energy spacing regularizer over (B, N, 3)."""
    diff = positions[:, :, None, :] - positions[:, None, :, :]
    # sqrt(x + eps) keeps the self-distance diagonal's gradient finite.
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    n = positions.shape[1]
    d = d + jnp.eye(n, dtype=d.dtype)[None] * 1e6
    knn = -jax.lax.top_k(-d, k_neighbors)[0]  # (B, N, k) smallest distances
    ideal = target_spacing * GOLDEN_RATIO ** (
        jnp.arange(k_neighbors, dtype=jnp.float32) * 0.5)
    return jnp.mean((knn - ideal) ** 2)
