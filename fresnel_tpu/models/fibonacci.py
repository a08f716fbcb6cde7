"""FibonacciPatchDecoder (Experiment 4): golden-spiral Gaussian placement.

Flax port with reference parameterization (reference:
scripts/models/gaussian_decoder_models.py:1493-1747): 377 Vogel-spiral
points, bilinear feature/depth sampling at spiral coords (align_corners=True
convention), MLP [512,256,128], XY offsets scaled 0.15, depth-locked Z,
optional Fresnel zones / per-RGB phases / pose-modulated opacity.
~363K params vs ~2.5M for the 37x37 grid (experiments/013).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from fresnel_tpu.core.gaussians import rotation_6d_to_quaternion
from fresnel_tpu.models.blocks import (
    MLP, PoseEncoder, fibonacci_spiral_positions, rotate_positions_for_pose)
from fresnel_tpu.physics.fresnel_zones import FresnelZones

TWO_PI = 6.283185307179586


def sample_grid_at(grid: jax.Array, coords_m11: jax.Array) -> jax.Array:
    """Bilinear sample (H, W, C) at (N, 2) coords in [-1, 1]
    (align_corners=True, border padding — torch grid_sample parity)."""
    H, W, _ = grid.shape
    x = (coords_m11[:, 0] + 1.0) * 0.5 * (W - 1)
    y = (coords_m11[:, 1] + 1.0) * 0.5 * (H - 1)
    x0, y0 = jnp.floor(x), jnp.floor(y)
    wx, wy = x - x0, y - y0

    def at(yi, xi):
        yi = jnp.clip(yi.astype(jnp.int32), 0, H - 1)
        xi = jnp.clip(xi.astype(jnp.int32), 0, W - 1)
        return grid[yi, xi]

    top = at(y0, x0) * (1 - wx[:, None]) + at(y0, x0 + 1) * wx[:, None]
    bot = at(y0 + 1, x0) * (1 - wx[:, None]) + at(y0 + 1, x0 + 1) * wx[:, None]
    return top * (1 - wy[:, None]) + bot * wy[:, None]


def fib_head_transform(
    raw: jax.Array,                        # (B, N, K, 16|19)
    depth: Optional[jax.Array],            # (B, H, W[, 1]) or None
    depth_offset: jax.Array,               # scalar
    *,
    scale_bias: float = 0.0,
    opacity_bias: float = 0.0,
    use_fresnel_zones: bool = False,
    num_fresnel_zones: int = 8,
    use_phase_output: bool = False,
    elevation: Optional[jax.Array] = None,
    azimuth: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Raw spiral-point head outputs -> Gaussian parameter dict.

    The exp-4 analogue of decoders.head_transform (reference head
    semantics: gaussian_decoder_models.py:1595-1660 — spiral base coords,
    XY offsets scaled 0.15, Z locked to depth sampled AT the spiral
    points, softplus(raw+1)*0.15 scales, 6D->quat, sigmoid color/opacity).
    Pure function shared by FibonacciPatchDecoder.__call__ and the
    decoder-space teacher fitter (train/fit_teacher.py --experiment 4) so
    exp-4 distillation targets live exactly in the head's output space.
    """
    B, N, K = raw.shape[:3]
    raw_pos, raw_scale = raw[..., 0:3], raw[..., 3:6]
    rot_6d, raw_color, raw_op = raw[..., 6:12], raw[..., 12:15], raw[..., 15]
    raw_phase = raw[..., 16:19] if use_phase_output else None

    sx, sy = fibonacci_spiral_positions(N)
    coords = jnp.stack([sx, sy], -1)                     # (N, 2) in [-1, 1]
    base_x = jnp.broadcast_to(sx[None, :, None], (B, N, K))
    base_y = jnp.broadcast_to(sy[None, :, None], (B, N, K))

    if depth is not None:
        d = depth[..., 0] if depth.ndim == 4 else depth
        d_sampled = jax.vmap(
            lambda dd: sample_grid_at(dd[..., None], coords)[:, 0])(d)
        if use_fresnel_zones:
            zones = FresnelZones(num_zones=num_fresnel_zones)
            d_sampled = zones.zone_centers_for_depth(d_sampled)
        base_z = depth_offset + d_sampled[..., None] * (-2.0)
        base_z = jnp.broadcast_to(base_z, (B, N, K))
    else:
        base_z = jnp.full((B, N, K), depth_offset)

    positions = jnp.stack(
        [base_x + raw_pos[..., 0] * 0.15,
         base_y + raw_pos[..., 1] * 0.15,
         base_z], -1)

    if elevation is not None and azimuth is not None:
        positions = rotate_positions_for_pose(
            positions[:, None], elevation, azimuth)[:, 0]

    scales = jnp.clip(
        jax.nn.softplus(jnp.clip(raw_scale, -10, 20) + 1.0
                        + scale_bias) * 0.15,
        1e-6, 2.0)
    rotations = rotation_6d_to_quaternion(rot_6d)
    colors = jax.nn.sigmoid(raw_color)
    opacities = jax.nn.sigmoid(raw_op + opacity_bias)

    total = N * K
    result = {
        "positions": positions.reshape(B, total, 3),
        "scales": scales.reshape(B, total, 3),
        "rotations": rotations.reshape(B, total, 4),
        "colors": colors.reshape(B, total, 3),
        "opacities": opacities.reshape(B, total),
    }
    if raw_phase is not None:
        result["phases"] = (jax.nn.sigmoid(raw_phase) * TWO_PI
                            ).reshape(B, total, 3)
    return result


class FibonacciPatchDecoder(nn.Module):
    feature_dim: int = 384
    n_points: int = 377
    gaussians_per_point: int = 1
    hidden_dims: Sequence[int] = (512, 256, 128)
    dropout: float = 0.1
    use_fresnel_zones: bool = False
    num_fresnel_zones: int = 8
    use_phase_output: bool = False
    use_pose_encoding: bool = False
    pose_embed_dim: int = 64
    # Head-init biases, see decoders.DirectPatchDecoder.
    scale_bias: float = 0.0
    opacity_bias: float = 0.0

    @nn.compact
    def __call__(
        self,
        features: jax.Array,                 # (B, 37, 37, C) NHWC
        depth: Optional[jax.Array] = None,   # (B, H, W[, 1])
        num_gaussians: Optional[int] = None,  # API parity; unused
        elevation: Optional[jax.Array] = None,
        azimuth: Optional[jax.Array] = None,
        deterministic: bool = True,
        return_raw: bool = False,               # add "raw" (B, N, K, opg)
    ) -> Dict[str, jax.Array]:
        B = features.shape[0]
        N, K = self.n_points, self.gaussians_per_point
        opg = 19 if self.use_phase_output else 16

        sx, sy = fibonacci_spiral_positions(N)
        coords = jnp.stack([sx, sy], -1)                 # (N, 2) in [-1, 1]

        sampled = jax.vmap(lambda f: sample_grid_at(f, coords))(features)
        out = MLP(tuple(self.hidden_dims), K * opg, self.dropout)(
            sampled.reshape(B * N, -1), deterministic=deterministic)
        out = out.reshape(B, N, K, opg)

        depth_offset = self.param(
            "depth_offset", lambda _: jnp.asarray(-2.0, jnp.float32))

        result = fib_head_transform(
            out, depth, depth_offset,
            scale_bias=self.scale_bias, opacity_bias=self.opacity_bias,
            use_fresnel_zones=self.use_fresnel_zones,
            num_fresnel_zones=self.num_fresnel_zones,
            use_phase_output=self.use_phase_output,
            elevation=elevation, azimuth=azimuth)

        if self.use_pose_encoding and elevation is not None and azimuth is not None:
            emb = PoseEncoder(self.pose_embed_dim)(elevation, azimuth)
            mod = nn.Dense(1)(nn.relu(nn.Dense(64)(emb)))
            result["opacities"] = jnp.clip(
                result["opacities"] * (0.5 + jax.nn.sigmoid(mod)), 0, 1)

        if return_raw:
            result["raw"] = out
        return result
