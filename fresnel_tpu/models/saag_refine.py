"""SAAGRefinementNet (Experiment 1) and FeatureGuidedSAAG (Experiment 3).

Flax ports (reference: scripts/models/gaussian_decoder_models.py:424-570 and
1422-1490):
  * SAAGRefinementNet — sample features at projected Gaussian positions,
    MLP -> 16 residuals with learned per-type scales, exp-multiplicative
    scale update, delta-quaternion composition; returns residuals for
    regularization.
  * FeatureGuidedSAAG — 2-layer zero-initialized net predicting 6 tanh-
    bounded per-patch SAAG hyperparameter modulations.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from fresnel_tpu.core.gaussians import (
    quaternion_multiply, quaternion_normalize, rotation_6d_to_quaternion)
from fresnel_tpu.models.blocks import MLP, bilinear_sample


class SAAGRefinementNet(nn.Module):
    feature_dim: int = 384
    hidden_dims: Sequence[int] = (256, 128)
    residual_scale: float = 0.1
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        features: jax.Array,        # (B, 37, 37, C) NHWC
        saag_positions: jax.Array,  # (B, N, 3)
        saag_scales: jax.Array,     # (B, N, 3)
        saag_rotations: jax.Array,  # (B, N, 4)
        saag_colors: jax.Array,     # (B, N, 3)
        saag_opacities: jax.Array,  # (B, N)
        deterministic: bool = True,
    ) -> Dict[str, jax.Array]:
        # Project to [0,1] image coords (camera at origin, positions ~[-2,2]).
        z = jnp.maximum(saag_positions[..., 2:3], 0.1)
        pos2d = saag_positions[..., :2] / z
        pos01 = jnp.clip((pos2d + 2.0) / 4.0, 0.0, 1.0)

        sampled = jax.vmap(bilinear_sample)(features, pos01)  # (B, N, C)
        inputs = jnp.concatenate(
            [sampled, saag_positions, saag_scales, saag_rotations,
             saag_colors, saag_opacities[..., None]], -1)

        residuals = MLP(tuple(self.hidden_dims), 16, self.dropout)(
            inputs, deterministic=deterministic)

        pos_s = self.param("pos_scale", lambda _: jnp.asarray(0.05))
        sc_s = self.param("scale_scale", lambda _: jnp.asarray(0.1))
        col_s = self.param("color_scale", lambda _: jnp.asarray(0.1))
        op_s = self.param("opacity_scale", lambda _: jnp.asarray(0.1))

        pos_delta = residuals[..., 0:3] * pos_s * self.residual_scale
        scale_delta = residuals[..., 3:6] * sc_s * self.residual_scale
        rot_6d = residuals[..., 6:12]
        color_delta = residuals[..., 12:15] * col_s * self.residual_scale
        opacity_delta = residuals[..., 15:16] * op_s * self.residual_scale

        rot_delta = rotation_6d_to_quaternion(rot_6d)
        refined_rot = quaternion_normalize(
            quaternion_multiply(rot_delta, saag_rotations))

        return {
            "positions": saag_positions + pos_delta,
            "scales": saag_scales * jnp.exp(scale_delta),
            "rotations": refined_rot,
            "colors": jnp.clip(saag_colors + color_delta, 0.0, 1.0),
            "opacities": jnp.clip(
                saag_opacities + opacity_delta[..., 0], 0.0, 1.0),
            "residuals": {
                "pos_delta": pos_delta,
                "scale_delta": scale_delta,
                "color_delta": color_delta,
                "opacity_delta": opacity_delta,
            },
        }


class FeatureGuidedSAAG(nn.Module):
    feature_dim: int = 384
    num_params: int = 6
    hidden_dim: int = 64

    @nn.compact
    def __call__(self, features: jax.Array) -> Dict[str, jax.Array]:
        """(B, H, W, C) features -> per-patch SAAG modulation maps (B, H, W)."""
        h = nn.relu(nn.Dense(self.hidden_dim)(features))
        p = nn.Dense(self.num_params, kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros)(h)
        return {
            "aspect_ratio_mult": 1.0 + jnp.tanh(p[..., 0]) * 0.5,
            "edge_threshold_add": jnp.tanh(p[..., 1]) * 0.1,
            "edge_shrink_mult": 1.0 + jnp.tanh(p[..., 2]) * 0.3,
            "normal_strength_mult": 1.0 + jnp.tanh(p[..., 3]) * 0.3,
            "base_size_mult": 1.0 + jnp.tanh(p[..., 4]) * 0.5,
            "opacity_mult": 1.0 + jnp.tanh(p[..., 5]) * 0.3,
        }
