"""Learned Fresnel edge detector (depth-discontinuity strength in [0,1]).

Flax port of the reference's small conv net with optional Sobel depth-gradient
input channels (reference: scripts/utils/fresnel_zones.py:1084-1160).
Channels-last (NHWC) — the TPU-native layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from fresnel_tpu.physics.fresnel_zones import sobel_gradients


class FresnelEdgeDetector(nn.Module):
    hidden_channels: int = 16
    use_depth_gradients: bool = True

    @nn.compact
    def __call__(self, depth: jax.Array) -> jax.Array:
        """depth: (B, H, W) or (B, H, W, 1) -> edge strength (B, H, W, 1)."""
        if depth.ndim == 3:
            depth = depth[..., None]
        x = depth
        if self.use_depth_gradients:
            d2 = depth[..., 0]
            gx, gy = sobel_gradients(d2)
            x = jnp.concatenate([depth, gx[..., None], gy[..., None]], axis=-1)
        x = nn.relu(nn.Conv(self.hidden_channels, (3, 3), padding="SAME")(x))
        x = nn.relu(nn.Conv(self.hidden_channels, (3, 3), padding="SAME")(x))
        x = nn.Conv(1, (3, 3), padding="SAME")(x)
        return nn.sigmoid(x)
