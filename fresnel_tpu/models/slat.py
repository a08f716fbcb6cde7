"""Fresnel v2 sparse-voxel decoders (TRELLIS distillation students).

Flax ports of the reference v2 models (reference:
scripts/models/direct_slat_decoder.py):
  * PositionalEncoding3D — learnable per-axis embeddings over a 64³ grid
    (:24-60).
  * DirectSLatDecoder — sparse transformer (~15-20M params): DINOv2 context
    cross-attention, 3D pos-encoded voxel queries, 6 pre-norm blocks,
    OccupancyHead BCE-gated emission, GaussianHead with learnable position-
    offset scale and scale factor, 8 Gaussians/voxel (:361-556).
  * MLPSLatDecoder — per-voxel MLP baseline (:559-626).
  * DirectStructurePredictor — replaces TRELLIS stage-1 diffusion: 2D->3D
    conv stack predicting a dense occupancy grid (:628-716).

TPU-native deviations: attention is a single fused dot-product (no chunked
query loops — XLA tiles it); occupancy gating at inference returns the FULL
static-shape Gaussian set plus a boolean mask instead of variable-length
per-batch lists; remat (jax.checkpoint) replaces torch gradient checkpointing.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


class PositionalEncoding3D(nn.Module):
    d_model: int
    max_resolution: int = 64

    @nn.compact
    def __call__(self, coords: jax.Array) -> jax.Array:
        """coords (..., 4) [batch_idx, x, y, z] -> (..., d_model)."""
        third = self.d_model // 3
        dims = (third, third, self.d_model - 2 * third)
        outs = []
        for axis, d in zip((1, 2, 3), dims):
            idx = jnp.clip(coords[..., axis].astype(jnp.int32), 0,
                           self.max_resolution - 1)
            emb = nn.Embed(self.max_resolution, d,
                           embedding_init=nn.initializers.normal(0.02),
                           name=f"pos_embed_{'xyz'[axis - 1]}")(idx)
            outs.append(emb)
        return jnp.concatenate(outs, axis=-1)


class CrossAttention(nn.Module):
    """Voxel queries attend to image-feature context."""

    dim: int
    num_heads: int = 8
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, context, mask=None, deterministic: bool = True):
        B, N, D = x.shape
        M = context.shape[1]
        h = self.num_heads
        hd = D // h
        q = nn.Dense(D, name="q", dtype=self.dtype)(x).reshape(B, N, h, hd)
        kv = nn.Dense(2 * D, name="kv", dtype=self.dtype)(
            context).reshape(B, M, 2, h, hd)
        k, v = kv[:, :, 0], kv[:, :, 1]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (hd ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, D)
        out = nn.Dense(D, name="proj", dtype=self.dtype)(out)
        if mask is not None:
            out = out * mask[..., None]
        return out


class SelfAttention(nn.Module):
    dim: int
    num_heads: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask=None):
        B, N, D = x.shape
        h = self.num_heads
        hd = D // h
        qkv = nn.Dense(3 * D, name="qkv", dtype=self.dtype)(
            x).reshape(B, N, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (hd ** -0.5)
        if mask is not None:
            # Cast the additive mask to the attention dtype: an fp32 bias
            # would silently upcast the whole block under bf16 compute.
            bias = jnp.where(mask[:, None, None, :], 0.0, -1e9)
            attn = attn + bias.astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, D)
        return nn.Dense(D, name="proj", dtype=self.dtype)(out)


class SparseTransformerBlock(nn.Module):
    dim: int
    num_heads: int = 8
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, context, mask=None, deterministic: bool = True):
        # Pre-norm blocks: LayerNorm(dtype) casts into bf16 before each
        # matmul; the residual stream stays in the caller's precision.
        dt = self.dtype
        x = x + SelfAttention(self.dim, self.num_heads, dtype=dt)(
            nn.LayerNorm(dtype=dt)(x), mask)
        x = x + CrossAttention(self.dim, self.num_heads, dtype=dt)(
            nn.LayerNorm(dtype=dt)(x), context, mask, deterministic)
        h = nn.LayerNorm(dtype=dt)(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=dt)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=dt)(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return x + h


class OccupancyHead(nn.Module):
    hidden_dim: int = 512

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.relu(nn.Dense(self.hidden_dim // 2)(x))
        return nn.Dense(1, kernel_init=nn.initializers.normal(0.01),
                        bias_init=nn.initializers.zeros)(h)[..., 0]


class GaussianHead(nn.Module):
    """Voxel features -> (B, N*G, 14) Gaussians with learnable offset scale
    and scale factor; activations mirror the reference exactly."""

    hidden_dim: int = 256
    num_gaussians_per_voxel: int = 8
    init_offset_scale: float = 0.5
    grid_resolution: int = 64

    @nn.compact
    def __call__(self, x: jax.Array, coords: jax.Array) -> jax.Array:
        B, N, _ = x.shape
        G = self.num_gaussians_per_voxel
        h = nn.gelu(nn.Dense(self.hidden_dim)(x))
        h = nn.gelu(nn.Dense(self.hidden_dim)(h))
        raw = nn.Dense(G * 14, kernel_init=nn.initializers.normal(0.01),
                       bias_init=nn.initializers.zeros)(h)
        raw = jnp.clip(raw, -10.0, 10.0).reshape(B, N, G, 14)

        offset_scale = self.param(
            "position_offset_scale",
            lambda _: jnp.asarray(self.init_offset_scale, jnp.float32))
        scale_factor = self.param(
            "scale_factor", lambda _: jnp.asarray(0.01, jnp.float32))

        centers = jnp.clip(coords[..., 1:4].astype(jnp.float32), 0,
                           self.grid_resolution - 1)
        centers = centers / self.grid_resolution * 2.0 - 1.0
        centers = centers[:, :, None, :]

        pos = jnp.clip(centers + jnp.tanh(raw[..., :3]) * offset_scale,
                       -1.0, 1.0)
        scale = jnp.clip(jax.nn.softplus(raw[..., 3:6]) * jnp.abs(scale_factor),
                         1e-4, 1.0)
        quat = raw[..., 6:10]
        quat = quat / jnp.maximum(
            jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-6)
        color = jax.nn.sigmoid(raw[..., 10:13])
        opacity = jax.nn.sigmoid(raw[..., 13:14])
        g = jnp.concatenate([pos, scale, quat, color, opacity], axis=-1)
        return g.reshape(B, N * G, 14)


class DirectSLatDecoder(nn.Module):
    feature_dim: int = 1024
    hidden_dim: int = 512
    num_layers: int = 6
    num_heads: int = 8
    num_gaussians_per_voxel: int = 8
    max_resolution: int = 64
    dropout: float = 0.1
    use_checkpoint: bool = False
    predict_occupancy: bool = True
    occupancy_threshold: float = 0.5
    # bf16 computation dtype for the transformer stack (params stay fp32;
    # heads always compute fp32) — the TPU equivalent of the reference's
    # AMP autocast in this model's trainer.
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        features: jax.Array,              # (B, num_patches, feature_dim)
        coords: jax.Array,                # (B, N, 4) [batch_idx, x, y, z]
        coord_mask: Optional[jax.Array] = None,   # (B, N) bool
        apply_occupancy_mask: bool = False,
        deterministic: bool = True,
    ) -> Dict[str, jax.Array]:
        B, N, _ = coords.shape
        features = jnp.nan_to_num(features, nan=0.0, posinf=1.0, neginf=-1.0)
        coords = coords.at[..., 1:4].set(
            jnp.clip(coords[..., 1:4], 0, self.max_resolution - 1))

        context = nn.Dense(self.hidden_dim, name="feature_proj",
                           dtype=self.dtype)(features)
        pos = PositionalEncoding3D(self.hidden_dim, self.max_resolution)(coords)
        voxel_embed = self.param(
            "voxel_embed", nn.initializers.normal(0.02),
            (1, 1, self.hidden_dim))
        x = voxel_embed + pos

        BlockCls = (nn.remat(SparseTransformerBlock, static_argnums=(4,))
                    if self.use_checkpoint else SparseTransformerBlock)
        for i in range(self.num_layers):
            x = BlockCls(self.hidden_dim, self.num_heads,
                         dropout=self.dropout, dtype=self.dtype,
                         name=f"block_{i}")(
                             x, context, coord_mask, deterministic)
        # Final norm + heads in fp32 (position/opacity precision matters).
        x = nn.LayerNorm()(x.astype(jnp.float32))

        result: Dict[str, jax.Array] = {}
        gaussians = GaussianHead(
            self.hidden_dim, self.num_gaussians_per_voxel,
            grid_resolution=self.max_resolution, name="gaussian_head")(
                x, coords)
        result["gaussians"] = gaussians

        if self.predict_occupancy:
            logits = OccupancyHead(self.hidden_dim)(x)          # (B, N)
            result["occupancy_logits"] = logits
            if apply_occupancy_mask:
                # Static-shape gating: a per-GAUSSIAN boolean mask instead of
                # the reference's variable-length per-batch lists.
                occ = jax.nn.sigmoid(logits) > self.occupancy_threshold
                if coord_mask is not None:
                    occ = occ & coord_mask.astype(bool)
                result["occupancy_mask"] = occ
                g_mask = jnp.repeat(occ, self.num_gaussians_per_voxel, axis=1)
                result["gaussian_mask"] = g_mask
                result["n_gaussians"] = jnp.sum(g_mask, axis=1)
        return result


class MLPSLatDecoder(nn.Module):
    """Per-voxel MLP baseline: positional encoding + pooled image feature."""

    feature_dim: int = 1024
    hidden_dim: int = 512
    num_gaussians_per_voxel: int = 8
    max_resolution: int = 64

    @nn.compact
    def __call__(self, features: jax.Array, coords: jax.Array,
                 coord_mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> Dict[str, jax.Array]:
        B, N, _ = coords.shape
        pooled = jnp.mean(features, axis=1)                    # (B, feature_dim)
        pooled = nn.Dense(self.hidden_dim)(pooled)
        pos = PositionalEncoding3D(self.hidden_dim, self.max_resolution)(coords)
        x = pos + pooled[:, None, :]
        x = nn.gelu(nn.Dense(self.hidden_dim)(x))
        x = nn.gelu(nn.Dense(self.hidden_dim)(x))
        gaussians = GaussianHead(
            self.hidden_dim, self.num_gaussians_per_voxel,
            grid_resolution=self.max_resolution)(x, coords)
        logits = OccupancyHead(self.hidden_dim)(x)
        return {"gaussians": gaussians, "occupancy_logits": logits}


class DirectStructurePredictor(nn.Module):
    """Image features -> dense occupancy grid (replaces TRELLIS stage 1)."""

    feature_dim: int = 1024
    hidden_dim: int = 256
    resolution: int = 64
    threshold: float = 0.5

    @nn.compact
    def __call__(self, features: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """features (B, P, F) -> (occupancy (B, D, D, D) probs,
        logits (B, D, D, D))."""
        B, P, _ = features.shape
        side = int(round(P ** 0.5))
        D = self.resolution
        dch = self.hidden_dim // 4

        x = nn.gelu(nn.Dense(self.hidden_dim)(features))
        x = x.reshape(B, side, side, self.hidden_dim)          # NHWC
        x = nn.Conv(self.hidden_dim, (3, 3), padding="SAME")(x)
        x = nn.gelu(nn.GroupNorm(num_groups=8)(x))
        x = nn.Conv(dch * D, (1, 1))(x)                        # (B, s, s, dch*D)
        x = x.reshape(B, side, side, D, dch)
        x = jnp.transpose(x, (0, 3, 1, 2, 4))                  # (B, D, s, s, dch)
        x = jax.image.resize(x, (B, D, D, D, dch), "trilinear")
        x = nn.Conv(self.hidden_dim, (3, 3, 3), padding="SAME")(x)
        x = nn.gelu(nn.GroupNorm(num_groups=8)(x))
        x = nn.Conv(self.hidden_dim // 2, (3, 3, 3), padding="SAME")(x)
        x = nn.gelu(nn.GroupNorm(num_groups=8)(x))
        logits = nn.Conv(1, (1, 1, 1))(x)[..., 0]              # (B, D, D, D)
        return jax.nn.sigmoid(logits), logits


def occupancy_to_coords(occupancy: jax.Array, max_coords: int,
                        threshold: float = 0.5):
    """Dense (D, D, D) occupancy -> static (max_coords, 4) [b=0, x, y, z]
    coords + validity mask, taking the top-probability voxels."""
    D = occupancy.shape[-1]
    flat = occupancy.reshape(-1)
    vals, idx = jax.lax.top_k(flat, max_coords)
    x = idx // (D * D)
    y = (idx // D) % D
    z = idx % D
    coords = jnp.stack([jnp.zeros_like(x), x, y, z], axis=-1)
    return coords.astype(jnp.int32), vals > threshold
