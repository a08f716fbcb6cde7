"""Consistency View Synthesizer (CVS): one-step novel-view generation.

Flax rebuild of the reference's from-scratch consistency model (reference:
scripts/models/consistency_view_synthesis.py):
  * U-Net: base 128, channel mult (1,2,3,4), 2 res blocks/level, attention at
    16/8 spatial sizes, GroupNorm(32) + SiLU, time embedding MLP, pose
    injected at the bottleneck (:477-676);
  * FresnelWaveAttention — self-attention modulated by a cosine interference
    pattern over pairwise pixel distances with a learnable wavelength
    (:191-247);
  * PluckerPoseEncoder — 6D rotation + translation + Plücker ray (15D) ->
    16 learnable query tokens (:318-413);
  * ImageFeatureAdapter — DINOv2 tokens + learnable positions, compressed to
    256 tokens by cross-attention (:416-475);
  * cosine DDPM schedule, x0-prediction, 1-to-4-step generation (:679-841).

Images are NCHW at the API boundary (reference parity); convs run NHWC
internally (TPU layout).  The U-Net skip wiring is re-derived from the spec
(standard encoder/decoder skips), not a line copy.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np


@dataclasses.dataclass(frozen=True)
class CVSConfig:
    image_size: int = 256
    base_channels: int = 128
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4)
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (16, 8)
    pose_embed_dim: int = 256
    image_embed_dim: int = 384
    cross_attention_dim: int = 384
    time_embed_dim: int = 256
    num_timesteps: int = 1000
    ema_decay: float = 0.9999
    num_image_tokens: int = 256
    # Concatenate the input view to the U-Net input (6 channels instead of
    # 3).  The reference conditions ONLY through cross-attention tokens
    # (consistency_view_synthesis.py:755-769 — input_image is unused by the
    # net); at t≈max that conditioning is too weak and one-step generation
    # collapses to the conditional mean (T-034).  Off by default = exact
    # reference parity; on = the TPU rebuild's stronger conditioning arm.
    concat_input_view: bool = False
    # Computation dtype for the U-Net / adapters (flax convention: params
    # stay float32, layers cast to `dtype` for compute).  bfloat16 here is
    # the TPU mixed-precision fast path (--use_amp).
    dtype: Optional[Any] = None

    @property
    def channels(self):
        return tuple(self.base_channels * m for m in self.channel_mult)


def cosine_beta_schedule(num_timesteps: int) -> jnp.ndarray:
    """Improved-DDPM cosine schedule."""
    s = 0.008
    t = np.linspace(0, num_timesteps, num_timesteps + 1)
    ac = np.cos((t / num_timesteps + s) / (1 + s) * np.pi / 2) ** 2
    ac = ac / ac[0]
    betas = 1 - ac[1:] / ac[:-1]
    return jnp.asarray(np.clip(betas, 0.0001, 0.9999), jnp.float32)


def sinusoidal_embed(t: jax.Array, dim: int) -> jax.Array:
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / half)
    args = t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class ResBlock(nn.Module):
    out_channels: int
    time_embed_dim: int
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, t_emb, deterministic: bool = True):
        """x: (B, H, W, C) NHWC."""
        dt = self.dtype
        in_ch = x.shape[-1]
        h = nn.silu(nn.GroupNorm(num_groups=32, dtype=dt)(x))
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=dt)(h)
        temb = nn.Dense(self.out_channels, dtype=dt)(nn.silu(t_emb))
        h = h + temb[:, None, None, :]
        h = nn.silu(nn.GroupNorm(num_groups=32, dtype=dt)(h))
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=dt)(h)
        skip = (nn.Conv(self.out_channels, (1, 1), dtype=dt)(x)
                if in_ch != self.out_channels else x)
        return h + skip


class CrossAttention2D(nn.Module):
    """Spatial queries attend to a token context."""

    heads: int = 8
    dim_head: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x, context):
        """x: (B, H, W, C); context: (B, M, D)."""
        dt = self.dtype
        B, H, W, C = x.shape
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=dt)(x.reshape(B, H * W, C))
        k = nn.Dense(inner, use_bias=False, dtype=dt)(context)
        v = nn.Dense(inner, use_bias=False, dtype=dt)(context)
        q = q.reshape(B, H * W, self.heads, self.dim_head)
        k = k.reshape(B, -1, self.heads, self.dim_head)
        v = v.reshape(B, -1, self.heads, self.dim_head)
        attn = jax.nn.softmax(
            jnp.einsum("bnhd,bmhd->bhnm", q, k) * self.dim_head ** -0.5, -1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, H * W, inner)
        return nn.Dense(C, dtype=dt)(out).reshape(B, H, W, C)


class FresnelWaveAttention(nn.Module):
    """Self-attention + cosine interference over pairwise pixel distances."""

    heads: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        B, H, W, C = x.shape
        dh = C // self.heads
        qkv = nn.Dense(3 * C, use_bias=False, dtype=dt)(x.reshape(B, H * W, C))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, H * W, self.heads, dh)
        k = k.reshape(B, H * W, self.heads, dh)
        v = v.reshape(B, H * W, self.heads, dh)
        dots = jnp.einsum("bnhd,bmhd->bhnm", q, k) * dh ** -0.5

        wavelength = self.param("wavelength",
                                lambda _: jnp.asarray(0.1, jnp.float32))
        ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                              jnp.arange(W, dtype=jnp.float32), indexing="ij")
        pos = jnp.stack([ys.ravel(), xs.ravel()], -1)        # (HW, 2)
        diff = pos[:, None, :] - pos[None, :, :]
        dist = jnp.sqrt(jnp.sum(diff * diff, -1) + 1e-8)
        phase = 2.0 * jnp.pi * dist / (jnp.abs(wavelength) * H + 1e-6)
        # The interference bias is cast to the activation dtype so an fp32
        # bias doesn't silently upcast the whole attention under bf16.
        dots = dots + (jnp.cos(phase)[None, None] * 0.1).astype(dots.dtype)

        attn = jax.nn.softmax(dots, -1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, H * W, C)
        return nn.Dense(C, dtype=dt)(out).reshape(B, H, W, C)


class AttentionBlock(nn.Module):
    use_fresnel: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, context):
        dt = self.dtype
        h = nn.GroupNorm(num_groups=32, dtype=dt)(x)
        if self.use_fresnel:
            h = FresnelWaveAttention(dtype=dt)(h)
        else:
            h = CrossAttention2D(dtype=dt)(
                h, h.reshape(h.shape[0], -1, h.shape[-1]))
        x = x + h
        h = nn.GroupNorm(num_groups=32, dtype=dt)(x)
        return x + CrossAttention2D(dtype=dt)(h, context)


class PluckerPoseEncoder(nn.Module):
    embed_dim: int = 256
    cross_attention_dim: int = 384
    num_queries: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, R_rel: jax.Array, t_rel: jax.Array) -> jax.Array:
        """(B,3,3), (B,3) -> (B, 16, cross_attention_dim)."""
        dt = self.dtype
        B = R_rel.shape[0]
        r6d = R_rel[:, :, :2].reshape(B, 6)
        d = t_rel / jnp.maximum(
            jnp.linalg.norm(t_rel, axis=-1, keepdims=True), 1e-8)
        m = jnp.cross(jnp.zeros_like(t_rel), d)
        plucker = jnp.concatenate([d, m], -1)
        raw = jnp.concatenate([r6d, t_rel, plucker], -1)     # (B, 15)
        h = nn.silu(nn.Dense(128, dtype=dt)(raw))
        h = nn.silu(nn.Dense(256, dtype=dt)(h))
        h = nn.LayerNorm(dtype=dt)(nn.Dense(self.embed_dim, dtype=dt)(h))
        pose = nn.Dense(self.cross_attention_dim, dtype=dt)(h)
        queries = self.param(
            "pose_queries", nn.initializers.normal(0.02),
            (self.num_queries, self.cross_attention_dim))
        return queries.astype(pose.dtype)[None] + pose[:, None, :]


class ImageFeatureAdapter(nn.Module):
    in_dim: int = 384
    out_dim: int = 384
    num_tokens: int = 256
    grid_tokens: int = 1369
    dtype: Any = None

    @nn.compact
    def __call__(self, features: jax.Array) -> jax.Array:
        """(B, 37, 37, C) -> (B, num_tokens, out_dim)."""
        dt = self.dtype
        B = features.shape[0]
        x = features.reshape(B, -1, features.shape[-1])
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (self.grid_tokens, self.in_dim))
        x = x + pos[: x.shape[1]][None]
        x = nn.silu(nn.Dense(self.out_dim, dtype=dt)(x))
        x = nn.LayerNorm(dtype=dt)(nn.Dense(self.out_dim, dtype=dt)(x))
        queries = self.param("compress_queries", nn.initializers.normal(0.02),
                             (self.num_tokens, self.out_dim))
        q = jnp.broadcast_to(queries.astype(x.dtype)[None],
                             (B,) + queries.shape)
        return nn.MultiHeadDotProductAttention(num_heads=8, dtype=dt)(q, x, x)


class ConsistencyUNet(nn.Module):
    config: CVSConfig

    @nn.compact
    def __call__(self, x, t, image_cond, pose_cond,
                 deterministic: bool = True):
        """x: (B, C, H, W) noisy image (C=3, or 6 with concat_input_view);
        t: (B,) timesteps.  Returns x0 prediction (B, 3, H, W)."""
        cfg = self.config
        dt = cfg.dtype
        x = jnp.transpose(x, (0, 2, 3, 1))                   # NHWC

        t_emb = sinusoidal_embed(t, cfg.time_embed_dim)
        t_emb = nn.Dense(cfg.time_embed_dim * 4, dtype=dt)(t_emb)
        t_emb = nn.Dense(cfg.time_embed_dim, dtype=dt)(nn.silu(t_emb))

        h = nn.Conv(cfg.base_channels, (3, 3), padding="SAME", dtype=dt)(x)
        res = cfg.image_size
        skips = []

        # Encoder: one skip per level, downsample between levels.
        for i, ch in enumerate(cfg.channels):
            for _ in range(cfg.num_res_blocks):
                h = ResBlock(ch, cfg.time_embed_dim, dtype=dt)(
                    h, t_emb, deterministic)
            if res in cfg.attention_resolutions:
                h = AttentionBlock(dtype=dt)(h, image_cond)
            skips.append(h)
            if i < len(cfg.channels) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                            dtype=dt)(h)
                res //= 2

        # Middle with pose injection.
        mid = cfg.channels[-1]
        h = ResBlock(mid, cfg.time_embed_dim, dtype=dt)(h, t_emb, deterministic)
        h = AttentionBlock(dtype=dt)(h, image_cond)
        pose_feat = nn.Dense(mid, dtype=dt)(jnp.mean(pose_cond, axis=1))
        h = h + pose_feat[:, None, None, :]
        h = AttentionBlock(dtype=dt)(h, pose_cond)
        h = ResBlock(mid, cfg.time_embed_dim, dtype=dt)(h, t_emb, deterministic)

        # Decoder: pop the matching-resolution skip, upsample between levels.
        for i, ch in enumerate(reversed(cfg.channels)):
            skip = skips.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            for _ in range(cfg.num_res_blocks):
                h = ResBlock(ch, cfg.time_embed_dim, dtype=dt)(
                    h, t_emb, deterministic)
            if res in cfg.attention_resolutions:
                h = AttentionBlock(dtype=dt)(h, image_cond)
            if i < len(cfg.channels) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
                h = nn.Conv(C, (3, 3), padding="SAME", dtype=dt)(h)
                res *= 2

        h = nn.silu(nn.GroupNorm(num_groups=32, dtype=dt)(
            nn.Conv(cfg.base_channels, (3, 3), padding="SAME", dtype=dt)(h)))
        # Output head in float32: the x0 prediction feeds fp32 loss math.
        out = nn.Conv(3, (3, 3), padding="SAME")(h.astype(jnp.float32))
        return jnp.transpose(out, (0, 3, 1, 2))              # NCHW


class ConsistencyViewSynthesizer(nn.Module):
    config: CVSConfig = CVSConfig()

    def setup(self):
        cfg = self.config
        self.image_adapter = ImageFeatureAdapter(
            in_dim=cfg.image_embed_dim, out_dim=cfg.cross_attention_dim,
            num_tokens=cfg.num_image_tokens, dtype=cfg.dtype)
        self.pose_encoder = PluckerPoseEncoder(
            embed_dim=cfg.pose_embed_dim,
            cross_attention_dim=cfg.cross_attention_dim, dtype=cfg.dtype)
        self.unet = ConsistencyUNet(cfg)

    def schedule(self):
        betas = cosine_beta_schedule(self.config.num_timesteps)
        alphas_cumprod = jnp.cumprod(1.0 - betas)
        return {
            "betas": betas,
            "alphas_cumprod": alphas_cumprod,
            "sqrt_alphas_cumprod": jnp.sqrt(alphas_cumprod),
            "sqrt_one_minus_alphas_cumprod": jnp.sqrt(1.0 - alphas_cumprod),
        }

    def add_noise(self, x, t, noise):
        sch = self.schedule()
        sa = sch["sqrt_alphas_cumprod"][t][:, None, None, None]
        so = sch["sqrt_one_minus_alphas_cumprod"][t][:, None, None, None]
        return sa * x + so * noise

    def _unet_in(self, x_t, input_image):
        """U-Net input: the (noisy) sample, optionally with the input view
        concatenated on channels (config.concat_input_view)."""
        if self.config.concat_input_view:
            return jnp.concatenate([x_t, input_image], axis=1)
        return x_t

    def __call__(self, input_image, input_features, R_rel, t_rel,
                 target_image=None, timestep=None, noise=None,
                 deterministic: bool = True) -> Dict[str, jax.Array]:
        B = input_image.shape[0]
        image_cond = self.image_adapter(input_features)
        pose_cond = self.pose_encoder(R_rel, t_rel)

        if target_image is not None:
            assert timestep is not None and noise is not None, (
                "training mode requires explicit timestep and noise (traced "
                "randomness comes from the caller)")
            noisy = self.add_noise(target_image, timestep, noise)
            x0_pred = self.unet(self._unet_in(noisy, input_image),
                                timestep.astype(jnp.float32),
                                image_cond, pose_cond, deterministic)
            return {"x0_pred": x0_pred, "target": target_image,
                    "noisy": noisy, "noise": noise, "timestep": timestep}
        assert noise is not None, "inference requires a noise sample"
        t = jnp.full((B,), self.config.num_timesteps - 1, jnp.float32)
        x0_pred = self.unet(self._unet_in(noise, input_image), t,
                            image_cond, pose_cond, deterministic)
        return {"generated": x0_pred}

    def predict_x0(self, input_image, input_features, R_rel, t_rel,
                   x_t, timestep, deterministic: bool = True) -> jax.Array:
        """Run the U-Net on an ALREADY-noisy sample x_t — no re-noising.

        The consistency branch needs exactly this: the reference calls
        `ema_model.unet(x_t_prev, t_prev, ...)` directly
        (consistency_view_synthesis.py:929-933).  Routing x_t_prev through
        the training path's add_noise would rescale it by
        sqrt_alphas_cumprod[t] (≈0 at high t), silently turning the EMA
        target into the unconditional mean."""
        image_cond = self.image_adapter(input_features)
        pose_cond = self.pose_encoder(R_rel, t_rel)
        return self.unet(self._unet_in(x_t, input_image),
                         timestep.astype(jnp.float32),
                         image_cond, pose_cond, deterministic)

    def generate(self, input_features, R_rel, t_rel, noise,
                 num_steps: int = 1, extra_noise=None,
                 input_image=None) -> jax.Array:
        """Multi-step refinement; noise (B, 3, S, S).  extra_noise:
        (num_steps-1, B, 3, S, S) for the intermediate perturbations.
        input_image is required when config.concat_input_view."""
        B = noise.shape[0]
        if self.config.concat_input_view and input_image is None:
            raise ValueError("concat_input_view model: generate() needs "
                             "the input view image")
        image_cond = self.image_adapter(input_features)
        pose_cond = self.pose_encoder(R_rel, t_rel)
        sch = self.schedule()
        nt = self.config.num_timesteps
        z = noise
        ts = np.linspace(nt - 1, 0, num_steps + 1).astype(np.int32)
        for i in range(num_steps):
            t = jnp.full((B,), float(ts[i]), jnp.float32)
            z_in = z
            if self.config.concat_input_view:
                z_in = jnp.concatenate([z, input_image], axis=1)
            z = self.unet(z_in, t, image_cond, pose_cond, True)
            if i < num_steps - 1 and extra_noise is not None:
                scale = sch["sqrt_one_minus_alphas_cumprod"][ts[i + 1]]
                z = z + scale * extra_noise[i] * 0.5
        return z


def get_relative_pose(R_source, t_source, R_target, t_target):
    """Relative camera pose from source to target (reference :963-988)."""
    R_rel = jnp.einsum("bij,bkj->bik", R_target, R_source)
    t_rel = t_target - jnp.einsum("bij,bj->bi", R_rel, t_source)
    return R_rel, t_rel
