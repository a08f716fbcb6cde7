"""LPIPS perceptual distance in JAX (AlexNet backbone).

The reference uses the `lpips` pip package with pretrained AlexNet
(reference: scripts/training/train_gaussian_decoder.py:941-952).  Rebuilt here
as a Flax AlexNet feature stack + per-layer unit-normalize + 1x1 linear heads,
with a STRICT converter that ingests a full torch `lpips.LPIPS(net='alex')`
state dict (or a torchvision AlexNet features dict + lin weights) when a
weight file is available on disk.  Conversion is verified against a torch
mirror in tests/test_lpips.py to <=1e-5.

Offline environments without pretrained weights get availability-gating like
the reference's own model bridges (SURVEY.md §4): `load_lpips()` returns None
and the training harness drops the LPIPS term (logged).  For a self-contained
perceptual signal without any downloads, `random_lpips()` builds the same
stack with fixed randomly-initialized filters — random-feature perceptual
distances are a known reasonable proxy and keep the flag surface functional.
"""

from __future__ import annotations

import os
import re
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

# AlexNet conv stages: (out_channels, kernel, stride, padding) — torchvision
# alexnet.features convs at global indices 0, 3, 6, 8, 10.
_ALEX_CFG = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # maxpool after stages 0 and 1 (and after 4, unused here)

# lpips ScalingLayer constants (fixed buffers, not trained).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class AlexFeatures(nn.Module):
    """AlexNet conv trunk returning the 5 stage activations (NCHW in/out)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> Sequence[jax.Array]:
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC for TPU convs
        feats = []
        for i, (c, k, s, p) in enumerate(_ALEX_CFG):
            x = nn.Conv(c, (k, k), strides=(s, s), padding=[(p, p), (p, p)],
                        name=f"conv{i}")(x)
            x = nn.relu(x)
            feats.append(jnp.transpose(x, (0, 3, 1, 2)))
            if i in _POOL_AFTER:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    """Full LPIPS head: normalized feature diffs -> 1x1 lin weights -> mean.

    Matches `lpips.LPIPS(net='alex', spatial=False)` semantics: per-layer
    channel-unit-normalization x/(||x||+1e-10), squared difference, nonneg
    1x1 linear combination, spatial average, sum over layers.  Lin weights
    are clamped nonneg at LOAD time (the official weights already are), so
    the forward is exactly the torch computation."""

    @nn.compact
    def __call__(self, img1: jax.Array, img2: jax.Array) -> jax.Array:
        """img1/img2: (B, 3, H, W) in [-1, 1].  Returns (B,) distances."""
        shift = jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)
        scale = jnp.asarray(_SCALE).reshape(1, 3, 1, 1)
        x1 = (img1 - shift) / scale
        x2 = (img2 - shift) / scale

        trunk = AlexFeatures(name="trunk")
        f1 = trunk(x1)
        f2 = trunk(x2)

        total = 0.0
        for i, (a, b) in enumerate(zip(f1, f2)):
            a = a / (jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True)) + 1e-10)
            b = b / (jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True)) + 1e-10)
            diff = (a - b) ** 2                      # (B, C, h, w)
            w = self.param(f"lin{i}", nn.initializers.ones, (diff.shape[1],))
            lin = jnp.einsum("bchw,c->bhw", diff, w)
            total = total + jnp.mean(lin, axis=(1, 2))
        return total


def random_lpips(seed: int = 0):
    """Self-contained perceptual distance with fixed random filters.

    Returns (apply_fn(img1, img2) -> (B,), params).
    """
    model = LPIPS()
    dummy = jnp.zeros((1, 3, 64, 64), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), dummy, dummy)
    return model.apply, params


def load_lpips(weights_path: Optional[str] = None):
    """Load pretrained LPIPS weights if available; else None.

    Accepts a .npz produced by saving `convert_torch_lpips`'s output, or a
    torch checkpoint (full `lpips.LPIPS(net='alex')` state dict).  Loading
    is STRICT — every parameter must be filled or this raises."""
    if weights_path is None or not os.path.exists(weights_path):
        return None
    model = LPIPS()
    dummy = jnp.zeros((1, 3, 64, 64), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), dummy, dummy)
    if weights_path.endswith(".npz"):
        flat = dict(np.load(weights_path))
    else:
        flat = convert_torch_lpips(weights_path)
    from fresnel_tpu.models.vit import _apply_flat
    params, _ = _apply_flat(params, flat)
    return model.apply, params


def convert_torch_lpips(path: str) -> dict:
    """Convert a torch LPIPS (alex) state dict into our flat naming.

    Handles both naming families:
      * lpips pkg: net.slice{s}.{j}.weight convs (j = torchvision global
        index) + lin{i}.model.1.weight 1x1 heads (shape (1, C, 1, 1));
      * raw torchvision: features.{j}.weight convs (+ separate lin file not
        supported — all 10 tensors must be in one dict).
    Torch conv weights are (O, I, kH, kW); Flax expects (kH, kW, I, O).
    Conv ordering is by NUMERIC torchvision index (0, 3, 6, 8, 10), not
    string sort.  Lin weights are clamped nonneg (they are in the official
    checkpoint; clamping makes the invariant explicit)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v for k, v in sd.items() if hasattr(v, "numpy")}

    convs = {}
    for k, v in sd.items():
        m = re.match(r"^(?:net\.slice\d+|features)\.(\d+)\.(weight|bias)$", k)
        if m and (m.group(2) == "bias" or v.ndim == 4):
            convs.setdefault(int(m.group(1)), {})[m.group(2)] = v.numpy()
    if len(convs) != 5:
        raise ValueError(
            f"expected 5 AlexNet convs in {path}, found indices "
            f"{sorted(convs)} — not an lpips-alex checkpoint")
    flat = {}
    for i, j in enumerate(sorted(convs)):
        entry = convs[j]
        flat[f"trunk/conv{i}/kernel"] = entry["weight"].transpose(2, 3, 1, 0)
        flat[f"trunk/conv{i}/bias"] = entry["bias"]
        expect_c = _ALEX_CFG[i][0]
        if flat[f"trunk/conv{i}/kernel"].shape[-1] != expect_c:
            raise ValueError(
                f"conv{i} has {flat[f'trunk/conv{i}/kernel'].shape[-1]} "
                f"channels, expected {expect_c}")

    lins = {}
    for k, v in sd.items():
        m = re.match(r"^lins?\.?(\d+)(?:\.model\.1)?\.weight$", k)
        if m:
            lins[int(m.group(1))] = v.numpy().reshape(-1)
    if sorted(lins) != [0, 1, 2, 3, 4]:
        raise ValueError(
            f"expected lin0..lin4 in {path}, found {sorted(lins)}")
    for i in range(5):
        flat[f"lin{i}"] = np.maximum(lins[i], 0.0)
    return flat
