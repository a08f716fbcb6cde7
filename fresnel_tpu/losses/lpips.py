"""LPIPS perceptual distance in JAX (AlexNet backbone).

The reference uses the `lpips` pip package with pretrained AlexNet
(reference: scripts/training/train_gaussian_decoder.py:941-952).  Rebuilt here
as a Flax AlexNet feature stack + per-layer unit-normalize + 1x1 linear heads,
with a converter that ingests the official lpips/torchvision checkpoints when
a weight file is available on disk.

Offline environments without pretrained weights get availability-gating like
the reference's own model bridges (SURVEY.md §4): `load_lpips()` returns None
and the training harness drops the LPIPS term (logged).  For a self-contained
perceptual signal without any downloads, `random_lpips()` builds the same
stack with fixed randomly-initialized filters — random-feature perceptual
distances are a known reasonable proxy and keep the flag surface functional.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

# AlexNet conv stages: (out_channels, kernel, stride, padding)
_ALEX_CFG = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # maxpool after stages 0 and 1 (and after 4, unused here)

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
    """Full LPIPS head: normalized feature diffs -> 1x1 lin weights -> mean."""

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
            a = a / jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True) + 1e-10)
            diff = (a - b) ** 2                      # (B, C, h, w)
            w = self.param(f"lin{i}", nn.initializers.ones, (diff.shape[1],))
            # lpips lin layers are nonneg 1x1 convs; enforce with relu.
            lin = jnp.einsum("bchw,c->bhw", diff, jax.nn.relu(w))
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

    Accepts a .npz produced by `convert_torch_lpips` or a torch checkpoint
    (requires torch importable).
    """
    if weights_path is None or not os.path.exists(weights_path):
        return None
    model = LPIPS()
    dummy = jnp.zeros((1, 3, 64, 64), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), dummy, dummy)
    if weights_path.endswith(".npz"):
        data = dict(np.load(weights_path))
        params = _apply_flat_weights(params, data)
        return model.apply, params
    # torch checkpoint path
    flat = convert_torch_lpips(weights_path)
    params = _apply_flat_weights(params, flat)
    return model.apply, params


def _apply_flat_weights(params, flat):
    import flax

    p = flax.core.unfreeze(params)["params"]
    for key, val in flat.items():
        parts = key.split("/")
        node = p
        for part in parts[:-1]:
            node = node[part]
        node[parts[-1]] = jnp.asarray(val)
    return {"params": p}


def convert_torch_lpips(path: str):
    """Convert a torch LPIPS (alex) state dict into our flat naming.

    Torch conv weights are (O, I, kH, kW); Flax expects (kH, kW, I, O).
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    flat = {}
    conv_ids = [k for k in sd if "net" in k and k.endswith(".weight") and sd[k].ndim == 4
                and "lin" not in k]
    conv_ids.sort()
    for i, k in enumerate(conv_ids[:5]):
        w = sd[k].numpy().transpose(2, 3, 1, 0)
        flat[f"trunk/conv{i}/kernel"] = w
        bk = k.replace(".weight", ".bias")
        if bk in sd:
            flat[f"trunk/conv{i}/bias"] = sd[bk].numpy()
    lin_ids = sorted(k for k in sd if "lin" in k and k.endswith(".weight"))
    for i, k in enumerate(lin_ids[:5]):
        flat[f"lin{i}"] = sd[k].numpy().reshape(-1)
    return flat
