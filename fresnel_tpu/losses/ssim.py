"""SSIM / MS-SSIM in pure jnp.

Standard Wang et al. SSIM with an 11-tap Gaussian window (sigma 1.5) and the
usual K1=0.01, K2=0.03 stabilizers — the same formulation the reference
consumes through pytorch_msssim (reference:
scripts/training/train_gaussian_decoder.py:901-907).  Implemented as a
depthwise convolution so XLA fuses it into the training step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(size: int, sigma: float):
    # Host-side numpy; converted at use site.  Deliberately NOT cached:
    # caching a jnp constant created under an active trace leaks tracers.
    x = np.arange(size, dtype=np.float32) - (size - 1) / 2.0
    g = np.exp(-(x * x) / (2.0 * sigma * sigma))
    g = g / np.sum(g)
    return jnp.asarray(np.outer(g, g))


def _filter2d(img: jax.Array, window: jax.Array) -> jax.Array:
    """Depthwise valid-conv of (B, C, H, W) with a (k, k) window.

    Precision=HIGHEST is load-bearing on TPU: the default lowers f32 convs
    to bf16 multiplies, whose ~1e-2 relative error destroys the
    E[x^2] - E[x]^2 cancellation in the variance terms (C2 = 9e-4) and
    produced SSIM values as far out of range as -7.4 on smooth images —
    which silently corrupted SSIM losses/metrics and once flipped a
    best-checkpoint selection (total loss -1.28, experiments/README.md
    T-017)."""
    B, C, H, W = img.shape
    k = window.shape[0]
    kernel = jnp.broadcast_to(window[None, None], (C, 1, k, k))
    return jax.lax.conv_general_dilated(
        img, kernel, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST)


def ssim(
    img1: jax.Array,
    img2: jax.Array,
    data_range: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
    size_average: bool = True,
) -> jax.Array:
    """SSIM between (B, C, H, W) images (or (C, H, W), auto-batched)."""
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    # Images smaller than the window would make the VALID conv empty (NaN
    # mean); shrink the window to the largest odd size that fits.
    min_side = min(img1.shape[-2], img1.shape[-1])
    if min_side < window_size:
        window_size = max(1, min_side - (min_side + 1) % 2)
    w = _gaussian_window(window_size, sigma)
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2

    mu1 = _filter2d(img1, w)
    mu2 = _filter2d(img2, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    # True variances are nonnegative; clamp away residual f32 cancellation
    # noise (pytorch_msssim applies the same relu).
    sigma1_sq = jnp.maximum(_filter2d(img1 * img1, w) - mu1_sq, 0.0)
    sigma2_sq = jnp.maximum(_filter2d(img2 * img2, w) - mu2_sq, 0.0)
    sigma12 = _filter2d(img1 * img2, w) - mu12

    ssim_map = ((2 * mu12 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def ssim_loss(img1: jax.Array, img2: jax.Array, data_range: float = 1.0) -> jax.Array:
    return 1.0 - ssim(img1, img2, data_range=data_range)


def ms_ssim(
    img1: jax.Array,
    img2: jax.Array,
    data_range: float = 1.0,
    weights=(0.0448, 0.2856, 0.3001, 0.2363, 0.1333),
    window_size: int = 11,
) -> jax.Array:
    """Multi-scale SSIM (up to 5 dyadic scales, standard weights).

    Levels whose downsampled image would be smaller than the window are
    dropped and the remaining weights renormalized (pytorch_msssim instead
    asserts size > (win-1)*2^4; training at 64-128 px needs the graceful
    version — a 128 input's 5th level is 8 px, smaller than the 11-tap
    window, and produced an empty VALID conv -> NaN, T-017)."""
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    min_side = min(img1.shape[-2], img1.shape[-1])
    if min_side < window_size:   # level 0 must fit too (see ssim())
        window_size = max(1, min_side - (min_side + 1) % 2)
    w = _gaussian_window(window_size, 1.5)
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    usable = 1
    while (usable < len(weights)
           and min_side // (2 ** usable) >= window_size):
        usable += 1
    weights = jnp.asarray(weights[:usable], jnp.float32)
    weights = weights / jnp.sum(weights)
    levels = usable

    def cs_and_ssim(a, b):
        mu1, mu2 = _filter2d(a, w), _filter2d(b, w)
        s1 = jnp.maximum(_filter2d(a * a, w) - mu1 * mu1, 0.0)
        s2 = jnp.maximum(_filter2d(b * b, w) - mu2 * mu2, 0.0)
        s12 = _filter2d(a * b, w) - mu1 * mu2
        cs = jnp.mean((2 * s12 + C2) / (s1 + s2 + C2))
        ss = jnp.mean(((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) /
                      ((mu1 * mu1 + mu2 * mu2 + C1) * (s1 + s2 + C2)))
        return cs, ss

    def downsample(x):
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID") / 4.0

    vals = []
    a, b = img1, img2
    for lvl in range(levels):
        cs, ss = cs_and_ssim(a, b)
        vals.append(ss if lvl == levels - 1 else cs)
        if lvl < levels - 1:
            a, b = downsample(a), downsample(b)
    vals = jnp.stack([jnp.maximum(v, 1e-6) for v in vals])
    return jnp.prod(vals ** weights)
