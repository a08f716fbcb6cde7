"""Physics-grounded training losses — all FFT/stencil math on XLA.

Ports (semantics, not code) of the reference's HFGS loss suite
(reference: scripts/training/train_gaussian_decoder.py:304-522, 781-835):
  * learnable wavelengths: clamp(softplus(raw), 0.01, 0.5);
  * phase retrieval: U = sqrt(I) * exp(i φ(depth)), compare |FFT(U)|;
  * frequency-domain: radial low/high split at `cutoff`, high x weight;
  * Helmholtz wave-equation residual via a 5-point roll stencil.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

PI = jnp.pi

HFGS_DEFAULT_WAVELENGTHS = (0.0635, 0.05, 0.041)  # R, G, B


def _dft_matrix(n: int) -> jax.Array:
    """(n, n) complex64 DFT matrix (host-built constant)."""
    import numpy as np

    k = np.arange(n)
    w = np.exp(-2j * np.pi * np.outer(k, k) / n)
    return jnp.asarray(w.astype(np.complex64))


def dft2(x: jax.Array) -> jax.Array:
    """2D DFT over the last two axes via matmul.

    Equivalent to jnp.fft.fft2 but lowered as two complex matmuls: this (a)
    rides the MXU on TPU for the small image sizes used in losses, and (b)
    sidesteps an XLA CPU fft-thunk layout RET_CHECK that fires when the SPMD
    partitioner hands the FFT a non-major layout (hit by the multi-chip
    dryrun on the host platform).
    """
    H, W = x.shape[-2], x.shape[-1]
    fh = _dft_matrix(H)
    fw = _dft_matrix(W)
    x = x.astype(jnp.complex64)
    return jnp.einsum("hk,...kw,wl->...hl", fh, x, fw)


def constrain_learnable_wavelengths(raw: jax.Array) -> jax.Array:
    """Raw (3,) parameter -> physical wavelengths in [0.01, 0.5]."""
    return jnp.clip(jax.nn.softplus(raw), 0.01, 0.5)


def init_learnable_wavelengths() -> jax.Array:
    """Raw init such that softplus(raw) equals the HFGS defaults."""
    wl = jnp.asarray(HFGS_DEFAULT_WAVELENGTHS, jnp.float32)
    # inverse softplus: log(expm1(x))
    return jnp.log(jnp.expm1(wl))


def phase_retrieval_loss(
    rendered: jax.Array,     # (B, 3, H, W) intensity
    target: jax.Array,       # (B, 3, H, W)
    depth: jax.Array,        # (B, H, W) target depth
    wavelength=0.05,
    focal_depth: float = 0.5,
) -> jax.Array:
    """Self-supervised frequency-magnitude consistency with phase known from
    depth: φ = (2π/λ)|depth − focal|."""
    if depth.ndim == 4:
        depth = depth[:, 0] if depth.shape[1] == 1 else depth[..., 0]
    phase = (2.0 * PI / wavelength) * jnp.abs(depth - focal_depth)
    phase = phase[:, None]                              # (B, 1, H, W)
    e_iphi = jnp.exp(1j * phase.astype(jnp.complex64))
    r_amp = jnp.sqrt(jnp.maximum(rendered, 1e-8))
    t_amp = jnp.sqrt(jnp.maximum(target, 1e-8))
    r_freq = dft2(r_amp * e_iphi)
    t_freq = dft2(t_amp * e_iphi)
    return jnp.mean((jnp.abs(r_freq) - jnp.abs(t_freq)) ** 2)


def _radial_masks(h: int, w: int, cutoff: float) -> Tuple[jax.Array, jax.Array]:
    u = jnp.fft.fftfreq(w)
    v = jnp.fft.fftfreq(h)
    V, U = jnp.meshgrid(v, u, indexing="ij")
    radius = jnp.sqrt(U * U + V * V)
    low = (radius < cutoff).astype(jnp.float32)
    return low, 1.0 - low


def frequency_domain_loss(
    rendered: jax.Array,     # (B, C, H, W)
    target: jax.Array,
    cutoff: float = 0.1,
    high_weight: float = 2.0,
) -> jax.Array:
    H, W = rendered.shape[-2:]
    low, high = _radial_masks(H, W, cutoff)
    r_freq = dft2(rendered)
    t_freq = dft2(target)
    low_loss = jnp.mean((jnp.abs(r_freq * low) - jnp.abs(t_freq * low)) ** 2)
    high_loss = jnp.mean((jnp.abs(r_freq * high) - jnp.abs(t_freq * high)) ** 2)
    return low_loss + high_weight * high_loss


def wave_equation_loss(
    wave_field: jax.Array,   # (B, C, H, W) or (B, H, W)
    wavelength: float,
    pixel_spacing: float = 1.0 / 256.0,
) -> jax.Array:
    """Helmholtz residual ‖∇²U + k²U‖² with circular-padded 5-point Laplacian."""
    if wave_field.ndim == 3:
        wave_field = wave_field[:, None]
    k = 2.0 * PI / wavelength
    lap = (
        jnp.roll(wave_field, 1, axis=-1) + jnp.roll(wave_field, -1, axis=-1)
        + jnp.roll(wave_field, 1, axis=-2) + jnp.roll(wave_field, -1, axis=-2)
        - 4.0 * wave_field
    ) / (pixel_spacing ** 2)
    residual = lap + (k * k) * wave_field
    return jnp.mean(residual ** 2)


def normalized_depth_l1(rendered_depth: jax.Array, target_depth: jax.Array) -> jax.Array:
    """Scale/shift-invariant depth L1: both depths standardized before
    comparison (reference: train_gaussian_decoder.py:929-937)."""
    rd_std = jnp.maximum(jnp.std(rendered_depth), 1e-4)
    td_std = jnp.maximum(jnp.std(target_depth), 1e-4)
    rd = (rendered_depth - jnp.mean(rendered_depth)) / rd_std
    td = (target_depth - jnp.mean(target_depth)) / td_std
    return jnp.mean(jnp.abs(rd - td))
