"""Fresnel diffraction physics: C/S integrals, fringe placement, and the
learnable D²NN diffractive layers.

Ports of the remaining reference physics (reference:
scripts/utils/fresnel_zones.py:828-1081 and
scripts/models/gaussian_decoder_models.py:1154-1415):
  * FresnelDiffraction — lookup tables for the Fresnel integrals
    C(w)=∫cos(πt²/2), S(w)=∫sin(πt²/2) (trapezoid-free cumsum like the
    reference), edge-intensity profile I = (C+½)² + (S+½)², Fresnel
    parameter w = |x|·√(2/(λz)), fringe maxima at w_n ≈ √(2n+0.5) for
    diffraction-guided Gaussian placement;
  * DiffractiveLayer — learnable complex transmission t = A·e^{iφ}
    multiplied into a wave field, with TV + amplitude regularization;
  * MultiscaleDiffractiveLayer — pyramid of diffractive layers applied at
    multiple resolutions.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

TWO_PI = 6.283185307179586


@dataclasses.dataclass(frozen=True)
class FresnelDiffraction:
    wavelength: float = 0.05
    num_fringe_samples: int = 16
    lut_size: int = 1000
    lut_max_w: float = 5.0

    def _lut(self) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Host-built cumulative-sum LUTs (matches the reference's
        cumsum-style integration)."""
        w = np.linspace(0, self.lut_max_w, self.lut_size, dtype=np.float32)
        dt = w[1] - w[0]
        C = np.cumsum(np.cos(np.pi * w ** 2 / 2)) * dt
        S = np.cumsum(np.sin(np.pi * w ** 2 / 2)) * dt
        return jnp.asarray(w), jnp.asarray(C.astype(np.float32)), \
            jnp.asarray(S.astype(np.float32))

    def _interp(self, w: jax.Array, lut: jax.Array) -> jax.Array:
        wc = jnp.clip(w, 0.0, self.lut_max_w)
        idx_f = wc / self.lut_max_w * (self.lut_size - 1)
        lo = idx_f.astype(jnp.int32)
        hi = jnp.minimum(lo + 1, self.lut_size - 1)
        frac = idx_f - lo.astype(idx_f.dtype)
        return lut[lo] * (1 - frac) + lut[hi] * frac

    def fresnel_C(self, w: jax.Array) -> jax.Array:
        _, C, _ = self._lut()
        return self._interp(w, C)

    def fresnel_S(self, w: jax.Array) -> jax.Array:
        _, _, S = self._lut()
        return self._interp(w, S)

    def fresnel_intensity(self, w: jax.Array) -> jax.Array:
        """I(w) = (C+0.5)² + (S+0.5)² — the edge diffraction profile."""
        _, C, S = self._lut()
        c = self._interp(w, C)
        s = self._interp(w, S)
        return (c + 0.5) ** 2 + (s + 0.5) ** 2

    def compute_fresnel_parameter(self, distance_from_edge: jax.Array,
                                  depth: jax.Array) -> jax.Array:
        z = jnp.maximum(depth, 0.1)
        return jnp.abs(distance_from_edge) * jnp.sqrt(
            2.0 / (self.wavelength * z))

    def compute_edge_density(self, depth: jax.Array, edge_mask: jax.Array,
                             distance_from_edge: jax.Array) -> jax.Array:
        """Fringe-modulated Gaussian-placement density."""
        w = self.compute_fresnel_parameter(distance_from_edge, depth)
        return self.fresnel_intensity(w) * edge_mask

    def get_fringe_positions(self, depth_at_edge: float) -> jax.Array:
        """Distances of diffraction maxima from the edge: w_n ≈ √(2n+0.5),
        x = w·√(λz/2) — the OPTIMAL Gaussian placement offsets."""
        n = jnp.arange(self.num_fringe_samples, dtype=jnp.float32)
        w_n = jnp.sqrt(2 * n + 0.5)
        return w_n * jnp.sqrt(self.wavelength * depth_at_edge / 2.0)

    def __call__(self, depth, edge_mask, distance_from_edge):
        return self.compute_edge_density(depth, edge_mask, distance_from_edge)


class DiffractiveLayer(nn.Module):
    """Learnable complex transmission surface (D²NN)."""

    height: int
    width: int
    num_channels: int = 3
    init_amplitude: float = 0.5
    init_phase_scale: float = 0.1

    def setup(self):
        shape = (self.num_channels, self.height, self.width)
        self.amplitude_raw = self.param(
            "amplitude_raw", lambda _: jnp.full(shape, self.init_amplitude))
        self.phase_raw = self.param(
            "phase",
            lambda key: jax.random.normal(key, shape) * self.init_phase_scale)

    def transmission(self) -> Tuple[jax.Array, jax.Array]:
        return (jax.nn.sigmoid(self.amplitude_raw),
                jnp.mod(self.phase_raw, TWO_PI))

    def __call__(self, wave_field: jax.Array) -> jax.Array:
        """wave_field: complex64 (C, H, W) or (B, C, H, W) — the framework's
        channel-first image convention.  Returns U_in × t with t = A·e^{iφ}."""
        amplitude, phase = self.transmission()
        t = amplitude * jnp.exp(1j * phase.astype(jnp.complex64))
        if wave_field.ndim == 4:
            t = t[None]
        return wave_field * t

    def regularization_loss(self) -> jax.Array:
        amplitude, phase = self.transmission()
        amp_tv = (jnp.mean(jnp.abs(amplitude[:, 1:] - amplitude[:, :-1]))
                  + jnp.mean(jnp.abs(amplitude[:, :, 1:] - amplitude[:, :, :-1])))
        phase_tv = (jnp.mean(jnp.abs(phase[:, 1:] - phase[:, :-1]))
                    + jnp.mean(jnp.abs(phase[:, :, 1:] - phase[:, :, :-1])))
        amp_center = jnp.mean((amplitude - 0.5) ** 2)
        return 0.01 * amp_tv + 0.01 * phase_tv + 0.001 * amp_center


class MultiscaleDiffractiveLayer(nn.Module):
    """Pyramid of diffractive layers: each scale modulates a down/upsampled
    copy of the field (reference: gaussian_decoder_models.py:1330-1415)."""

    height: int
    width: int
    num_channels: int = 3
    num_scales: int = 3

    @nn.compact
    def __call__(self, wave_field: jax.Array) -> jax.Array:
        batched = wave_field.ndim == 4
        field = wave_field if batched else wave_field[None]
        B, C, H, W = field.shape
        out = field
        for s in range(self.num_scales):
            h, w = max(H >> s, 1), max(W >> s, 1)
            layer = DiffractiveLayer(h, w, self.num_channels,
                                     name=f"scale_{s}")
            # Complex resize: operate on real/imag separately.
            def resize_c(x, hh, ww):
                re = jax.image.resize(x.real, (B, C, hh, ww), "linear")
                im = jax.image.resize(x.imag, (B, C, hh, ww), "linear")
                return (re + 1j * im).astype(jnp.complex64)

            small = resize_c(out, h, w)
            modulated = layer(small)
            out = resize_c(modulated, H, W)
        return out if batched else out[0]
