"""Fresnel-zone physics utilities (depth zones, wave phases, wavelengths).

TPU-idiomatic design: configuration lives in frozen dataclasses, all math is
pure jnp over full arrays, and *learnable* quantities (wavelengths) are
explicit function arguments so they can live in any optimizer pytree — the
reference buries them in nn.Parameters
(reference: scripts/utils/fresnel_zones.py:34-826).

Semantics parity:
  * FresnelZones — uniform depth slicing, zone-center snapping, soft sigmoid
    boundary masks (sharpness 10/threshold), boundary-weighted loss maps,
    Sobel zone gradients, adaptive density, soft zone encodings
    (reference: fresnel_zones.py:34-397).
  * PhysicsFresnelZones — true zone-plate boundaries r_n = sqrt(n λ f)
    normalized to [0,1], alternating 0/π zone phases, and the wave equation
    φ = (2π/λ)|d − f| (reference: fresnel_zones.py:400-614).
  * MultiWavelengthPhysics — per-RGB wavelengths at physical ratios
    700:550:450, per-channel phases, chromatic dispersion
    (reference: fresnel_zones.py:617-826).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

PI = jnp.pi

# Physical wavelength ratios normalized to green (700/550, 1, 450/550).
WAVELENGTH_RATIO_R = 700.0 / 550.0
WAVELENGTH_RATIO_G = 1.0
WAVELENGTH_RATIO_B = 450.0 / 550.0


def constrain_wavelength(raw, lo: float = 0.01, hi: float = 0.5):
    """|raw| clamped to [lo, hi] — prevents wavelength divergence while
    remaining differentiable."""
    return jnp.clip(jnp.abs(raw), lo, hi)


def sobel_gradients(img: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Sobel x/y gradients of (..., H, W) maps via depthwise 3x3 convolution.

    Kernels match the input dtype (lax.conv requires it), so this works
    under bf16 mixed precision as well as fp32.
    """
    kdt = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], kdt)
    ky = jnp.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], kdt)
    lead = img.shape[:-2]
    x = img.reshape((-1, 1) + img.shape[-2:])

    def conv(k):
        return jax.lax.conv_general_dilated(
            x, k[None, None], window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    gx = conv(kx).reshape(lead + img.shape[-2:])
    gy = conv(ky).reshape(lead + img.shape[-2:])
    return gx, gy


@dataclasses.dataclass(frozen=True)
class FresnelZones:
    """Heuristic uniform depth zones."""

    num_zones: int = 8
    depth_range: Tuple[float, float] = (0.0, 1.0)
    boundary_threshold: float = 0.02
    soft_boundaries: bool = True

    @property
    def zone_boundaries(self) -> jax.Array:
        return jnp.linspace(self.depth_range[0], self.depth_range[1],
                            self.num_zones + 1)

    @property
    def zone_centers(self) -> jax.Array:
        b = self.zone_boundaries
        return 0.5 * (b[:-1] + b[1:])

    @property
    def zone_width(self) -> float:
        return (self.depth_range[1] - self.depth_range[0]) / self.num_zones

    def quantize_depth(self, depth: jax.Array) -> jax.Array:
        d = jnp.clip(depth, self.depth_range[0], self.depth_range[1])
        # side="left" == torch.bucketize(right=False): a value exactly ON a
        # boundary belongs to the LOWER zone (reference parity at exact
        # boundaries, fresnel_zones.py:96-116).
        return jnp.searchsorted(self.zone_boundaries[1:-1], d, side="left")

    def zone_centers_for_depth(self, depth: jax.Array) -> jax.Array:
        return self.zone_centers[self.quantize_depth(depth)]

    def boundary_mask(self, depth: jax.Array,
                      threshold: Optional[float] = None,
                      emphasis: Optional[jax.Array] = None) -> jax.Array:
        """Per-pixel proximity-to-zone-boundary mask.

        `emphasis` is an optional LEARNABLE per-boundary multiplier
        (num_zones + 1,) — the reference declares exactly this parameter
        (scripts/utils/fresnel_zones.py:94 `boundary_emphasis =
        nn.Parameter(torch.ones(num_zones + 1))`) but never consumes it;
        here it weights each boundary's contribution so training can
        learn which depth discontinuities deserve extra loss pressure.
        emphasis=None (or all-ones) reproduces the un-emphasized mask.
        """
        t = self.boundary_threshold if threshold is None else threshold
        dist = jnp.abs(depth[..., None] - self.zone_boundaries)
        if emphasis is None:
            dmin = jnp.min(dist, axis=-1)
            if self.soft_boundaries:
                return jax.nn.sigmoid((10.0 / t) * (t - dmin))
            return (dmin < t).astype(jnp.float32)
        if self.soft_boundaries:
            per_b = jax.nn.sigmoid((10.0 / t) * (t - dist))
        else:
            per_b = (dist < t).astype(jnp.float32)
        return jnp.max(per_b * emphasis, axis=-1)

    def boundary_weight(self, depth: jax.Array, base_weight: float = 1.0,
                        boundary_boost: float = 2.0) -> jax.Array:
        return base_weight + self.boundary_mask(depth) * (boundary_boost - base_weight)

    def zone_gradients(self, depth: jax.Array) -> jax.Array:
        gx, gy = sobel_gradients(depth)
        return jnp.sqrt(gx * gx + gy * gy + 1e-8)

    def adaptive_density(self, depth: jax.Array, min_density: float = 0.5,
                         max_density: float = 2.0) -> jax.Array:
        zone_idx = self.quantize_depth(depth).astype(jnp.float32)
        zone_factor = 1.0 - (zone_idx / self.num_zones) * 0.3
        bm = self.boundary_mask(depth)
        return zone_factor * (min_density + bm * (max_density - min_density))

    def interpolate_across_zones(self, depth: jax.Array,
                                 zone_features: jax.Array) -> jax.Array:
        """Blend per-zone features (num_zones, C) across zone boundaries."""
        lo, hi = self.depth_range
        scaled = (depth - lo) / (hi - lo) * self.num_zones
        z_lo = jnp.clip(jnp.floor(scaled).astype(jnp.int32), 0, self.num_zones - 1)
        z_hi = jnp.clip(z_lo + 1, 0, self.num_zones - 1)
        alpha = (scaled - z_lo.astype(scaled.dtype))[..., None]
        return (1 - alpha) * zone_features[z_lo] + alpha * zone_features[z_hi]

    def zone_encoding(self, depth: jax.Array) -> jax.Array:
        if self.soft_boundaries:
            dist = jnp.abs(depth[..., None] - self.zone_centers)
            return jax.nn.softmax(-dist / self.zone_width, axis=-1)
        return jax.nn.one_hot(self.quantize_depth(depth), self.num_zones)

    def __call__(self, depth: jax.Array, return_all: bool = False):
        if not return_all:
            return self.quantize_depth(depth)
        return {
            "zone_idx": self.quantize_depth(depth),
            "zone_centers": self.zone_centers_for_depth(depth),
            "boundary_mask": self.boundary_mask(depth),
            "boundary_weight": self.boundary_weight(depth),
            "zone_encoding": self.zone_encoding(depth),
            "adaptive_density": self.adaptive_density(depth),
            "gradient_magnitude": self.zone_gradients(depth),
        }


@dataclasses.dataclass(frozen=True)
class PhysicsFresnelZones:
    """Zone-plate physics: sqrt-spaced boundaries and wave-equation phases.

    The (possibly learnable) wavelength is passed per call; defaults to the
    configured init value.
    """

    num_zones: int = 8
    wavelength_init: float = 0.05
    focal_depth: float = 0.5
    wavelength_min: float = 0.01
    wavelength_max: float = 0.5

    def _wl(self, wavelength):
        wl = self.wavelength_init if wavelength is None else wavelength
        return constrain_wavelength(jnp.asarray(wl, jnp.float32),
                                    self.wavelength_min, self.wavelength_max)

    def zone_boundaries(self, wavelength=None) -> jax.Array:
        n = jnp.arange(self.num_zones + 1, dtype=jnp.float32)
        r = jnp.sqrt(n * self._wl(wavelength) * self.focal_depth)
        return r / (r[-1] + 1e-8)

    def zone_index(self, depth: jax.Array, wavelength=None) -> jax.Array:
        b = self.zone_boundaries(wavelength)
        idx = jnp.searchsorted(b[1:-1], depth, side="right")
        return jnp.clip(idx, 0, self.num_zones - 1)

    @staticmethod
    def zone_phase(zone_idx: jax.Array) -> jax.Array:
        """Alternating 0/π phases — the zone-plate signature."""
        return (zone_idx % 2).astype(jnp.float32) * PI

    def path_difference(self, depth: jax.Array) -> jax.Array:
        return jnp.abs(depth - self.focal_depth)

    def depth_to_phase(self, depth: jax.Array, wavelength=None) -> jax.Array:
        """φ = (2π / λ) · |depth − focal|."""
        return (2.0 * PI / self._wl(wavelength)) * self.path_difference(depth)

    def __call__(self, depth: jax.Array, wavelength=None,
                 return_all: bool = False):
        if not return_all:
            return self.depth_to_phase(depth, wavelength)
        zi = self.zone_index(depth, wavelength)
        return {
            "phase": self.depth_to_phase(depth, wavelength),
            "zone_idx": zi,
            "zone_phase": self.zone_phase(zi),
            "path_difference": self.path_difference(depth),
            "boundaries": self.zone_boundaries(wavelength),
            "wavelength": self._wl(wavelength),
        }


@dataclasses.dataclass(frozen=True)
class MultiWavelengthPhysics:
    """Per-RGB-channel wavelength physics."""

    base_wavelength: float = 0.05
    use_physical_ratios: bool = True
    wavelength_min: float = 0.01
    wavelength_max: float = 0.5
    focal_depth: float = 0.5

    def init_wavelengths(self) -> jax.Array:
        """Initial raw (3,) wavelengths [R, G, B] — the learnable parameter."""
        if self.use_physical_ratios:
            return jnp.array(
                [self.base_wavelength * WAVELENGTH_RATIO_R,
                 self.base_wavelength * WAVELENGTH_RATIO_G,
                 self.base_wavelength * WAVELENGTH_RATIO_B], jnp.float32)
        return jnp.full((3,), self.base_wavelength, jnp.float32)

    def _wls(self, wavelengths) -> jax.Array:
        wl = self.init_wavelengths() if wavelengths is None else jnp.asarray(wavelengths)
        return constrain_wavelength(wl, self.wavelength_min, self.wavelength_max)

    def path_difference(self, depth: jax.Array) -> jax.Array:
        return jnp.abs(depth - self.focal_depth)

    def depth_to_phase_rgb(self, depth: jax.Array, wavelengths=None) -> jax.Array:
        """(...,) depth -> (..., 3) per-channel phase."""
        pd = self.path_difference(depth)[..., None]
        return (2.0 * PI / self._wls(wavelengths)) * pd

    def depth_to_phase_single(self, depth: jax.Array, channel: str = "g",
                              wavelengths=None) -> jax.Array:
        c = {"r": 0, "g": 1, "b": 2}[channel.lower()]
        return (2.0 * PI / self._wls(wavelengths)[c]) * self.path_difference(depth)

    def chromatic_dispersion(self, wavelengths=None) -> jax.Array:
        wl = self._wls(wavelengths)
        return (wl[0] - wl[2]) / wl[1]

    def __call__(self, depth: jax.Array, wavelengths=None,
                 return_all: bool = False):
        phases = self.depth_to_phase_rgb(depth, wavelengths)
        if not return_all:
            return phases
        wl = self._wls(wavelengths)
        return {
            "phases": phases,
            "wavelengths": wl,
            "chromatic_dispersion": self.chromatic_dispersion(wavelengths),
        }
