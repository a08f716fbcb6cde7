"""Angular Spectrum Method propagation + plane-binned wave renderer.

XLA-FFT ports of the reference's ASM stack (reference:
scripts/models/differentiable_renderer.py:929-1344):
  * AngularSpectrumPropagator — H(f) = exp(i 2π z sqrt(1/λ² − fx² − fy²))
    with evanescent-wave band limiting, per-channel wavelengths.
  * render_asm_wave_field — Gaussians binned to discrete depth planes,
    complex splats per plane, each plane ASM-propagated to the focal depth
    per RGB channel, fields summed (true interference), intensity output.

The per-plane/per-channel Python loops of the reference become a single
batched fft2 over a (planes, 3, H, W) stack; plane binning is a one-hot
einsum rather than scatter.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fresnel_tpu.core.camera import Camera
from fresnel_tpu.render.projection import project_gaussians

TWO_PI = 6.283185307179586


@dataclasses.dataclass(frozen=True)
class AngularSpectrumPropagator:
    height: int
    width: int
    pixel_pitch: float = 1.0 / 256.0
    wavelength: float = 0.05
    band_limit: bool = True

    def _freq_grids(self):
        fx = jnp.fft.fftfreq(self.width, d=self.pixel_pitch)
        fy = jnp.fft.fftfreq(self.height, d=self.pixel_pitch)
        return jnp.meshgrid(fx, fy, indexing="xy")

    def transfer_function(self, z_distance, wavelength=None) -> jax.Array:
        """(H, W) complex transfer function for propagation distance z.
        Broadcasts over leading dims of z_distance/wavelength."""
        FX, FY = self._freq_grids()
        wl = self.wavelength if wavelength is None else wavelength
        wl = jnp.asarray(wl, jnp.float32)
        z = jnp.asarray(z_distance, jnp.float32)
        kz_sq = (1.0 / wl[..., None, None] ** 2 if wl.ndim else 1.0 / wl ** 2) \
            - FX ** 2 - FY ** 2
        if self.band_limit:
            kz_sq = jnp.maximum(kz_sq, 0.0)
        kz = jnp.sqrt(kz_sq)
        phase = TWO_PI * z[..., None, None] * kz if z.ndim else TWO_PI * z * kz
        return jnp.exp(1j * phase.astype(jnp.complex64))

    def propagate(self, field: jax.Array, z_distance, wavelength=None) -> jax.Array:
        """Propagate a complex field (..., H, W) by z via FFT."""
        H_tf = self.transfer_function(z_distance, wavelength)
        return jnp.fft.ifft2(jnp.fft.fft2(field) * H_tf)

    def __call__(self, field, z_distance, wavelength=None):
        return self.propagate(field, z_distance, wavelength)


@functools.partial(
    jax.jit,
    static_argnames=("background", "return_depth", "max_radius", "chunk",
                     "num_depth_planes", "depth_range", "focal_depth",
                     "pixel_pitch", "wavelength"))
def render_asm_wave_field(
    positions: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    colors: jax.Array,
    opacities: jax.Array,
    camera: Camera,
    phases: jax.Array,                    # (N,) radians
    wavelengths_rgb: Optional[jax.Array] = None,   # (3,)
    background: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    return_depth: bool = False,
    max_radius: float = 64.0,
    chunk: int = 64,
    num_depth_planes: int = 16,
    depth_range: Tuple[float, float] = (0.1, 2.0),
    focal_depth: float = 0.5,
    pixel_pitch: float = 1.0 / 256.0,
    wavelength: float = 0.05,
):
    H, W = camera.height, camera.width
    N = positions.shape[0]
    P = num_depth_planes
    bg = jnp.asarray(background, jnp.float32)

    proj = project_gaussians(positions, scales, rotations, camera,
                             max_radius=max_radius)
    opac = jnp.where(proj.visible, opacities, 0.0)

    depth_planes = jnp.linspace(depth_range[0], depth_range[1], P)
    plane_idx = jnp.argmin(
        jnp.abs(proj.depths[:, None] - depth_planes[None, :]), axis=1)
    plane_onehot = jax.nn.one_hot(plane_idx, P, dtype=jnp.float32)  # (N, P)

    X, Y = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32))

    n_chunks = max(1, -(-N // chunk))
    pad = n_chunks * chunk - N

    def pad0(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    data = jax.tree.map(
        lambda x: pad0(x).reshape((n_chunks, chunk) + x.shape[1:]),
        (proj.means2d, proj.conic, proj.radii, colors, opac, phases,
         plane_onehot))

    def body(carry, ch):
        pr, pi = carry                       # (P, H, W, 3) real/imag
        m2d, cn, rad, col, op, phs, oh = ch
        dx = X[None] - m2d[:, 0, None, None]
        dy = Y[None] - m2d[:, 1, None, None]
        mahal = (cn[:, 0, None, None] * dx * dx
                 + 2.0 * cn[:, 1, None, None] * dx * dy
                 + cn[:, 2, None, None] * dy * dy)
        amp = jnp.exp(-0.5 * mahal) * op[:, None, None]
        rr = rad[:, None, None]
        amp = jnp.where((jnp.abs(dx) <= rr) & (jnp.abs(dy) <= rr), amp, 0.0)
        ccol = jnp.cos(phs)[:, None] * col   # (C, 3)
        scol = jnp.sin(phs)[:, None] * col
        pr = pr + jnp.einsum("cp,chw,cd->phwd", oh, amp, ccol)
        pi = pi + jnp.einsum("cp,chw,cd->phwd", oh, amp, scol)
        return (pr, pi), None

    init = (jnp.zeros((P, H, W, 3)), jnp.zeros((P, H, W, 3)))
    (pr, pi), _ = jax.lax.scan(body, init, data)

    field = (pr + 1j * pi).astype(jnp.complex64)          # (P, H, W, 3)
    field = jnp.transpose(field, (0, 3, 1, 2))            # (P, 3, H, W)

    prop = AngularSpectrumPropagator(H, W, pixel_pitch, wavelength)
    wls = (jnp.full((3,), wavelength, jnp.float32)
           if wavelengths_rgb is None else jnp.asarray(wavelengths_rgb))
    z_prop = focal_depth - depth_planes                   # (P,)
    # Batched transfer functions over (P, 3): H_tf (P, 3, H, W).
    H_tf = prop.transfer_function(
        jnp.broadcast_to(z_prop[:, None], (P, 3)),
        jnp.broadcast_to(wls[None, :], (P, 3)))
    propagated = jnp.fft.ifft2(jnp.fft.fft2(field) * H_tf)
    total_field = jnp.sum(propagated, axis=0)             # (3, H, W)

    intensity = total_field.real ** 2 + total_field.imag ** 2
    rendered = jnp.sqrt(intensity + 1e-8)
    rendered = rendered / jnp.maximum(jnp.max(rendered), 1.0)
    rendered = jnp.clip(rendered, 0.0, 1.0)
    total_amp = jnp.clip(jnp.sum(jnp.abs(total_field), axis=0, keepdims=True),
                         0.0, 1.0)
    image = jnp.clip(rendered + bg[:, None, None] * (1.0 - total_amp), 0.0, 1.0)

    if return_depth:
        return image, jnp.zeros((H, W), jnp.float32)
    return image
