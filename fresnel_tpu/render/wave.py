"""Complex wave-field renderer: U = Σ A·e^{iφ}, I = |U|².

Physics parity with the reference WaveFieldRenderer (reference:
scripts/models/differentiable_renderer.py:689-926): per-Gaussian complex
amplitude accumulation (order-independent — no compositing), sqrt + max
normalization for display, amplitude-weighted depth, scalar or per-RGB (QSR)
phases.  The reference's per-Gaussian Python loop becomes a chunked lax.scan
over the full image — one fused XLA program.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fresnel_tpu.core.camera import Camera
from fresnel_tpu.render.projection import project_gaussians


@functools.partial(jax.jit, static_argnames=("background", "return_depth",
                                             "max_radius", "chunk"))
def render_wave_field(
    positions: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    colors: jax.Array,
    opacities: jax.Array,
    camera: Camera,
    phases: jax.Array,               # (N,) scalar or (N, 3) per-RGB phases
    background: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    return_depth: bool = False,
    max_radius: float = 64.0,
    chunk: int = 64,
):
    """Render to (3, H, W).  Requires phases (radians)."""
    H, W = camera.height, camera.width
    N = positions.shape[0]
    bg = jnp.asarray(background, jnp.float32)

    proj = project_gaussians(positions, scales, rotations, camera,
                             max_radius=max_radius)
    opac = jnp.where(proj.visible, opacities, 0.0)
    if phases.ndim == 1:
        phases = phases[:, None]
    ph = jnp.broadcast_to(phases, (N, 3)) if phases.shape[-1] != 3 else phases

    X, Y = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32))

    n_chunks = max(1, -(-N // chunk))
    pad = n_chunks * chunk - N

    def pad0(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    data = jax.tree.map(
        lambda x: pad0(x).reshape((n_chunks, chunk) + x.shape[1:]),
        (proj.means2d, proj.conic, proj.radii, proj.depths, colors, opac, ph))

    def body(carry, ch):
        wr, wi, acc_d, tot_w = carry
        m2d, cn, rad, dep, col, op, phs = ch
        dx = X[None] - m2d[:, 0, None, None]
        dy = Y[None] - m2d[:, 1, None, None]
        mahal = (cn[:, 0, None, None] * dx * dx
                 + 2.0 * cn[:, 1, None, None] * dx * dy
                 + cn[:, 2, None, None] * dy * dy)
        amp = jnp.exp(-0.5 * mahal) * op[:, None, None]
        rr = rad[:, None, None]
        amp = jnp.where((jnp.abs(dx) <= rr) & (jnp.abs(dy) <= rr), amp, 0.0)
        # (C, H, W) amplitude x (C, 3) color/phase -> (H, W, 3)
        cosph = jnp.cos(phs) * col
        sinph = jnp.sin(phs) * col
        wr = wr + jnp.einsum("chw,cd->hwd", amp, cosph)
        wi = wi + jnp.einsum("chw,cd->hwd", amp, sinph)
        acc_d = acc_d + jnp.einsum("chw,c->hw", amp, dep)
        tot_w = tot_w + jnp.sum(amp, axis=0)
        return (wr, wi, acc_d, tot_w), None

    init = (jnp.zeros((H, W, 3)), jnp.zeros((H, W, 3)),
            jnp.zeros((H, W)), jnp.zeros((H, W)))
    (wr, wi, acc_d, tot_w), _ = jax.lax.scan(body, init, data)

    intensity = wr * wr + wi * wi
    rendered = jnp.sqrt(intensity + 1e-8)
    rendered = rendered / jnp.maximum(jnp.max(rendered), 1.0)
    rendered = jnp.clip(rendered, 0.0, 1.0)
    total_amp = jnp.clip(
        jnp.sqrt(jnp.sum(intensity, axis=-1, keepdims=True) + 1e-8), 0.0, 1.0)
    rendered = rendered + bg * (1.0 - total_amp)
    image = jnp.clip(jnp.transpose(rendered, (2, 0, 1)), 0.0, 1.0)

    if return_depth:
        return image, acc_d / (tot_w + 1e-8)
    return image
