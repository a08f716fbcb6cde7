"""Simplified isotropic point-splat renderer for quick tests.

Parity with the reference SimplifiedRenderer (reference:
scripts/models/differentiable_renderer.py:1347-1458): isotropic splats with
radius clamp(mean(scale)·fx/depth, 1, 20), weight exp(-d²/(2(r/2)²)),
back-to-front over-blending (expressed here as the equivalent front-to-back
transmittance product), min-depth map where alpha > 0.1.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from fresnel_tpu.core.camera import Camera


@functools.partial(jax.jit, static_argnames=("background", "return_depth", "chunk"))
def render_simplified(
    positions: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,   # unused (isotropic), kept for signature parity
    colors: jax.Array,
    opacities: jax.Array,
    camera: Camera,
    background: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    return_depth: bool = False,
    chunk: int = 128,
):
    H, W = camera.height, camera.width
    N = positions.shape[0]
    bg = jnp.asarray(background, jnp.float32)

    means2d, depths = camera.project(positions)
    visible = depths > 0
    radius = jnp.clip(jnp.mean(scales, axis=-1) * camera.fx /
                      jnp.maximum(depths, 1e-6), 1.0, 20.0)
    opac = jnp.where(visible, opacities, 0.0)

    # Front-to-back order (equivalent over-blend result).
    order = jnp.argsort(jnp.where(visible, depths, jnp.inf))
    means2d, depths, radius, opac = (means2d[order], depths[order],
                                     radius[order], opac[order])
    colors_s = colors[order]

    X, Y = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                        jnp.arange(H, dtype=jnp.float32))

    n_chunks = max(1, -(-N // chunk))
    pad = n_chunks * chunk - N

    def pad0(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    data = jax.tree.map(
        lambda x: pad0(x).reshape((n_chunks, chunk) + x.shape[1:]),
        (means2d, depths, radius, colors_s, opac))

    def body(carry, ch):
        acc_c, Tr, min_d = carry
        m2d, dep, rad, col, op = ch
        dx = X[None] - m2d[:, 0, None, None]
        dy = Y[None] - m2d[:, 1, None, None]
        dist_sq = dx * dx + dy * dy
        sig = jnp.maximum(rad / 2.0, 1.0)[:, None, None]
        w = jnp.exp(-dist_sq / (2.0 * sig * sig))
        rr = rad[:, None, None]
        w = jnp.where((jnp.abs(dx) <= rr + 1) & (jnp.abs(dy) <= rr + 1), w, 0.0)
        alpha = jnp.clip(w * op[:, None, None], 0.0, 1.0)
        one_m = 1.0 - alpha
        T_inc = jnp.cumprod(one_m, axis=0)
        T_excl = jnp.concatenate([jnp.ones_like(T_inc[:1]), T_inc[:-1]], axis=0)
        contrib = alpha * T_excl * Tr[None]
        acc_c = acc_c + jnp.einsum("chw,cd->dhw", contrib, col)
        Tr = Tr * T_inc[-1]
        hit = alpha > 0.1
        min_d = jnp.min(jnp.where(hit, dep[:, None, None],
                                  jnp.inf), axis=0, initial=jnp.inf)
        min_d = jnp.minimum(carry[2], min_d)
        return (acc_c, Tr, min_d), None

    init = (jnp.zeros((3, H, W)), jnp.ones((H, W)), jnp.full((H, W), jnp.inf))
    (acc_c, Tr, min_d), _ = jax.lax.scan(body, init, data)

    image = jnp.clip(acc_c + Tr[None] * bg[:, None, None], 0.0, 1.0)
    if return_depth:
        depth_map = jnp.where(jnp.isinf(min_d), 0.0, min_d)
        return image, depth_map
    return image
