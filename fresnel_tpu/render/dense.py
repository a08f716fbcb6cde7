"""Dense golden-reference renderer.

Evaluates every Gaussian at every pixel — O(N*H*W) — and composites
front-to-back with an exclusive transmittance product.  It exists to provide
numerically trustworthy goldens for the tiled/Pallas renderers and for tiny
scenes; the sequential per-Gaussian Python loops of the reference
(reference: scripts/models/differentiable_renderer.py:245-409) are replaced by
a chunked lax.scan whose within-chunk compositing is an exclusive cumulative
product — mathematically identical to the sequential loop:

    T_i = prod_{j<i} (1 - alpha_j);  contrib_i = alpha_i * T_i

The whole function is one jit-able XLA program; vmap over cameras/batches.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fresnel_tpu.core.camera import Camera
from fresnel_tpu.render.projection import project_gaussians, depth_sort_indices

ALPHA_MAX = 0.99  # reference clamps alpha to 0.99 (differentiable_renderer.py:371)


def _pixel_grid(height: int, width: int):
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    return jnp.meshgrid(xs, ys)  # X (H, W), Y (H, W)


def render_dense(
    positions: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    colors: jax.Array,
    opacities: jax.Array,
    camera: Camera,
    background: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    return_depth: bool = False,
    chunk: int = 256,
):
    """Render to a (3, H, W) image in [0, 1].

    Matches the reference dense renderer's semantics: depth-sorted
    front-to-back compositing, loose 100px screen margin for culling, alpha
    clamp at 0.99, background blended with the final transmittance.
    """
    H, W = camera.height, camera.width
    N = positions.shape[0]
    bg = jnp.asarray(background, jnp.float32)

    proj = project_gaussians(positions, scales, rotations, camera,
                             visibility_margin=100.0)
    order = depth_sort_indices(proj)

    means2d = proj.means2d[order]
    conic = proj.conic[order]
    depths = proj.depths[order]
    visible = proj.visible[order]
    colors_s = colors[order]
    opac_s = jnp.where(visible, opacities[order], 0.0)

    X, Y = _pixel_grid(H, W)

    n_chunks = max(1, -(-N // chunk))
    pad = n_chunks * chunk - N

    def pad0(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    means2d, conic, depths, colors_s, opac_s = map(
        pad0, (means2d, conic, depths, colors_s, opac_s)
    )

    def reshape_chunks(x):
        return x.reshape((n_chunks, chunk) + x.shape[1:])

    chunks = jax.tree.map(reshape_chunks, (means2d, conic, depths, colors_s, opac_s))

    def body(carry, ch):
        acc_color, acc_depth, T = carry
        m2d, cn, dep, col, op = ch
        dx = X[None] - m2d[:, 0, None, None]          # (C, H, W)
        dy = Y[None] - m2d[:, 1, None, None]
        mahal = (cn[:, 0, None, None] * dx * dx
                 + 2.0 * cn[:, 1, None, None] * dx * dy
                 + cn[:, 2, None, None] * dy * dy)
        alpha = jnp.exp(-0.5 * mahal) * op[:, None, None]
        alpha = jnp.clip(alpha, 0.0, ALPHA_MAX)
        one_m = 1.0 - alpha
        # Exclusive cumulative transmittance within the chunk.
        T_inc = jnp.cumprod(one_m, axis=0)
        T_excl = jnp.concatenate([jnp.ones_like(T_inc[:1]), T_inc[:-1]], axis=0)
        w = alpha * T_excl * T[None]                  # (C, H, W) contributions
        acc_color = acc_color + jnp.einsum("chw,cd->hwd", w, col)
        acc_depth = acc_depth + jnp.einsum("chw,c->hw", w, dep)
        T = T * T_inc[-1]
        return (acc_color, acc_depth, T), None

    init = (
        jnp.zeros((H, W, 3), jnp.float32),
        jnp.zeros((H, W), jnp.float32),
        jnp.ones((H, W), jnp.float32),
    )
    (acc_color, acc_depth, T), _ = jax.lax.scan(body, init, chunks)

    acc_color = acc_color + T[..., None] * bg
    image = jnp.clip(jnp.transpose(acc_color, (2, 0, 1)), 0.0, 1.0)
    if return_depth:
        return image, acc_depth
    return image
