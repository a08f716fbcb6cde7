"""Tile-binned differentiable rasterizer — the main training renderer.

The reference's "TileBasedRenderer" iterates Gaussians in a Python loop and
only *bounds-boxes* each one (reference:
scripts/models/differentiable_renderer.py:412-686 — and its C++ renderer does
no tile binning at all, every pixel walks the full sorted list,
src/core/renderer/renderer.cpp:201-282).  This implementation does the real
thing, designed for XLA:

  1. project + 3-sigma radius for every Gaussian            (vectorized jnp)
  2. global front-to-back depth sort                         (lax.sort)
  3. per-tile binning: each 16x16 tile selects the (up to M) nearest
     intersecting Gaussians, preserving depth order          (argsort compaction)
  4. per-tile front-to-back compositing over Gaussian chunks (lax.scan),
     exclusive-cumprod transmittance within a chunk

Everything is static-shape and mask-based: no recompiles across frames, and
jax.grad differentiates straight through (gather -> scatter-add in reverse).
vmap over the leading axis for batched rendering.  A Pallas kernel version of
step 4 lives in pallas_raster.py; this module is the portable XLA fallback
and the autodiff reference.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fresnel_tpu.core.camera import Camera
from fresnel_tpu.render.projection import project_gaussians, depth_sort_indices

ALPHA_MAX = 0.99
TWO_PI = 6.283185307179586


@dataclasses.dataclass(frozen=True)
class TileRendererConfig:
    tile_size: int = 16
    max_per_tile: int = 256      # static cap on Gaussians binned per tile
    max_radius: float = 64.0     # reference caps the 3-sigma radius at 64 px
    chunk: int = 32              # Gaussians composited per scan step
    use_phase_blending: bool = False
    phase_amplitude: float = 0.25
    hard_cutoff: bool = True     # zero alpha outside the 3-sigma box (matches
                                 # the reference's bbox-clipped evaluation)


def _bin_gaussians(means2d, radii, visible, n_tiles_x, n_tiles_y, tile_size,
                   max_per_tile):
    """Per-tile compaction of depth-sorted Gaussian indices.

    Returns (tile_indices (T, M) int32, tile_valid (T, M) bool) where T is the
    tile count and entries are indices into the *sorted* Gaussian arrays, in
    depth order.  Overflow beyond M drops the farthest Gaussians (they are the
    most occluded).
    """
    ts = float(tile_size)
    tx = jnp.arange(n_tiles_x, dtype=jnp.float32) * ts          # tile x0
    ty = jnp.arange(n_tiles_y, dtype=jnp.float32) * ts
    x0 = jnp.tile(tx, n_tiles_y)                                 # (T,)
    y0 = jnp.repeat(ty, n_tiles_x)

    u = means2d[:, 0][None, :]                                   # (1, N)
    v = means2d[:, 1][None, :]
    r = radii[None, :]
    hit = (u + r >= x0[:, None]) & (u - r < (x0 + ts)[:, None])
    hit &= (v + r >= y0[:, None]) & (v - r < (y0 + ts)[:, None])
    hit &= visible[None, :]                                      # (T, N)

    count = jnp.sum(hit, axis=1)
    # Per-row compaction WITHOUT a sort: the slot of Gaussian j in tile t is
    # its exclusive running count of hits, scattered with out-of-capacity
    # hits dropped.  O(T*N) cumsum+scatter — a (T, N) argsort is a per-row
    # O(N log^2 N) TPU sort and dominates runtime beyond ~10k Gaussians.
    n = hit.shape[1]
    T = hit.shape[0]
    slot = jnp.cumsum(hit, axis=1, dtype=jnp.int32) - 1          # (T, N)
    slot = jnp.where(hit & (slot < max_per_tile), slot, max_per_tile)
    j_idx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[None, :], (T, n))
    tile_indices = jnp.zeros((T, max_per_tile + 1), jnp.int32)
    tile_indices = tile_indices.at[
        jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[:, None], (T, n)),
        slot,
    ].set(j_idx, mode="drop")[:, :max_per_tile]
    tile_valid = (
        jnp.arange(max_per_tile, dtype=jnp.int32)[None, :] < count[:, None]
    )
    return tile_indices, tile_valid


def _composite_tiles(px, py, g_mean, g_conic, g_color, g_op, g_depth, g_radius,
                     valid, cfg: TileRendererConfig, g_phase=None):
    """Front-to-back compositing of binned Gaussians over tile pixels.

    px, py: (T, P) pixel coordinates per tile; g_*: (T, M, ...) binned params.
    Returns (color (T, P, 3), depth (T, P), transmittance (T, P)).
    """
    T_tiles, M = valid.shape
    P = px.shape[1]
    n_chunks = M // cfg.chunk if g_phase is None else M
    chunk = cfg.chunk if g_phase is None else 1
    assert M % chunk == 0

    def slice_chunk(x, i):
        return jax.lax.dynamic_slice_in_dim(x, i * chunk, chunk, axis=1)

    def alpha_for(ch_mean, ch_conic, ch_op, ch_radius, ch_valid):
        dx = px[:, None, :] - ch_mean[..., 0][..., None]         # (T, C, P)
        dy = py[:, None, :] - ch_mean[..., 1][..., None]
        mahal = (ch_conic[..., 0][..., None] * dx * dx
                 + 2.0 * ch_conic[..., 1][..., None] * dx * dy
                 + ch_conic[..., 2][..., None] * dy * dy)
        alpha = jnp.exp(-0.5 * mahal) * ch_op[..., None]
        if cfg.hard_cutoff:
            rr = ch_radius[..., None]
            inside = (jnp.abs(dx) <= rr) & (jnp.abs(dy) <= rr)
            alpha = jnp.where(inside, alpha, 0.0)
        alpha = jnp.where(ch_valid[..., None], alpha, 0.0)
        return jnp.clip(alpha, 0.0, ALPHA_MAX)

    if g_phase is None:
        def body(carry, i):
            acc_c, acc_d, Tr = carry
            ch_mean = slice_chunk(g_mean, i)
            ch_conic = slice_chunk(g_conic, i)
            ch_color = slice_chunk(g_color, i)
            ch_op = slice_chunk(g_op, i)
            ch_depth = slice_chunk(g_depth, i)
            ch_radius = slice_chunk(g_radius, i)
            ch_valid = slice_chunk(valid, i)
            alpha = alpha_for(ch_mean, ch_conic, ch_op, ch_radius, ch_valid)
            one_m = 1.0 - alpha
            T_inc = jnp.cumprod(one_m, axis=1)                   # (T, C, P)
            T_excl = jnp.concatenate(
                [jnp.ones_like(T_inc[:, :1]), T_inc[:, :-1]], axis=1)
            w = alpha * T_excl * Tr[:, None, :]                  # contributions
            acc_c = acc_c + jnp.einsum("tcp,tcd->tpd", w, ch_color)
            acc_d = acc_d + jnp.einsum("tcp,tc->tp", w, ch_depth)
            Tr = Tr * T_inc[:, -1]
            return (acc_c, acc_d, Tr), None

        init = (jnp.zeros((T_tiles, P, 3), jnp.float32),
                jnp.zeros((T_tiles, P), jnp.float32),
                jnp.ones((T_tiles, P), jnp.float32))
        (acc_c, acc_d, Tr), _ = jax.lax.scan(
            body, init, jnp.arange(n_chunks))
        return acc_c, acc_d, Tr

    # Phase-blending path: strictly sequential per Gaussian because each
    # alpha depends on the running weighted-average phase
    # (reference: differentiable_renderer.py:629-667).
    def body(carry, i):
        acc_c, acc_d, Tr, acc_phase = carry
        ch_mean = slice_chunk(g_mean, i)[:, 0]
        ch_conic = slice_chunk(g_conic, i)[:, 0]
        ch_color = slice_chunk(g_color, i)[:, 0]
        ch_op = slice_chunk(g_op, i)[:, 0]
        ch_depth = slice_chunk(g_depth, i)[:, 0]
        ch_radius = slice_chunk(g_radius, i)[:, 0]
        ch_valid = slice_chunk(valid, i)[:, 0]
        ch_phase = slice_chunk(g_phase, i)[:, 0]

        dx = px - ch_mean[:, 0:1]
        dy = py - ch_mean[:, 1:2]
        mahal = (ch_conic[:, 0:1] * dx * dx + 2.0 * ch_conic[:, 1:2] * dx * dy
                 + ch_conic[:, 2:3] * dy * dy)
        alpha = jnp.exp(-0.5 * mahal) * ch_op[:, None]
        if cfg.hard_cutoff:
            rr = ch_radius[:, None]
            alpha = jnp.where((jnp.abs(dx) <= rr) & (jnp.abs(dy) <= rr), alpha, 0.0)
        alpha = jnp.where(ch_valid[:, None], alpha, 0.0)

        # Interference factor against the accumulated phase (unit-interval
        # phases, wrap-around distance).
        phase_diff = jnp.abs(ch_phase[:, None] - acc_phase)
        phase_diff = jnp.minimum(phase_diff, 1.0 - phase_diff)
        interference = (1.0 - cfg.phase_amplitude
                        + cfg.phase_amplitude * jnp.cos(phase_diff * TWO_PI))
        alpha = jnp.clip(alpha * interference, 0.0, ALPHA_MAX)

        w = alpha * Tr
        acc_c = acc_c + w[..., None] * ch_color[:, None, :]
        acc_d = acc_d + w * ch_depth[:, None]
        new_acc_alpha = (1.0 - Tr) + w
        Tr = Tr * (1.0 - alpha)
        phase_contrib = w / jnp.maximum(new_acc_alpha, 1e-6)
        acc_phase = acc_phase * (1.0 - phase_contrib) + ch_phase[:, None] * phase_contrib
        return (acc_c, acc_d, Tr, acc_phase), None

    init = (jnp.zeros((T_tiles, P, 3), jnp.float32),
            jnp.zeros((T_tiles, P), jnp.float32),
            jnp.ones((T_tiles, P), jnp.float32),
            jnp.zeros((T_tiles, P), jnp.float32))
    (acc_c, acc_d, Tr, _), _ = jax.lax.scan(body, init, jnp.arange(M))
    return acc_c, acc_d, Tr


@functools.partial(
    jax.jit,
    static_argnames=("config", "return_depth", "background"),
)
def render_tiled(
    positions: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    colors: jax.Array,
    opacities: jax.Array,
    camera: Camera,
    phases: Optional[jax.Array] = None,
    background: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    return_depth: bool = False,
    config: TileRendererConfig = TileRendererConfig(),
):
    """Render a Gaussian cloud to a (3, H, W) image in [0, 1].

    `phases` (unit interval, per Gaussian) activates interference blending
    when config.use_phase_blending is set.
    """
    cfg = config
    H, W = camera.height, camera.width
    ts = cfg.tile_size
    n_tiles_x = -(-W // ts)
    n_tiles_y = -(-H // ts)
    T_tiles = n_tiles_x * n_tiles_y
    P = ts * ts
    bg = jnp.asarray(background, jnp.float32)

    proj = project_gaussians(positions, scales, rotations, camera,
                             max_radius=cfg.max_radius)
    # Zero-opacity Gaussians (masked entries from static-shape pipelines like
    # SAAG) contribute nothing — drop them from binning so they don't occupy
    # per-tile capacity slots.
    proj = dataclasses.replace(proj, visible=proj.visible & (opacities > 0.0))
    order = depth_sort_indices(proj)

    means2d = proj.means2d[order]
    conic = proj.conic[order]
    depths = proj.depths[order]
    radii = proj.radii[order]
    visible = proj.visible[order]
    colors_s = colors[order]
    opac_s = jnp.where(visible, opacities[order], 0.0)
    phases_s = phases[order] if phases is not None else None

    # Static per-tile capacity: a multiple of the chunk size, never more than
    # one chunk-rounding above N itself.
    N = positions.shape[0]
    m_cap = min(cfg.max_per_tile, N)
    m_cap = -(-m_cap // cfg.chunk) * cfg.chunk

    tile_idx, tile_valid = _bin_gaussians(
        means2d, radii, visible, n_tiles_x, n_tiles_y, ts, m_cap)

    g_mean = means2d[tile_idx]        # (T, M, 2)
    g_conic = conic[tile_idx]
    g_color = colors_s[tile_idx]
    g_op = opac_s[tile_idx]
    g_depth = depths[tile_idx]
    g_radius = radii[tile_idx]
    g_phase = None
    if cfg.use_phase_blending and phases_s is not None:
        ph = phases_s if phases_s.ndim == 1 else phases_s[..., 0]
        g_phase = ph[tile_idx]

    # Per-tile pixel coordinates (T, P).
    tx = jnp.arange(n_tiles_x, dtype=jnp.float32) * ts
    ty = jnp.arange(n_tiles_y, dtype=jnp.float32) * ts
    x0 = jnp.tile(tx, n_tiles_y)[:, None]
    y0 = jnp.repeat(ty, n_tiles_x)[:, None]
    lx = jnp.tile(jnp.arange(ts, dtype=jnp.float32), ts)[None, :]
    ly = jnp.repeat(jnp.arange(ts, dtype=jnp.float32), ts)[None, :]
    px = x0 + lx                      # (T, P)
    py = y0 + ly

    acc_c, acc_d, Tr = _composite_tiles(
        px, py, g_mean, g_conic, g_color, g_op, g_depth, g_radius,
        tile_valid, cfg, g_phase=g_phase)

    acc_c = acc_c + Tr[..., None] * bg

    # Reassemble (T, P, 3) tiles into the padded image, then crop.
    img = acc_c.reshape(n_tiles_y, n_tiles_x, ts, ts, 3)
    img = img.transpose(0, 2, 1, 3, 4).reshape(n_tiles_y * ts, n_tiles_x * ts, 3)
    img = jnp.clip(img[:H, :W], 0.0, 1.0).transpose(2, 0, 1)

    if return_depth:
        dep = acc_d.reshape(n_tiles_y, n_tiles_x, ts, ts)
        dep = dep.transpose(0, 2, 1, 3).reshape(n_tiles_y * ts, n_tiles_x * ts)
        return img, dep[:H, :W]
    return img
