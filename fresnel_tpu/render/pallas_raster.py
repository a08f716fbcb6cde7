"""Pallas TPU kernel for per-tile Gaussian compositing (forward + analytic
backward).

This is the hot inner loop of the tiled rasterizer (fresnel_tpu/render/tile.py
does projection, depth sort, and binning; this module replaces its XLA scan
compositor when backend="pallas").  The reference's equivalents are the GLSL
RENDER shader (reference: src/core/renderer/renderer.cpp:201-282) and the
autograd-through-Python-loops training renderer (reference:
scripts/models/differentiable_renderer.py:582-667); here both collapse into
one kernel with a hand-derived backward (the standard 3DGS analytic VJP).

Kernel geometry
  * Tiles are 16x16 px; each kernel instance composites a GROUP of 8 tiles
    laid side by side so the working set is a full (16, 128) VPU tile —
    stripe b (columns 16b:16b+16) belongs to tile `GROUP*g + b`.
  * Per-Gaussian parameters are broadcast to their stripe with a one-hot
    (128, 8) HIGHEST-precision matmul (an MXU gather).
  * The grid is 2D (tile-group, gaussian-chunk): chunk blocks of
    CHUNK*PACK pre-flattened floats stream through VMEM (Mosaic pipelines
    them) while accumulators/transmittance live in scratch that persists
    across the sequential chunk axis.  This keeps scoped VMEM in the tens
    of KB regardless of per-tile capacity.

Backward math (recompute-based; residuals = binned inputs + forward outputs):
walk front-to-back again keeping
  T_i = transmittance before Gaussian i
  S_i = suffix premultiplied color  sum_{j>=i} contrib_j c_j  (init: tile total)
then
  dC/dalpha_i     = T_i c_i - S_{i+1}/(1-alpha_i)
  dT_fin/dalpha_i = -T_fin/(1-alpha_i)   (T_fin comes from the forward output)
chains into means/conic/color/opacity/depth.  Binning gathers stay in XLA,
so their transpose (scatter-add back to per-Gaussian grads) composes
automatically around this custom_vjp.

PERFORMANCE STATUS (v5e, 20k Gaussians @ 512^2, M=512/tile): the XLA scan
compositor runs 29 ms fwd / 109 ms grad; this kernel is currently ~9x slower
(~62 us/grid-step overhead not explained by its VPU op count) and therefore
NOT the default backend.  It is kept as the analytic-VJP reference and the
target for further Mosaic-level optimization.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TS = 16          # tile side (pixels)
GROUP = 8        # tiles composited per kernel instance -> (16, 128) lanes
CHUNK = 16       # Gaussians per grid step along the chunk axis
ALPHA_MAX = 0.99

# Packed per-Gaussian layout (12 floats):
#   0 mx, 1 my, 2 conic_a, 3 conic_b, 4 conic_c, 5 radius,
#   6 R, 7 G, 8 B, 9 opacity, 10 depth, 11 pad
PACK = 12


def _stripe_onehot() -> np.ndarray:
    """(128, GROUP) one-hot: column stripe -> tile-in-group."""
    s = np.zeros((TS * GROUP, GROUP), np.float32)
    for c in range(TS * GROUP):
        s[c, c // TS] = 1.0
    return s


def _pixel_coords(gid, n_tiles_x: int):
    """Global pixel coords (16, 128) for the 8-tile group `gid`."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (TS, TS * GROUP), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TS, TS * GROUP), 1)
    b = cols // TS
    t_lin = gid * GROUP + b
    tx = t_lin % n_tiles_x
    ty = t_lin // n_tiles_x
    px = (tx * TS + cols % TS).astype(jnp.float32)
    py = (ty * TS + rows).astype(jnp.float32)
    return px, py


def _broadcast_chunk(onehot, rows):
    """(GROUP, CHUNK*PACK) rows -> (128, CHUNK*PACK) per-column params."""
    return jax.lax.dot(onehot, rows,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)


def _alpha_terms(v, px, py):
    """Shared forward math for one Gaussian slice v (128, PACK):
    returns (e, alpha_raw, alpha, dx, dy) as (16, 128) maps."""
    mx = v[:, 0][None, :]
    my = v[:, 1][None, :]
    ca = v[:, 2][None, :]
    cb = v[:, 3][None, :]
    cc = v[:, 4][None, :]
    rr = v[:, 5][None, :]
    op = v[:, 9][None, :]
    dx = px - mx
    dy = py - my
    m = ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy
    inside = (jnp.abs(dx) <= rr) & (jnp.abs(dy) <= rr)
    e = jnp.where(inside, jnp.exp(-0.5 * m), 0.0)
    alpha_raw = e * op
    alpha = jnp.minimum(alpha_raw, ALPHA_MAX)
    return e, alpha_raw, alpha, dx, dy


def _fwd_kernel(n_tiles_x: int,
                gauss_ref, onehot_ref, out_ref, t_ref, acc_ref):
    g = pl.program_id(0)
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    px, py = _pixel_coords(g, n_tiles_x)
    onehot = onehot_ref[:]

    @pl.when(j == 0)
    def _():
        acc_ref[0:4] = jnp.zeros((4, TS, TS * GROUP), jnp.float32)
        acc_ref[4] = jnp.ones((TS, TS * GROUP), jnp.float32)

    V = _broadcast_chunk(onehot, gauss_ref[0, 0])
    accR = acc_ref[0]
    accG = acc_ref[1]
    accB = acc_ref[2]
    accD = acc_ref[3]
    T = acc_ref[4]
    for c in range(CHUNK):
        v = V[:, c * PACK:(c + 1) * PACK]
        _, _, alpha, _, _ = _alpha_terms(v, px, py)
        w = alpha * T
        accR += w * v[:, 6][None, :]
        accG += w * v[:, 7][None, :]
        accB += w * v[:, 8][None, :]
        accD += w * v[:, 10][None, :]
        T = T * (1.0 - alpha)
    acc_ref[0] = accR
    acc_ref[1] = accG
    acc_ref[2] = accB
    acc_ref[3] = accD
    acc_ref[4] = T

    @pl.when(j == n_chunks - 1)
    def _():
        out_ref[0, 0] = acc_ref[0]
        out_ref[0, 1] = acc_ref[1]
        out_ref[0, 2] = acc_ref[2]
        out_ref[0, 3] = acc_ref[3]
        t_ref[0, 0] = acc_ref[4]


def _bwd_kernel(n_tiles_x: int,
                gauss_ref, out_ref, gout_ref, gt_ref, tfin_ref, onehot_ref,
                grad_ref, carry_ref):
    g = pl.program_id(0)
    j = pl.program_id(1)
    px, py = _pixel_coords(g, n_tiles_x)
    onehot = onehot_ref[:]

    gR = gout_ref[0, 0]
    gG = gout_ref[0, 1]
    gB = gout_ref[0, 2]
    gD = gout_ref[0, 3]
    gT = gt_ref[0, 0]
    T_fin = tfin_ref[0, 0]

    @pl.when(j == 0)
    def _():
        # carry = [T, SR, SG, SB, SD]; suffix sums start at the tile totals.
        carry_ref[0] = jnp.ones((TS, TS * GROUP), jnp.float32)
        carry_ref[1] = out_ref[0, 0]
        carry_ref[2] = out_ref[0, 1]
        carry_ref[3] = out_ref[0, 2]
        carry_ref[4] = out_ref[0, 3]

    V = _broadcast_chunk(onehot, gauss_ref[0, 0])
    T = carry_ref[0]
    SR = carry_ref[1]
    SG = carry_ref[2]
    SB = carry_ref[3]
    SD = carry_ref[4]

    rows = []
    zero_row = jnp.zeros((1, TS * GROUP), jnp.float32)
    for c in range(CHUNK):
        v = V[:, c * PACK:(c + 1) * PACK]
        e, alpha_raw, alpha, dx, dy = _alpha_terms(v, px, py)
        cR = v[:, 6][None, :]
        cG = v[:, 7][None, :]
        cB = v[:, 8][None, :]
        dep = v[:, 10][None, :]
        w = alpha * T
        one_m = jnp.maximum(1.0 - alpha, 1e-6)

        # Suffix AFTER this Gaussian.
        SR = SR - w * cR
        SG = SG - w * cG
        SB = SB - w * cB
        SD = SD - w * dep

        dalpha = (gR * (T * cR - SR / one_m)
                  + gG * (T * cG - SG / one_m)
                  + gB * (T * cB - SB / one_m)
                  + gD * (T * dep - SD / one_m)
                  - gT * T_fin / one_m)
        unclipped = (alpha_raw < ALPHA_MAX).astype(jnp.float32)
        dalpha_eff = dalpha * unclipped

        ca = v[:, 2][None, :]
        cb = v[:, 3][None, :]
        cc = v[:, 4][None, :]
        # alpha_raw = e * op;  e = exp(-0.5 m) * box
        dop = dalpha_eff * e
        dm = dalpha_eff * alpha_raw * (-0.5)
        dmx = dm * (-(2.0 * ca * dx + 2.0 * cb * dy))
        dmy = dm * (-(2.0 * cb * dx + 2.0 * cc * dy))
        dca = dm * dx * dx
        dcb = dm * 2.0 * dx * dy
        dcc = dm * dy * dy

        def rsum(q):
            return jnp.sum(q, axis=0, keepdims=True)       # (1, 128)

        rows.extend([
            rsum(dmx), rsum(dmy), rsum(dca), rsum(dcb), rsum(dcc), zero_row,
            rsum(w * gR), rsum(w * gG), rsum(w * gB), rsum(dop),
            rsum(w * gD), zero_row])

        T = T * (1.0 - alpha)

    carry_ref[0] = T
    carry_ref[1] = SR
    carry_ref[2] = SG
    carry_ref[3] = SB
    carry_ref[4] = SD

    # One stripe-reduction matmul per chunk: (C*PACK, 128) @ (128, 8).
    stacked = jnp.concatenate(rows, axis=0)                 # (C*PACK, 128)
    G = jax.lax.dot(stacked, onehot,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)     # (C*PACK, 8)
    grad_ref[0, 0] = G.T                              # (8, C*PACK)


def _run_forward(g_pack: jax.Array, n_tiles_x: int, interpret: bool):
    n_groups, n_chunks, _, _ = g_pack.shape
    onehot = jnp.asarray(_stripe_onehot())
    out, t = pl.pallas_call(
        functools.partial(_fwd_kernel, n_tiles_x),
        grid=(n_groups, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, GROUP, CHUNK * PACK),
                         lambda g, j: (g, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),          # onehot
        ],
        out_specs=[
            pl.BlockSpec((1, 4, TS, TS * GROUP), lambda g, j: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TS, TS * GROUP), lambda g, j: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_groups, 4, TS, TS * GROUP), jnp.float32),
            jax.ShapeDtypeStruct((n_groups, 1, TS, TS * GROUP), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((5, TS, TS * GROUP), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(g_pack, onehot)
    return out, t[:, 0]


def _run_backward(g_pack, out, g_out, g_t, t_fin, n_tiles_x: int,
                  interpret: bool):
    n_groups, n_chunks, _, _ = g_pack.shape
    onehot = jnp.asarray(_stripe_onehot())

    def group_spec(g, j):
        return (g, 0, 0, 0)

    grads = pl.pallas_call(
        functools.partial(_bwd_kernel, n_tiles_x),
        grid=(n_groups, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, GROUP, CHUNK * PACK),
                         lambda g, j: (g, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, TS, TS * GROUP), group_spec,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, TS, TS * GROUP), group_spec,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TS, TS * GROUP), group_spec,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TS, TS * GROUP), group_spec,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),          # onehot
        ],
        out_specs=pl.BlockSpec((1, 1, GROUP, CHUNK * PACK),
                               lambda g, j: (g, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_groups, n_chunks, GROUP, CHUNK * PACK), jnp.float32),
        scratch_shapes=[pltpu.VMEM((5, TS, TS * GROUP), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(g_pack, out, g_out, g_t[:, None], t_fin[:, None], onehot)
    return grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def composite_pallas(g_pack: jax.Array, n_tiles_x: int,
                     interpret: bool = False):
    """g_pack: (n_groups, GROUP, n_chunks, CHUNK*PACK) binned, depth-ordered,
    chunk-flattened Gaussians (see module docstring; masked entries must have
    opacity 0).  Returns (out (n_groups, 4, 16, 128) premultiplied
    [R,G,B,depth], T (n_groups, 16, 128) transmittance)."""
    return _run_forward(g_pack, n_tiles_x, interpret)


def _composite_fwd(g_pack, n_tiles_x, interpret):
    out, t = _run_forward(g_pack, n_tiles_x, interpret)
    return (out, t), (g_pack, out, t)


def _composite_bwd(n_tiles_x, interpret, res, cots):
    g_pack, out, t_fin = res
    g_out, g_t = cots
    grads = _run_backward(g_pack, out, g_out, g_t, t_fin, n_tiles_x,
                          interpret)
    return (grads,)


composite_pallas.defvjp(_composite_fwd, _composite_bwd)


def composite_tiles_pallas(
    px, py,  # unused (coords derived from program id); kept for API parity
    g_mean, g_conic, g_color, g_op, g_depth, g_radius, valid,
    n_tiles_x: int, interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Adapter matching tile.py's _composite_tiles signature.

    Inputs are (T, M, ...) binned arrays; returns (color (T, P, 3),
    depth (T, P), transmittance (T, P)) with P = 256.
    """
    T_tiles, M = valid.shape
    pad_t = (-T_tiles) % GROUP
    m_cap = max(CHUNK, -(-M // CHUNK) * CHUNK)

    op_masked = jnp.where(valid, g_op, 0.0)
    pack = jnp.concatenate(
        [g_mean, g_conic, g_radius[..., None], g_color,
         op_masked[..., None], g_depth[..., None],
         jnp.zeros_like(g_op)[..., None]], axis=-1)       # (T, M, 12)
    pack = jnp.pad(pack, ((0, pad_t), (0, m_cap - M), (0, 0)))
    n_groups = (T_tiles + pad_t) // GROUP
    # Chunk-flattened layout: (n_groups, n_chunks, GROUP, CHUNK*PACK) — the
    # (GROUP, CHUNK*PACK) minor dims satisfy Mosaic's (8k, full) block rule.
    pack = pack.reshape(n_groups, GROUP, m_cap // CHUNK, CHUNK * PACK)
    pack = pack.transpose(0, 2, 1, 3)

    out, t = composite_pallas(pack, n_tiles_x, interpret)

    # (n_groups, 4, 16, 128) -> per-tile (T, 256, 4)
    out = out.reshape(n_groups, 4, TS, GROUP, TS).transpose(0, 3, 2, 4, 1)
    out = out.reshape(n_groups * GROUP, TS * TS, 4)[:T_tiles]
    t = t.reshape(n_groups, TS, GROUP, TS).transpose(0, 2, 1, 3)
    t = t.reshape(n_groups * GROUP, TS * TS)[:T_tiles]
    return out[..., 0:3], out[..., 3], t
