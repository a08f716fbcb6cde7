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
  * The grid is 2D (tile-group, gaussian-chunk): CHUNK Gaussians stream per
    step while accumulators/transmittance persist in VMEM scratch across the
    sequential chunk axis.
  * Per-Gaussian parameters are broadcast to their stripes with ONE one-hot
    (128, 8) HIGHEST-precision matmul per chunk; the pack layout is
    FIELD-MAJOR (columns f*CHUNK + c) so each field slices out as a
    contiguous (128, CHUNK) block.
  * The chunk dimension is VECTORIZED, not unrolled: compositing uses the
    exclusive-cumprod transmittance identity over (CHUNK, 16, 128) tensors
    (Mosaic does not reuse stack slots across unrolled iterations — an
    unrolled chunk loop blew scoped VMEM linearly in CHUNK and ran 9x slower
    than XLA; see experiments/README.md T-003).

Backward math (recompute-based; residuals = binned inputs + forward outputs):
with T_i = transmittance before Gaussian i and S_i = suffix premultiplied
color Σ_{j>=i} contrib_j c_j (computed from the tile total via an inclusive
cumsum),
  dC/dα_i     = T_i c_i − S_{i+1}/(1−α_i)
  dT_fin/dα_i = −T_fin/(1−α_i)          (T_fin comes from the forward output)
then chains into means/conic/color/opacity/depth.  Binning gathers stay in
XLA, so their transpose (scatter-add back to per-Gaussian grads) composes
automatically around this custom_vjp.
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
CHUNK = 64       # Gaussians per grid step (vectorized, not unrolled)
ALPHA_MAX = 0.99

# Packed per-Gaussian field order (field-major within a chunk):
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


def _fields(gauss_ref, onehot):
    """Load + broadcast one chunk: returns dict of (CHUNK, 1, 128) per-field
    column tensors ready to broadcast against (16, 128) pixel maps."""
    rows = gauss_ref[0, 0]                                  # (8, PACK*CHUNK)
    V = jax.lax.dot(onehot, rows,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)     # (128, PACK*CHUNK)
    out = {}
    names = ["mx", "my", "ca", "cb", "cc", "rr",
             "cR", "cG", "cB", "op", "dep", "pad"]
    for f, name in enumerate(names):
        blk = V[:, f * CHUNK:(f + 1) * CHUNK]               # (128, CHUNK)
        out[name] = blk.T[:, None, :]                       # (CHUNK, 1, 128)
    return out


def _cumprod0(x):
    """Inclusive cumprod along axis 0 (Hillis-Steele log-step scan; Mosaic
    has no cumprod primitive)."""
    n = x.shape[0]
    shift = 1
    while shift < n:
        x = x * jnp.concatenate(
            [jnp.ones_like(x[:shift]), x[:-shift]], axis=0)
        shift *= 2
    return x


def _cumsum0(x):
    """Inclusive cumsum along axis 0 (log-step scan)."""
    n = x.shape[0]
    shift = 1
    while shift < n:
        x = x + jnp.concatenate(
            [jnp.zeros_like(x[:shift]), x[:-shift]], axis=0)
        shift *= 2
    return x


def _alpha_chunk(F, px, py):
    """Vectorized alpha for the whole chunk: returns (e, alpha_raw, alpha,
    dx, dy) as (CHUNK, 16, 128) tensors."""
    dx = px[None] - F["mx"]
    dy = py[None] - F["my"]
    m = F["ca"] * dx * dx + 2.0 * F["cb"] * dx * dy + F["cc"] * dy * dy
    inside = (jnp.abs(dx) <= F["rr"]) & (jnp.abs(dy) <= F["rr"])
    e = jnp.where(inside, jnp.exp(-0.5 * m), 0.0)
    alpha_raw = e * F["op"]
    alpha = jnp.minimum(alpha_raw, ALPHA_MAX)
    return e, alpha_raw, alpha, dx, dy


def _fwd_kernel(n_tiles_x: int,
                gauss_ref, onehot_ref, cnt_ref, out_ref, t_ref, acc_ref):
    g = pl.program_id(0)
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    px, py = _pixel_coords(g, n_tiles_x)

    @pl.when(j == 0)
    def _():
        acc_ref[0:4] = jnp.zeros((4, TS, TS * GROUP), jnp.float32)
        acc_ref[4] = jnp.ones((TS, TS * GROUP), jnp.float32)

    # Occupancy early-out: chunks beyond the group's max per-tile count hold
    # only sentinel slots (opacity 0) and contribute nothing — skip the VPU
    # work entirely.  Typical tiles fill a fraction of the static capacity.
    maxc = jnp.max(cnt_ref[0, 0])

    @pl.when((j * CHUNK) < maxc)
    def _():
        F = _fields(gauss_ref, onehot_ref[:])
        _, _, alpha, _, _ = _alpha_chunk(F, px, py)

        T_in = acc_ref[4]
        one_m = 1.0 - alpha
        T_inc = _cumprod0(one_m)                            # (C, 16, 128)
        T_excl = jnp.concatenate(
            [jnp.ones((1, TS, TS * GROUP), jnp.float32), T_inc[:-1]], axis=0)
        w = alpha * T_excl * T_in[None]

        acc_ref[0] = acc_ref[0] + jnp.sum(w * F["cR"], axis=0)
        acc_ref[1] = acc_ref[1] + jnp.sum(w * F["cG"], axis=0)
        acc_ref[2] = acc_ref[2] + jnp.sum(w * F["cB"], axis=0)
        acc_ref[3] = acc_ref[3] + jnp.sum(w * F["dep"], axis=0)
        acc_ref[4] = T_in * T_inc[CHUNK - 1]

    @pl.when(j == n_chunks - 1)
    def _():
        out_ref[0, 0] = acc_ref[0]
        out_ref[0, 1] = acc_ref[1]
        out_ref[0, 2] = acc_ref[2]
        out_ref[0, 3] = acc_ref[3]
        t_ref[0, 0] = acc_ref[4]


def _bwd_kernel(n_tiles_x: int,
                gauss_ref, out_ref, gout_ref, gt_ref, tfin_ref, onehot_ref,
                cnt_ref, grad_ref, carry_ref):
    g = pl.program_id(0)
    j = pl.program_id(1)
    px, py = _pixel_coords(g, n_tiles_x)
    onehot = onehot_ref[:]

    gR = gout_ref[0, 0][None]
    gG = gout_ref[0, 1][None]
    gB = gout_ref[0, 2][None]
    gD = gout_ref[0, 3][None]
    gT = gt_ref[0, 0][None]
    T_fin = tfin_ref[0, 0][None]

    @pl.when(j == 0)
    def _():
        # carry = [T, SR, SG, SB, SD]; suffix sums start at the tile totals.
        carry_ref[0] = jnp.ones((TS, TS * GROUP), jnp.float32)
        carry_ref[1] = out_ref[0, 0]
        carry_ref[2] = out_ref[0, 1]
        carry_ref[3] = out_ref[0, 2]
        carry_ref[4] = out_ref[0, 3]

    # Same occupancy early-out as the forward; skipped chunks are all
    # sentinel slots: zero contribution forward, zero gradient back, and the
    # carry (T, suffix sums) is unchanged.  The grad block must still be
    # written — it is a per-(group, chunk) output.
    maxc = jnp.max(cnt_ref[0, 0])
    active = (j * CHUNK) < maxc

    @pl.when(jnp.logical_not(active))
    def _():
        grad_ref[0, 0] = jnp.zeros((GROUP, PACK * CHUNK), jnp.float32)

    @pl.when(active)
    def _():
        _bwd_chunk_body(gauss_ref, onehot, grad_ref, carry_ref,
                        px, py, gR, gG, gB, gD, gT, T_fin)


def _bwd_chunk_body(gauss_ref, onehot, grad_ref, carry_ref,
                    px, py, gR, gG, gB, gD, gT, T_fin):
    F = _fields(gauss_ref, onehot)
    e, alpha_raw, alpha, dx, dy = _alpha_chunk(F, px, py)

    T_carry = carry_ref[0]
    one_m_full = 1.0 - alpha
    T_inc = _cumprod0(one_m_full)
    T_excl = jnp.concatenate(
        [jnp.ones((1, TS, TS * GROUP), jnp.float32), T_inc[:-1]], axis=0)
    T_before = T_excl * T_carry[None]                       # (C, 16, 128)
    w = alpha * T_before

    wR = w * F["cR"]
    wG = w * F["cG"]
    wB = w * F["cB"]
    wD = w * F["dep"]

    # Suffix AFTER each Gaussian: S_in − inclusive-cumsum of contributions.
    SR_after = carry_ref[1][None] - _cumsum0(wR)
    SG_after = carry_ref[2][None] - _cumsum0(wG)
    SB_after = carry_ref[3][None] - _cumsum0(wB)
    SD_after = carry_ref[4][None] - _cumsum0(wD)

    one_m = jnp.maximum(one_m_full, 1e-6)
    dalpha = (gR * (T_before * F["cR"] - SR_after / one_m)
              + gG * (T_before * F["cG"] - SG_after / one_m)
              + gB * (T_before * F["cB"] - SB_after / one_m)
              + gD * (T_before * F["dep"] - SD_after / one_m)
              - gT * T_fin / one_m)
    dalpha_eff = dalpha * (alpha_raw < ALPHA_MAX).astype(jnp.float32)

    dop = dalpha_eff * e
    dm = dalpha_eff * alpha_raw * (-0.5)
    dmx = dm * (-(2.0 * F["ca"] * dx + 2.0 * F["cb"] * dy))
    dmy = dm * (-(2.0 * F["cb"] * dx + 2.0 * F["cc"] * dy))
    dca = dm * dx * dx
    dcb = dm * 2.0 * dx * dy
    dcc = dm * dy * dy

    # Per-gaussian stripe reductions: sum rows -> (C, 128), then contract the
    # 128 stripe columns with the one-hot -> (C, 8), all fields in ONE matmul
    # stacked field-major to match the grad pack layout.
    zero = jnp.zeros((CHUNK, TS * GROUP), jnp.float32)

    def rsum(q):
        return jnp.sum(q, axis=1)                           # (C, 128)

    stacked = jnp.concatenate(
        [rsum(dmx), rsum(dmy), rsum(dca), rsum(dcb), rsum(dcc), zero,
         rsum(w * gR), rsum(w * gG), rsum(w * gB), rsum(dop),
         rsum(w * gD), zero], axis=0)                       # (PACK*C, 128)
    G = jax.lax.dot(stacked, onehot,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)     # (PACK*C, 8)
    grad_ref[0, 0] = G.T                                    # (8, PACK*C)

    carry_ref[0] = T_carry * T_inc[CHUNK - 1]
    carry_ref[1] = SR_after[CHUNK - 1]
    carry_ref[2] = SG_after[CHUNK - 1]
    carry_ref[3] = SB_after[CHUNK - 1]
    carry_ref[4] = SD_after[CHUNK - 1]


def _run_forward(g_pack: jax.Array, counts: jax.Array, n_tiles_x: int,
                 interpret: bool):
    n_groups, n_chunks, _, _ = g_pack.shape
    onehot = jnp.asarray(_stripe_onehot())
    out, t = pl.pallas_call(
        functools.partial(_fwd_kernel, n_tiles_x),
        grid=(n_groups, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, GROUP, PACK * CHUNK),
                         lambda g, j: (g, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),          # onehot
            pl.BlockSpec((1, 1, 128), lambda g, j: (g, 0, 0),
                         memory_space=pltpu.VMEM),          # counts
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
    )(g_pack, onehot, counts)
    return out, t[:, 0]


def _run_backward(g_pack, counts, out, g_out, g_t, t_fin, n_tiles_x: int,
                  interpret: bool):
    n_groups, n_chunks, _, _ = g_pack.shape
    onehot = jnp.asarray(_stripe_onehot())

    def group_spec(g, j):
        return (g, 0, 0, 0)

    grads = pl.pallas_call(
        functools.partial(_bwd_kernel, n_tiles_x),
        grid=(n_groups, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, GROUP, PACK * CHUNK),
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
            pl.BlockSpec((1, 1, 128), lambda g, j: (g, 0, 0),
                         memory_space=pltpu.VMEM),          # counts
        ],
        out_specs=pl.BlockSpec((1, 1, GROUP, PACK * CHUNK),
                               lambda g, j: (g, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_groups, n_chunks, GROUP, PACK * CHUNK), jnp.float32),
        scratch_shapes=[pltpu.VMEM((5, TS, TS * GROUP), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(g_pack, out, g_out, g_t[:, None], t_fin[:, None], onehot, counts)
    return grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def composite_pallas(g_pack: jax.Array, counts: jax.Array, n_tiles_x: int,
                     interpret: bool = False):
    """g_pack: (n_groups, n_chunks, GROUP, PACK*CHUNK) binned, depth-ordered,
    FIELD-MAJOR-packed Gaussians (see module docstring; masked entries must
    have opacity 0).  counts: (n_groups, 1, 128) f32, lane b < GROUP holding
    tile b's occupied-slot count (chunks past the group max are skipped).
    Returns (out (n_groups, 4, 16, 128) premultiplied [R,G,B,depth],
    T (n_groups, 16, 128) transmittance)."""
    return _run_forward(g_pack, counts, n_tiles_x, interpret)


def _composite_fwd(g_pack, counts, n_tiles_x, interpret):
    out, t = _run_forward(g_pack, counts, n_tiles_x, interpret)
    return (out, t), (g_pack, counts, out, t)


def _composite_bwd(n_tiles_x, interpret, res, cots):
    g_pack, counts, out, t_fin = res
    g_out, g_t = cots
    grads = _run_backward(g_pack, counts, out, g_out, g_t, t_fin, n_tiles_x,
                          interpret)
    return (grads, jnp.zeros_like(counts))


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
    # Invalid slots are masked through BOTH opacity and radius: radius -1
    # makes the inside-box test false everywhere, so e == 0 and no gradient
    # (incl. d/d-opacity) can leak out of dead entries.
    op_masked = jnp.where(valid, g_op, 0.0)
    # stop_gradient: the radius only gates the inside-box test (no true
    # derivative), and a LITERAL zero cotangent flowing back into
    # effective_radius hits sqrt'(0) = inf for exactly-isotropic Gaussians
    # (trace^2 == 4 det) -> NaN; a symbolic zero skips that VJP entirely.
    rad_masked = jax.lax.stop_gradient(jnp.where(valid, g_radius, -1.0))
    pack = jnp.concatenate(
        [g_mean, g_conic, rad_masked[..., None], g_color,
         op_masked[..., None], g_depth[..., None],
         jnp.zeros_like(g_op)[..., None]], axis=-1)       # (T, M, PACK)
    return composite_tiles_pallas_packed(pack, n_tiles_x, interpret)


def composite_tiles_pallas_packed(
    pack, n_tiles_x: int, interpret: bool = False, counts=None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Packed-input adapter: pack is (T, M, PACK) with field order
    [mean(2), conic(3), radius(1), color(3), opacity(1), depth(1), pad(1)],
    invalid slots already masked (opacity 0, radius -1, radius gradient
    stopped).  This is the fast path for callers that assemble the per-tile
    lists with ONE gather from a per-Gaussian packed table instead of six
    separate fancy-index gathers (the gathers dominate the pre-kernel cost
    at 512^2 / 20k Gaussians: ~11 ms of the 36 ms forward).
    """
    T_tiles, M, _ = pack.shape
    pad_t = (-T_tiles) % GROUP
    m_cap = max(CHUNK, -(-M // CHUNK) * CHUNK)
    pack = jnp.pad(pack, ((0, pad_t), (0, m_cap - M), (0, 0)))
    n_groups = (T_tiles + pad_t) // GROUP
    n_chunks = m_cap // CHUNK
    # Field-major chunk layout: (n_groups, n_chunks, GROUP, PACK*CHUNK) with
    # columns ordered f*CHUNK + c.
    pack = pack.reshape(n_groups, GROUP, n_chunks, CHUNK, PACK)
    pack = pack.transpose(0, 2, 1, 4, 3).reshape(
        n_groups, n_chunks, GROUP, PACK * CHUNK)

    # Per-tile occupancy lanes for the kernel's chunk early-out; without
    # counts every chunk is treated as occupied.
    if counts is None:
        cnt = jnp.full((T_tiles,), float(m_cap), jnp.float32)
    else:
        cnt = jax.lax.stop_gradient(counts).astype(jnp.float32)
    cnt = jnp.pad(cnt, (0, pad_t)).reshape(n_groups, 1, GROUP)
    cnt = jnp.pad(cnt, ((0, 0), (0, 0), (0, 128 - GROUP)))

    out, t = composite_pallas(pack, cnt, n_tiles_x, interpret)

    # (n_groups, 4, 16, 128) -> per-tile (T, 256, 4)
    out = out.reshape(n_groups, 4, TS, GROUP, TS).transpose(0, 3, 2, 4, 1)
    out = out.reshape(n_groups * GROUP, TS * TS, 4)[:T_tiles]
    t = t.reshape(n_groups, TS, GROUP, TS).transpose(0, 2, 1, 3)
    t = t.reshape(n_groups * GROUP, TS * TS)[:T_tiles]
    return out[..., 0:3], out[..., 3], t
