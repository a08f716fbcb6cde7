"""Pallas TPU kernel for the search-binning rank table.

The XLA table build materializes three full-size intermediates per group —
the (N, T) boolean hit matrix, its bf16 copy, and the in-chunk cumsum —
then pays a fourth pass to transpose into the search-friendly (T, N)
layout (~45 ms of the 204 ms forward at 1M Gaussians, experiments/README.md
T-011/T-013).  This kernel fuses all of it:

  * each grid step owns a (TILE_BLOCK, 256) output block: it recomputes the
    hit bits on the fly from the per-Gaussian tile-interval vectors (four
    int32 compares against the block's tile coordinates — no hit matrix in
    HBM at all), and
  * right-multiplies by an upper-triangular ones matrix, turning the
    in-chunk inclusive cumsum into ONE (TB, 256) x (256, 256) bf16 MXU
    matmul whose output is ALREADY in the transposed (tiles, gaussians)
    layout — no separate transpose pass.  In-chunk counts are <= 256,
    exactly representable in bf16.

HBM traffic drops to just the table write (+ tiny interval vectors), ~4x
less than the XLA path.  Outputs are bit-identical (integer hit logic and
exact-in-bf16 counts both ways — tests/test_render.py::TestSearchBinning).

The kernel is forward-only by construction: every output is integer-valued
(tile indices / counts), so no VJP is needed — gradients flow through the
gather of binned Gaussian PARAMETERS in tile.py, not through binning.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 256       # Gaussians per chunk (= the bf16-exact cumsum bound)
TILE_BLOCK = 256  # tiles per kernel instance (sublane dim of the block)
CPC = 8           # chunks per kernel instance — amortizes per-grid-step
                  # overhead (one chunk/step measured SLOWER than the XLA
                  # path: 15.6k tiny steps at 1M, T-018)


def _table_kernel(ax_ref, ay_ref, xlo_ref, xhi_ref, ylo_ref, yhi_ref,
                  u_ref, table_ref):
    axb = ax_ref[...]                       # (TB, 1) int32 tile x coords
    ayb = ay_ref[...]                       # (TB, 1) int32 tile y coords
    xlo = xlo_ref[...]                      # (1, CPC*C) int32 bounds
    xhi = xhi_ref[...]
    ylo = ylo_ref[...]
    yhi = yhi_ref[...]
    # Hit bits for all CPC chunks at once (elementwise), then one
    # (TB, C) x (C, C) MXU matmul per chunk: the upper-triangular
    # right-multiplication is the inclusive cumsum along lanes,
    # C[t, k] = sum_{j<=k} hit[t, j].
    hit = ((axb >= xlo) & (axb <= xhi) & (ayb >= ylo) & (ayb <= yhi))
    hitb = hit.astype(jnp.bfloat16)         # (TB, CPC*C)
    u = u_ref[...]
    c = CHUNK
    for k in range(CPC):
        cum = jnp.dot(hitb[:, k * c:(k + 1) * c], u,
                      preferred_element_type=jnp.float32)  # (TB, C)
        table_ref[:, k * c:(k + 1) * c] = cum.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("n_tiles_x", "n_tiles_y", "n2",
                                             "interpret"))
def build_rank_table(cxlo, cxhi, cylo, cyhi, n_tiles_x: int, n_tiles_y: int,
                     n2: int, y_offset=0, interpret: bool = False):
    """Fused rank-table build for one tile-row group.

    cxlo/cxhi/cylo/cyhi: (n2,) int32 per-Gaussian tile-interval bounds, in
    depth-sorted order, padded to a CHUNK multiple, with invisible/padded
    entries encoded as empty intervals (hi < lo).  y_offset shifts the
    group's tile rows (tile-row-group scanning for very large N).

    Returns (table (T, n3) bf16 in-chunk inclusive ranks,
             cumtot (T, n3/CHUNK) int32 cumulative chunk totals), where
    n3 >= n2 is padded to a CPC*CHUNK multiple; pad columns are rank-flat
    so downstream searches behave identically.
    """
    c = CHUNK
    assert n2 % c == 0
    n_chunks = n2 // c
    T = n_tiles_x * n_tiles_y
    # Mosaic block rule: sublane dim divisible by 8, or equal to the whole
    # array dim.  Pick the largest divisor of T <= TILE_BLOCK that is a
    # multiple of 8; fall back to tb = T (full-array blocks are always
    # legal and stay small: (T, 256) bf16 is 0.5 KB per tile).
    tb = 0
    for d in range(min(TILE_BLOCK, T), 7, -1):
        if T % d == 0 and d % 8 == 0:
            tb = d
            break
    if tb == 0:
        tb = T

    ax = jnp.tile(jnp.arange(n_tiles_x, dtype=jnp.int32), n_tiles_y)[:, None]
    ay = (jnp.repeat(jnp.arange(n_tiles_y, dtype=jnp.int32), n_tiles_x)
          + jnp.asarray(y_offset, jnp.int32))[:, None]
    iv = lambda v: v.reshape(1, n2)         # (1, n2): lane-dim blocks only
    U = jnp.triu(jnp.ones((c, c), jnp.bfloat16))

    # Pad the Gaussian axis so CPC chunks fit each grid step; the pad
    # columns are sliced off below (their empty intervals produce zeros).
    span = CPC * c
    n3 = -(-n2 // span) * span
    if n3 != n2:
        pad = ((0, 0), (0, n3 - n2))
        padv = lambda v: jnp.pad(iv(v), pad, constant_values=-1)
    else:
        padv = iv

    table = pl.pallas_call(
        _table_kernel,
        grid=(T // tb, n3 // span),
        in_specs=[
            pl.BlockSpec((tb, 1), lambda t, ch: (t, 0)),      # ax
            pl.BlockSpec((tb, 1), lambda t, ch: (t, 0)),      # ay
            pl.BlockSpec((1, span), lambda t, ch: (0, ch)),   # cxlo
            pl.BlockSpec((1, span), lambda t, ch: (0, ch)),   # cxhi
            pl.BlockSpec((1, span), lambda t, ch: (0, ch)),   # cylo
            pl.BlockSpec((1, span), lambda t, ch: (0, ch)),   # cyhi
            pl.BlockSpec(memory_space=pltpu.VMEM),            # U
        ],
        out_specs=pl.BlockSpec((tb, span), lambda t, ch: (t, ch)),
        out_shape=jax.ShapeDtypeStruct((T, n3), jnp.bfloat16),
        interpret=interpret,
    )(ax, ay, padv(cxlo), padv(cxhi), padv(cylo), padv(cyhi), U)
    # No trim: the pad columns are rank-flat (zero hits), so the two-level
    # search over the (T, n3) table returns identical results, and valid
    # slots can only land on real Gaussians.  Slicing would copy ~2 GB.

    # Chunk totals are the last in-chunk rank — a strided slice of the
    # table (cheap next to the build; avoids a second output whose (tb, 1)
    # block would violate the lane-divisibility rule).
    tot = table[:, c - 1::c]                                  # (T, nch) bf16
    cumtot = jnp.cumsum(tot.astype(jnp.int32), axis=1)        # (T, nch)
    return table, cumtot
