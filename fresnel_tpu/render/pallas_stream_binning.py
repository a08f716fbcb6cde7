"""Pallas TPU kernel: single-pass streaming per-tile compaction.

The T-022 lesson was that table-free binning only pays off if the
per-slot work stays in VMEM instead of routing through XLA mega-gathers.
This kernel goes further than the prescription (stream LEVEL-2 through
VMEM): it streams the WHOLE binning — no rank table, no level-1 search, no
scatter — as one forward pass over the depth-sorted Gaussian stream:

  * grid = (tile_blocks, spans).  Each program owns TB tiles' output rows
    (resident in VMEM across the span sweep) and visits SPAN-Gaussian
    interval slabs in depth order (auto-pipelined block DMA), processing
    them as CPC 256-Gaussian subchunks to amortize per-grid-step overhead
    (the one-chunk-per-step variant drowned in ~500k step launches).
  * per subchunk: hit mask (TB, 256) from the separable integer interval
    tests; in-chunk inclusive ranks via ONE (TB,256)x(256,256) bf16 MXU
    matmul (counts <= 256 are bf16-exact).
  * COUNTING PLACEMENT: the lane of a tile's r-th in-chunk hit equals
    #lanes with rank < r, so each output slot is a lane reduction — no
    one-hot build, no compaction shuffle.  Ranks are placed WIN at a time:
    values are assembled in lanes [0, WIN) of a 256-lane row
    (broadcast-select; Mosaic cannot concatenate mixed-offset layouts),
    rotated to the tile's cursor offset, and added into the cursor's
    128-ALIGNED 256-lane segment (dynamic lane stores must be 128-aligned;
    each slot is owned by exactly one chunk, so masked add == store).
  * capacity early-exit: once every tile in the block holds M Gaussians
    the remaining visits reduce to a predicated no-op (the deeper
    Gaussians are the most occluded — the same drop rule as every other
    binning path).

Work is ~output-proportional: each block only computes until its tiles
fill.  Bit-identical tables to _bin_gaussians_search
(tests/test_render.py::TestSearchBinning::test_stream_tables_identical).
Forward-only by construction (integer outputs, no VJP — gradients flow
through the parameter gather in tile.py, not through binning).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 256       # Gaussians per rank subchunk (bf16-exact cumsum bound)
CPC = 16          # subchunks per grid step (span = CPC * CHUNK)
TILE_BLOCK = 32   # tiles per program (sublane dim of the hit mask)
WIN = 16          # ranks placed per window pass (typical per-tile,
                  # per-subchunk hit counts are single digits; deeper
                  # subchunks trigger extra predicated passes)
SEG = 256         # store segment width (cursor-aligned down to 128; the
                  # in-segment offset < 128 plus WIN always fits)


def _stream_kernel(tx_ref, ty_ref, xlo_ref, xhi_ref, ylo_ref, yhi_ref,
                   u_ref, out_ref, counts_ref, *, m_cap: int, C: int,
                   cpc: int, win: int):
    TB = out_ref.shape[0]
    width = out_ref.shape[1]
    mpad = width - SEG - 128            # M rounded up to 128
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)
        for i in range(TB):
            counts_ref[i] = 0

    done = counts_ref[0] >= m_cap
    for i in range(1, TB):
        done = jnp.logical_and(done, counts_ref[i] >= m_cap)

    @pl.when(jnp.logical_not(done))
    def _visit():
        txb = tx_ref[...]                              # (TB, 1) int32
        tyb = ty_ref[...]
        w_seg = jax.lax.broadcasted_iota(jnp.int32, (1, SEG), 1)

        # Nested fori_loops (not Python unrolling): the unrolled
        # cpc x windows x ranks trace measured an ~8 min Mosaic compile.
        def subchunk(sc, _):
            off_g = pl.multiple_of(sc * C, 128)
            hit = ((txb >= xlo_ref[:, pl.ds(off_g, C)])
                   & (txb <= xhi_ref[:, pl.ds(off_g, C)])
                   & (tyb >= ylo_ref[:, pl.ds(off_g, C)])
                   & (tyb <= yhi_ref[:, pl.ds(off_g, C)]))
            # Inclusive in-chunk ranks: one bf16 MXU matmul against the
            # upper-triangular ones (pref[t, l] = sum_{j<=l} hit[t, j]).
            pref = jnp.dot(hit.astype(jnp.bfloat16), u_ref[...],
                           preferred_element_type=jnp.float32)   # (TB, C)
            cnt = pref[:, C - 1:C].astype(jnp.int32)             # (TB, 1)
            any_cnt = jnp.max(cnt)
            gbase = (k * cpc + sc) * C

            def window(j, _):
                # Window j places in-chunk ranks jW+1 .. jW+WIN for every
                # tile whose cursor still has room.
                @pl.when(any_cnt > j * win)
                def _window():
                    def rank_col(w, rows):
                        r = (j * win + w + 1).astype(jnp.float32)
                        col = jnp.sum((pref < r).astype(jnp.float32),
                                      axis=1, keepdims=True)     # (TB, 1)
                        return rows + jnp.where(
                            w_seg == w, gbase + col.astype(jnp.int32), 0)

                    rows = jax.lax.fori_loop(
                        0, win, rank_col, jnp.zeros((TB, SEG), jnp.int32))
                    for i in range(TB):
                        base = counts_ref[i]
                        @pl.when((base + j * win < m_cap)
                                 & (cnt[i, 0] > j * win))
                        def _store():
                            cur = base + j * win
                            seg = pl.multiple_of((cur // 128) * 128, 128)
                            off = cur - seg              # 0..127
                            live = ((w_seg + j * win < cnt[i, 0])
                                    & (cur + w_seg < m_cap)
                                    & (w_seg < win))
                            row = jnp.where(live, rows[i:i + 1], 0)
                            out_ref[pl.ds(i, 1), pl.ds(seg, SEG)] += (
                                pltpu.roll(row, off, 1))
                return _

            jax.lax.fori_loop(0, C // win, window, None)
            for i in range(TB):
                counts_ref[i] = jnp.minimum(counts_ref[i] + cnt[i, 0],
                                            m_cap)
            return _

        jax.lax.fori_loop(0, cpc, subchunk, None)

        # Publish counts in the block's 128-lane tail (scalar VMEM stores
        # are not lowerable; a broadcast vector store is).  Once per span.
        for i in range(TB):
            out_ref[pl.ds(i, 1), pl.ds(mpad + SEG, 128)] = jnp.full(
                (1, 128), counts_ref[i], jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_tiles_x", "n_tiles_y",
                                             "tile_size", "max_per_tile",
                                             "interpret", "chunk", "cpc",
                                             "tile_block", "win"))
def bin_gaussians_stream(means2d, radii, visible, n_tiles_x: int,
                         n_tiles_y: int, tile_size, max_per_tile: int,
                         interpret: bool = False, chunk: int = CHUNK,
                         cpc: int = CPC, tile_block: int = TILE_BLOCK,
                         win: int = WIN):
    """Drop-in replacement for _bin_gaussians_search (same contract:
    (T, M) depth-ordered indices into the sorted arrays + validity).

    chunk/cpc/tile_block/win override the tuned defaults — mainly so the
    interpret-mode CPU tests can shrink the unrolled trace."""
    ts = float(tile_size)
    n = means2d.shape[0]
    M = max_per_tile
    C = chunk
    TB = tile_block
    span = cpc * C

    u, v, r = means2d[:, 0], means2d[:, 1], radii
    # Identical integer interval tests to every other binning path; the
    # clamp to the tile grid matches the implicit ax/ay range of the mask
    # paths and keeps padded tiles (coord -5) unhittable.
    cxlo = jnp.maximum(jnp.floor((u - r) / ts).astype(jnp.int32), 0)
    cxhi = jnp.minimum(jnp.floor((u + r) / ts).astype(jnp.int32),
                       n_tiles_x - 1)
    cylo = jnp.maximum(jnp.floor((v - r) / ts).astype(jnp.int32), 0)
    cyhi = jnp.minimum(jnp.floor((v + r) / ts).astype(jnp.int32),
                       n_tiles_y - 1)
    cxhi = jnp.where(visible, cxhi, -1)

    n2 = -(-n // span) * span
    pad = n2 - n
    row = lambda a: a.reshape(1, -1)
    if pad:
        padv = lambda a, fill: jnp.pad(row(a), ((0, 0), (0, pad)),
                                       constant_values=fill)
    else:
        padv = lambda a, fill: row(a)

    T = n_tiles_x * n_tiles_y
    tpad = -(-T // TB) * TB
    tx = jnp.tile(jnp.arange(n_tiles_x, dtype=jnp.int32), n_tiles_y)
    ty = jnp.repeat(jnp.arange(n_tiles_y, dtype=jnp.int32), n_tiles_x)
    if tpad != T:
        fill = ((0, tpad - T),)
        tx = jnp.pad(tx, fill, constant_values=-5)
        ty = jnp.pad(ty, fill, constant_values=-5)

    mpad = -(-M // 128) * 128
    width = mpad + SEG + 128
    U = jnp.triu(jnp.ones((C, C), jnp.bfloat16))

    out = pl.pallas_call(
        functools.partial(_stream_kernel, m_cap=M, C=C, cpc=cpc, win=win),
        grid=(tpad // TB, n2 // span),
        in_specs=[
            pl.BlockSpec((TB, 1), lambda b, k: (b, 0)),      # tx
            pl.BlockSpec((TB, 1), lambda b, k: (b, 0)),      # ty
            pl.BlockSpec((1, span), lambda b, k: (0, k)),    # cxlo
            pl.BlockSpec((1, span), lambda b, k: (0, k)),    # cxhi
            pl.BlockSpec((1, span), lambda b, k: (0, k)),    # cylo
            pl.BlockSpec((1, span), lambda b, k: (0, k)),    # cyhi
            pl.BlockSpec(memory_space=pltpu.VMEM),           # U
        ],
        out_specs=pl.BlockSpec((TB, width), lambda b, k: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((tpad, width), jnp.int32),
        scratch_shapes=[pltpu.SMEM((TB,), jnp.int32)],
        interpret=interpret,
    )(tx[:, None], ty[:, None], padv(cxlo, 0), padv(cxhi, -1),
      padv(cylo, 0), padv(cyhi, -1), U)

    counts = out[:T, mpad + SEG]
    tile_valid = jnp.arange(M, dtype=jnp.int32)[None, :] < counts[:, None]
    tile_indices = jnp.where(tile_valid,
                             jnp.minimum(out[:T, :M], n2 - 1), 0)
    return tile_indices, tile_valid
