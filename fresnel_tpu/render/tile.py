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
    backend: str = "auto"        # "auto" (pallas on TPU, xla elsewhere) |
                                 # "xla" (scan compositor) | "pallas" (TPU
                                 # kernel w/ analytic VJP; 16px tiles only,
                                 # no phase blending)
    pallas_interpret: bool = False  # interpreter mode (CPU testing)
    tile_window: int = 5         # binning window (tiles per side) around each
                                 # Gaussian's center tile; effective radius is
                                 # clamped to (tile_window // 2) * tile_size
    binning: str = "auto"        # "auto" (search beyond ~96k Gaussians) |
                                 # "pairs" (window-pair scatter) | "search"
                                 # (rank-table two-level binary search) |
                                 # "stream" (Pallas single-pass streaming
                                 # compaction with capacity early-exit —
                                 # no rank table, no searches; TPU only,
                                 # see pallas_stream_binning.py) |
                                 # "rows" (two-stage row-segment: per-tile-
                                 # row lists then per-tile — ~50x less
                                 # rank-TABLE traffic than search on
                                 # paper, but MEASURED 3-12x SLOWER on
                                 # v5e at 200k-5M (T-042): auto row
                                 # capacity grows ~4N/nty, so the stage-2
                                 # hit/cumsum work scales ~4*N*ntx and
                                 # erases the saving; opt-in only) |
                                 # "chunked" (table-free: MXU chunk totals +
                                 # on-demand in-chunk ranks; opt-in — its
                                 # (T, M, 256) level-2 gather measured 4-6x
                                 # SLOWER than search on real v5e, T-022)
    row_capacity: int = 0        # "rows" stage-1 per-row list size
                                 # (0 = auto: 2 * n_tiles_x * max_per_tile)
    table_build: str = "auto"    # search-binning rank-table backend:
                                 # "auto" (= xla; the fused Pallas kernel
                                 # measured a wash, T-018) | "pallas" |
                                 # "xla"
    depth_sort: str = "auto"     # "auto" (= exact; bit-reproducible order)
                                 # | "exact" (lax.sort of (f32, i32) pairs)
                                 # | "packed" (12-bit quantized depth +
                                 # 20-bit index in ONE uint32 — half the
                                 # sort traffic but measured a WASH end to
                                 # end: TPU sort cost is comparator-pass-
                                 # dominated, not bandwidth, T-013)
                                 # | "counting" (16-bit MXU counting sort —
                                 # correct but LOSES to lax.sort: its
                                 # permutation gathers/scatters cost more
                                 # than the sort saves, T-012)


def _bin_gaussians(means2d, radii, visible, n_tiles_x, n_tiles_y, tile_size,
                   max_per_tile, tile_window: int = 5):
    """Per-tile compaction of depth-sorted Gaussian indices.

    Returns (tile_indices (T, M) int32, tile_valid (T, M) bool) where T is the
    tile count and entries are indices into the *sorted* Gaussian arrays, in
    depth order.  Overflow beyond M drops the farthest Gaussians (they are the
    most occluded).

    TPU-shaped algorithm: XLA scatter throughput (~200M updates/s) makes the
    dense (T, N) compaction the renderer bottleneck beyond ~10k Gaussians, so
    the scatter is restricted to (Gaussian, tile-window) PAIRS — each Gaussian
    can only hit the `tile_window`^2 tiles around its center (callers clamp
    radii to (tile_window // 2) * tile_size to guarantee coverage):
      1. dense hit mask + cumsum (vectorized compares, sub-ms) gives every
         pair its depth-ordered slot;
      2. one scatter of only N*window^2 indices builds the (T, M) table.
    """
    ts = float(tile_size)
    T = n_tiles_x * n_tiles_y
    n = means2d.shape[0]
    M = max_per_tile
    half = tile_window // 2

    u = means2d[:, 0]
    v = means2d[:, 1]
    r = radii

    # The tile-interval test is SEPARABLE: tile (a, b) is hit iff a is in
    # the Gaussian's x-window and b in its y-window.  Building two (ntiles,
    # N) axis masks and one broadcast AND replaces four f32 compares over
    # the full (T, N) matrix — the compares were half the binning cost.
    # a*ts <= u+r  <=>  a <= floor((u+r)/ts);  u-r < (a+1)*ts  <=>
    # a >= floor((u-r)/ts)  (exact for integer a, incl. the boundary case).
    cxlo = jnp.floor((u - r) / ts).astype(jnp.int32)
    cxhi = jnp.floor((u + r) / ts).astype(jnp.int32)
    cylo = jnp.floor((v - r) / ts).astype(jnp.int32)
    cyhi = jnp.floor((v + r) / ts).astype(jnp.int32)
    ax = jnp.arange(n_tiles_x, dtype=jnp.int32)
    ay = jnp.arange(n_tiles_y, dtype=jnp.int32)
    hx = (ax[:, None] >= cxlo[None]) & (ax[:, None] <= cxhi[None])  # (ntx, N)
    hy = ((ay[:, None] >= cylo[None]) & (ay[:, None] <= cyhi[None])
          & visible[None, :])                                       # (nty, N)
    hit = (hy[:, None, :] & hx[None, :, :]).reshape(T, n)           # (T, N)
    # int16 halves the HBM traffic of the (T, N) rank table (counts are
    # bounded by N; the int32 path is kept for clouds beyond int16 range).
    cdtype = jnp.int16 if n < 32000 else jnp.int32
    C = jnp.cumsum(hit, axis=1, dtype=cdtype)

    # Window pairs around each Gaussian's center tile.
    offs_y, offs_x = jnp.meshgrid(
        jnp.arange(tile_window, dtype=jnp.int32) - half,
        jnp.arange(tile_window, dtype=jnp.int32) - half, indexing="ij")
    offs_x = offs_x.reshape(-1)                                  # (K,)
    offs_y = offs_y.reshape(-1)
    cx = jnp.clip((u // ts).astype(jnp.int32), 0, n_tiles_x - 1)
    cy = jnp.clip((v // ts).astype(jnp.int32), 0, n_tiles_y - 1)
    txp = cx[:, None] + offs_x[None, :]                          # (N, K)
    typ = cy[:, None] + offs_y[None, :]
    inb = (txp >= 0) & (txp < n_tiles_x) & (typ >= 0) & (typ < n_tiles_y)
    t_lin = jnp.where(inb, typ * n_tiles_x + txp, 0)

    # Same integer-interval test as hx/hy — guaranteed consistent with `hit`.
    ov = ((txp >= cxlo[:, None]) & (txp <= cxhi[:, None])
          & (typ >= cylo[:, None]) & (typ <= cyhi[:, None])
          & inb & visible[:, None])

    j_idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None],
                             (n, offs_x.shape[0]))
    slot = jnp.where(ov, C[t_lin, j_idx].astype(jnp.int32) - 1, M)
    slot = jnp.minimum(slot, M)                                  # overflow -> trash
    tile_indices = jnp.zeros((T, M + 1), jnp.int32)
    # Each (tile, slot) target is hit by at most one pair (slots are ranks
    # within a tile; dead pairs all land in the trash column M and are
    # dropped) — declaring uniqueness lets XLA skip the serialization the
    # general scatter needs.
    tile_indices = tile_indices.at[t_lin, slot].set(
        j_idx, mode="drop", unique_indices=True)[:, :M]
    count = jnp.minimum(C[:, -1].astype(jnp.int32), M)
    tile_valid = (
        jnp.arange(M, dtype=jnp.int32)[None, :] < count[:, None]
    )
    return tile_indices, tile_valid


def _bin_gaussians_search(means2d, radii, visible, n_tiles_x, n_tiles_y,
                          tile_size, max_per_tile, tile_window: int = 5,
                          groups: int = 1, table: str = "auto",
                          pallas_interpret: bool = False):
    """Scatter-free per-tile compaction: rank-table + binary search.

    Same contract as _bin_gaussians (identical tables, bit-for-bit), built
    the other way around: instead of scattering N*window^2 (Gaussian, tile)
    pairs into their slots — whose gather+scatter cost is ~0.5 us/Gaussian
    and dominates the forward beyond ~100k Gaussians (experiments/README.md
    T-011) — each OUTPUT slot (t, m) finds its Gaussian by binary-searching
    the per-tile rank cumsum for the (m+1)-th hit.  Work is then
    O(T*M*log N) gathers (output-proportional, ~constant in N) plus an
    MXU-friendly rank-table build:

      1. hit matrix in (N, T) layout from the separable interval masks;
      2. per-256-chunk inclusive cumsum as ONE lower-triangular bf16 matmul
         per chunk (integer counts <= 256 are exact in bf16; f32 accum) —
         the log-step HBM cumsum becomes MXU FLOPs;
      3. TWO-LEVEL search: level 1 binary-searches the (T, n_chunks) int32
         cumulative chunk totals (a tiny table — 16 MB at 1M Gaussians) for
         the chunk holding the (m+1)-th hit; level 2 binary-searches only
         the 256-entry in-chunk cumsum (the transposed bf16 table, gathers
         confined to one 512-byte window per slot).  vs a single-level
         search this turns 20 random-gather sweeps over the full 2 GB rank
         table into 13 sweeps over 16 MB + 8 locality-friendly sweeps, and
         deletes the full-table base-add/saturate/int16 pass outright (the
         in-chunk bf16 cumsum is searched as-is — counts <= 256 are exact).

    No scatter, no window pairs.  The tile_window radius clamp is honored by
    the CALLER (same eff_max_radius) so both binning modes are
    interchangeable for the same config.

    `groups` > 1 processes the tile rows in that many lax.scan passes,
    bounding the rank-table working set to 1/groups of the full (N, T)
    layout.  That is what lifts the practical Gaussian cap to the
    reference's 5M (reference: src/core/renderer/renderer.hpp:133-134 —
    its GPU sort buffer cap): at 5M x 1024 tiles the one-shot bf16 table
    would be ~10 GB; 8 groups keep the peak slab at ~1.3 GB.  Total work
    is unchanged (each Gaussian still meets each tile once) and results
    are bit-identical to groups=1.
    """
    ts = float(tile_size)
    n = means2d.shape[0]
    M = max_per_tile

    u = means2d[:, 0]
    v = means2d[:, 1]
    r = radii
    cxlo = jnp.floor((u - r) / ts).astype(jnp.int32)
    cxhi = jnp.floor((u + r) / ts).astype(jnp.int32)
    cylo = jnp.floor((v - r) / ts).astype(jnp.int32)
    cyhi = jnp.floor((v + r) / ts).astype(jnp.int32)

    # Pad N to the chunk size; padded rows are invisible (hit no tile).
    c = 256
    n2 = -(-n // c) * c
    pad = n2 - n
    if pad:
        cxlo = jnp.pad(cxlo, (0, pad))
        cxhi = jnp.pad(cxhi, (0, pad), constant_values=-1)
        cylo = jnp.pad(cylo, (0, pad))
        cyhi = jnp.pad(cyhi, (0, pad), constant_values=-1)
        visible = jnp.pad(visible, (0, pad))

    if table == "auto":
        # The fused Pallas build (render/pallas_binning.py) skips the hit
        # matrix and transpose passes, yet measured a WASH at 1M (209 vs
        # 204 ms end-to-end, T-018) — XLA already fuses the mask+einsum
        # build well.  Kept as an option; auto stays on the XLA path.
        table = "xla"

    if table == "pallas":
        from fresnel_tpu.render.pallas_binning import build_rank_table

        # Fold visibility into the intervals (empty interval = no hits);
        # the mask path folds it into hy instead.
        xhi = jnp.where(visible, cxhi, -1)
        yhi = jnp.where(visible, cyhi, -1)
        nty2 = -(-n_tiles_y // groups) * groups
        nty_g = nty2 // groups

        def build(y_off):
            t, ct = build_rank_table(cxlo, xhi, cylo, yhi, n_tiles_x, nty_g,
                                     n2, y_offset=y_off,
                                     interpret=pallas_interpret)
            return _two_level_search(t, ct, M)

        if groups <= 1:
            return build(0)
        offs = jnp.arange(groups, dtype=jnp.int32) * nty_g
        _, (ti, tv) = jax.lax.scan(lambda _, o: (None, build(o)), None, offs)
        T = n_tiles_x * n_tiles_y
        return (ti.reshape(groups * nty_g * n_tiles_x, M)[:T],
                tv.reshape(groups * nty_g * n_tiles_x, M)[:T])

    ax = jnp.arange(n_tiles_x, dtype=jnp.int32)
    ay = jnp.arange(n_tiles_y, dtype=jnp.int32)
    hx = (ax[None, :] >= cxlo[:, None]) & (ax[None, :] <= cxhi[:, None])
    hy = ((ay[None, :] >= cylo[:, None]) & (ay[None, :] <= cyhi[:, None])
          & visible[:, None])                                # (N2, nty)

    if groups <= 1:
        ti, tv = _search_from_masks(hx, hy, n2, n_tiles_x, n_tiles_y, M)
        return ti, tv

    # Pad tile rows to a multiple of `groups`; padded rows hit nothing and
    # their (zero-count) output rows are sliced off below.
    nty2 = -(-n_tiles_y // groups) * groups
    if nty2 != n_tiles_y:
        hy = jnp.pad(hy, ((0, 0), (0, nty2 - n_tiles_y)))
    nty_g = nty2 // groups
    hy_g = jnp.moveaxis(hy.reshape(n2, groups, nty_g), 1, 0)  # (G, N2, ntyg)

    def body(_, hy_slice):
        return None, _search_from_masks(hx, hy_slice, n2, n_tiles_x, nty_g, M)

    _, (ti, tv) = jax.lax.scan(body, None, hy_g)
    # Row-major tile order: stacking groups along y reproduces t = y*ntx + x.
    T = n_tiles_x * n_tiles_y
    ti = ti.reshape(groups * nty_g * n_tiles_x, M)[:T]
    tv = tv.reshape(groups * nty_g * n_tiles_x, M)[:T]
    return ti, tv


def _bin_gaussians_rows(means2d, radii, visible, n_tiles_x, n_tiles_y,
                        tile_size, max_per_tile, row_capacity: int = 0):
    """Two-stage row-segment compaction: per-tile-ROW lists, then per-tile.

    The search binning's cost is the (N, T) rank table — 2 GB of bf16 at
    1M x 1024 tiles, ~8 GB of HBM traffic (92 of the 146 ms 1M forward,
    experiments/profile_stages_1m.py).  But the hit matrix is separable:
    compacting Gaussians per tile ROW first (T = n_tiles_y = 32 instead of
    1024 — a 32x smaller stage-1 table), then binning each row's compact
    list over the n_tiles_x tiles (stage-2 tables: rows x row_capacity x
    ntx, ~32 MB), does the same job with ~50x less table traffic.

    Stage 1 reuses the rank-table machinery with a single x-"tile";
    stage 2 batches it per row via vmap.  Both searches preserve index
    order, and inputs arrive depth-sorted, so per-tile lists stay in depth
    order — bit-identical to _bin_gaussians_search whenever no row
    overflows `row_capacity` (rows that do drop their deepest entries
    first, the same depth-priority rule as the per-tile cap).
    """
    ts = float(tile_size)
    n = means2d.shape[0]
    M = max_per_tile

    u = means2d[:, 0]
    v = means2d[:, 1]
    r = radii
    cxlo = jnp.floor((u - r) / ts).astype(jnp.int32)
    cxhi = jnp.floor((u + r) / ts).astype(jnp.int32)
    cylo = jnp.floor((v - r) / ts).astype(jnp.int32)
    cyhi = jnp.floor((v + r) / ts).astype(jnp.int32)

    c = 256
    n2 = -(-n // c) * c
    pad = n2 - n
    if pad:
        cxlo = jnp.pad(cxlo, (0, pad))
        cxhi = jnp.pad(cxhi, (0, pad), constant_values=-1)
        cylo = jnp.pad(cylo, (0, pad))
        cyhi = jnp.pad(cyhi, (0, pad), constant_values=-1)
        visible = jnp.pad(visible, (0, pad))

    # Auto capacity: cover 4x the mean row occupancy (each Gaussian hits
    # ~1-3 rows), floored at 2 * ntx * M so small-N grids stay exact.
    Mr = (row_capacity if row_capacity > 0
          else max(2 * n_tiles_x * M, (4 * n2) // max(1, n_tiles_y)))
    Mr = min(Mr, n2)
    Mr = -(-Mr // c) * c                       # chunkable in stage 2

    # Stage 1: compact per tile row (one x-"tile" spanning everything).
    ay = jnp.arange(n_tiles_y, dtype=jnp.int32)
    hy = ((ay[None, :] >= cylo[:, None]) & (ay[None, :] <= cyhi[:, None])
          & visible[:, None])                                # (N2, nty)
    hx1 = jnp.ones((n2, 1), bool)
    row_idx, row_valid = _search_from_masks(
        hx1, hy, n2, 1, n_tiles_y, Mr)                       # (nty, Mr)

    # Stage 2: bin each row's list over the x tiles.  Invalid slots get an
    # empty interval and can never be hit.
    xlo_r = jnp.where(row_valid, cxlo[row_idx], 0)           # (nty, Mr)
    xhi_r = jnp.where(row_valid, cxhi[row_idx], -1)
    ax = jnp.arange(n_tiles_x, dtype=jnp.int32)
    hx2 = ((ax[None, None, :] >= xlo_r[..., None])
           & (ax[None, None, :] <= xhi_r[..., None]))        # (nty, Mr, ntx)

    nch2 = Mr // c
    hb = hx2.reshape(n_tiles_y, nch2, c, n_tiles_x).astype(jnp.bfloat16)
    L = jnp.tril(jnp.ones((c, c), jnp.bfloat16))
    C_in = jnp.einsum("ij,rnjt->rnit", L, hb,
                      preferred_element_type=jnp.bfloat16)   # (nty,nch2,c,ntx)
    totals = C_in[:, :, -1, :].astype(jnp.int32)             # (nty, nch2, ntx)
    cumtot_t = jnp.moveaxis(jnp.cumsum(totals, axis=1), 1, 2)  # (nty,ntx,nch2)
    Cin_t = jnp.moveaxis(
        C_in.reshape(n_tiles_y, Mr, n_tiles_x), 1, 2)        # (nty, ntx, Mr)

    in_row, tv = jax.vmap(_two_level_search, in_axes=(0, 0, None))(
        Cin_t, cumtot_t, M)                                  # (nty, ntx, M) x2

    gi = jnp.take_along_axis(
        row_idx, in_row.reshape(n_tiles_y, n_tiles_x * M),
        axis=1).reshape(n_tiles_y, n_tiles_x, M)
    T = n_tiles_x * n_tiles_y
    tile_indices = jnp.where(tv, gi, 0).reshape(T, M)
    return tile_indices, tv.reshape(T, M)


def _bin_gaussians_chunked(means2d, radii, visible, n_tiles_x, n_tiles_y,
                           tile_size, max_per_tile):
    """Table-free per-tile compaction: chunk totals + on-demand ranks.

    Same contract (bit-identical tables) as _bin_gaussians_search, but never
    materializes the (N, T) rank table whose build/transpose traffic
    dominated the 1M-Gaussian forward (92 of 146 ms, round-1 VERDICT #3 /
    experiments/profile_stages_1m.py).  Three output-proportional stages:

      1. per-256-chunk tile totals as ONE small MXU matmul per chunk
         (hy_kᵀ @ hx_k, counts <= 256 exact in bf16) -> a (T, n_chunks)
         int32 cumulative table — 16 MB at 1M Gaussians vs the 2 GB table;
      2. level-1 binary search of that small table finds each output slot's
         owning chunk (13 gather sweeps over 16 MB);
      3. level-2 recomputes the in-chunk ranks ON DEMAND: gather the chunk's
         256 tile intervals (packed 4x-byte uint32, one gather), interval-
         test against the slot's tile, in-chunk prefix sums as a bf16
         triangular matmul, and take the target-th hit.

    Work is O(n_chunks * T) matmul FLOPs + O(T * M * 256) level-2 lanes —
    both ~independent of how the table-based path scaled.  Requires tile
    grids <= 254 per side (byte packing).  Capacity overflow policy is
    unchanged: the farthest (most occluded) Gaussians beyond M are dropped.

    MEASURED (T-022, real v5e, 512², M=256): the (T, M, c) level-2 gather
    (67M words) costs a ~650 ms floor regardless of N — 4-6x slower than
    the rank-table search at 200k-1M Gaussians.  Kept as an opt-in
    reference implementation (bit-identical tables, verified); the idea
    only pays off if level-2 becomes a Pallas kernel that streams the
    chunk intervals through VMEM instead of an XLA mega-gather.
    """
    ts = float(tile_size)
    n = means2d.shape[0]
    M = max_per_tile
    T = n_tiles_x * n_tiles_y
    assert n_tiles_x < 255 and n_tiles_y < 255

    u = means2d[:, 0]
    v = means2d[:, 1]
    r = radii
    # Same integer interval tests as _bin_gaussians — consistency contract.
    cxlo = jnp.floor((u - r) / ts).astype(jnp.int32)
    cxhi = jnp.floor((u + r) / ts).astype(jnp.int32)
    cylo = jnp.floor((v - r) / ts).astype(jnp.int32)
    cyhi = jnp.floor((v + r) / ts).astype(jnp.int32)
    # Clamp into byte range; visibility folds in as an empty interval.
    cxlo = jnp.clip(cxlo, 0, 254)
    cylo = jnp.clip(cylo, 0, 254)
    cxhi = jnp.clip(jnp.where(visible, cxhi, -1), -1, n_tiles_x - 1)
    cyhi = jnp.clip(jnp.where(visible, cyhi, -1), -1, n_tiles_y - 1)

    c = 256
    n2 = -(-n // c) * c
    pad = n2 - n
    if pad:
        cxlo = jnp.pad(cxlo, (0, pad))
        cxhi = jnp.pad(cxhi, (0, pad), constant_values=-1)
        cylo = jnp.pad(cylo, (0, pad))
        cyhi = jnp.pad(cyhi, (0, pad), constant_values=-1)
    n_chunks = n2 // c

    # Stage 1: per-chunk tile totals via MXU.  hx/hy are (N2, ntiles) —
    # 32-wide at 512² — tiny compared to the (N2, T) product, which is
    # never formed: totals[k, ty, tx] = sum_j hy[k*c+j, ty] * hx[k*c+j, tx].
    ax = jnp.arange(n_tiles_x, dtype=jnp.int32)
    ay = jnp.arange(n_tiles_y, dtype=jnp.int32)
    hx = ((ax[None, :] >= cxlo[:, None]) & (ax[None, :] <= cxhi[:, None])
          ).astype(jnp.bfloat16)                              # (N2, ntx)
    hy = ((ay[None, :] >= cylo[:, None]) & (ay[None, :] <= cyhi[:, None])
          ).astype(jnp.bfloat16)                              # (N2, nty)
    totals = jnp.einsum(
        "kjy,kjx->kyx", hy.reshape(n_chunks, c, n_tiles_y),
        hx.reshape(n_chunks, c, n_tiles_x),
        preferred_element_type=jnp.float32)                   # (nch, nty, ntx)
    cumtot_t = jnp.cumsum(
        totals.reshape(n_chunks, T).astype(jnp.int32), axis=0).T  # (T, nch)

    count = jnp.minimum(cumtot_t[:, -1], M)
    target = (jnp.arange(M, dtype=jnp.int32) + 1)[None, :]    # (1, M)

    # Level 1: first chunk k with cumtot(t, k) >= m + 1.
    lo = jnp.zeros((T, M), jnp.int32)
    hi = jnp.full((T, M), n_chunks, jnp.int32)
    for _ in range(max(1, n_chunks.bit_length())):
        mid = (lo + hi) >> 1
        val = jnp.take_along_axis(
            cumtot_t, jnp.minimum(mid, n_chunks - 1), axis=1)
        ge = val >= target
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, mid + 1)
    k = jnp.minimum(hi, n_chunks - 1)                         # (T, M)
    base_k = jnp.where(
        k > 0, jnp.take_along_axis(cumtot_t, jnp.maximum(k - 1, 0), axis=1),
        0)
    target2 = target - base_k                                 # (T, M) in [1,c]

    # Stage 3: on-demand in-chunk rank.  Intervals packed one-uint32-per-
    # Gaussian (biased +1 so the empty interval -1 packs as 0) so the
    # per-slot gather moves 1 word, not 4.
    iv = (jnp.uint32(cxlo + 1)
          | (jnp.uint32(cxhi + 1) << 8)
          | (jnp.uint32(cylo + 1) << 16)
          | (jnp.uint32(cyhi + 1) << 24))                     # (N2,)
    gidx = k[..., None] * c + jnp.arange(c, dtype=jnp.int32)  # (T, M, c)
    ivk = iv[gidx]                                            # (T, M, c)
    t_ids = jnp.arange(T, dtype=jnp.uint32)
    tx1 = (t_ids % jnp.uint32(n_tiles_x) + 1)[:, None, None]  # biased +1
    ty1 = (t_ids // jnp.uint32(n_tiles_x) + 1)[:, None, None]
    hit = ((tx1 >= (ivk & 0xFF)) & (tx1 <= ((ivk >> 8) & 0xFF))
           & (ty1 >= ((ivk >> 16) & 0xFF)) & (ty1 <= (ivk >> 24)))
    # In-chunk inclusive prefix as a bf16 triangular matmul (exact <= 256),
    # then the target-th hit is the first index whose prefix reaches it.
    U = jnp.tril(jnp.ones((c, c), jnp.bfloat16))              # pref = hit @ Uᵀ
    pref = jnp.einsum("tmc,jc->tmj", hit.astype(jnp.bfloat16), U,
                      preferred_element_type=jnp.bfloat16)    # (T, M, c)
    idx_in = jnp.sum((pref.astype(jnp.int32) < target2[..., None])
                     .astype(jnp.int32), axis=-1)             # (T, M)

    tile_valid = jnp.arange(M, dtype=jnp.int32)[None, :] < count[:, None]
    tile_indices = jnp.where(
        tile_valid, jnp.minimum(k * c + idx_in, n2 - 1), 0)
    return tile_indices, tile_valid


def _tile_totals(means2d, radii, visible, n_tiles_x, n_tiles_y, tile_size):
    """Unclamped per-tile hit counts (T,) int32 — overflow telemetry.

    Independent of the binning algorithm (all four produce tables clamped
    to min(total, M); this recomputes the pre-clamp totals) and cheap: the
    separable interval masks contract on the MXU as one (nty, N) x (N, ntx)
    einsum — 0/1 products accumulate exactly in f32 below 2^24 hits/tile.
    The reference has no cap at all (its per-pixel loop walks every sorted
    Gaussian, reference: src/core/renderer/renderer.cpp:242-273), so
    totals > M measures exactly where we deviate from it.
    """
    ts = float(tile_size)
    u, v, r = means2d[:, 0], means2d[:, 1], radii
    cxlo = jnp.floor((u - r) / ts).astype(jnp.int32)
    cxhi = jnp.floor((u + r) / ts).astype(jnp.int32)
    cylo = jnp.floor((v - r) / ts).astype(jnp.int32)
    cyhi = jnp.floor((v + r) / ts).astype(jnp.int32)
    ax = jnp.arange(n_tiles_x, dtype=jnp.int32)
    ay = jnp.arange(n_tiles_y, dtype=jnp.int32)
    hx = ((ax[None, :] >= cxlo[:, None]) & (ax[None, :] <= cxhi[:, None])
          ).astype(jnp.float32)                              # (N, ntx)
    hy = (((ay[None, :] >= cylo[:, None]) & (ay[None, :] <= cyhi[:, None]))
          & visible[:, None]).astype(jnp.float32)            # (N, nty)
    tot = jnp.einsum("jy,jx->yx", hy, hx,
                     preferred_element_type=jnp.float32)     # (nty, ntx)
    return tot.reshape(n_tiles_x * n_tiles_y).astype(jnp.int32)


def _search_from_masks(hx, hy, n2, n_tiles_x, n_tiles_y, M):
    """Rank-table build (XLA) + two-level search for one tile-row group."""
    c = 256
    T = n_tiles_x * n_tiles_y
    hit = (hy[:, :, None] & hx[:, None, :]).reshape(n2, T)   # (N2, T)

    n_chunks = n2 // c
    hb = hit.reshape(n_chunks, c, T).astype(jnp.bfloat16)
    # Inclusive in-chunk cumsum as a lower-triangular matmul.  In-chunk
    # counts are <= c = 256 — exactly representable in bf16 — so the matmul
    # can EMIT bf16 (MXU accumulates f32 internally), halving the largest
    # intermediate's HBM traffic vs an f32 output.
    L = jnp.tril(jnp.ones((c, c), jnp.bfloat16))
    C_in = jnp.einsum("ij,njt->nit", L, hb,
                      preferred_element_type=jnp.bfloat16)   # (nch, c, T)
    totals = C_in[:, -1, :].astype(jnp.int32)                # (nch, T)
    cumtot_t = jnp.cumsum(totals, axis=0).T                  # (T, nch) incl.
    Cin_t = C_in.reshape(n2, T).T                            # (T, N2) bf16
    return _two_level_search(Cin_t, cumtot_t, M)


def _two_level_search(Cin_t, cumtot_t, M):
    """Find each (tile, slot)'s Gaussian in the rank table.

    Cin_t: (T, N2) bf16 in-chunk inclusive ranks; cumtot_t: (T, n_chunks)
    int32 cumulative chunk totals.  Built either by _search_from_masks
    (XLA) or pallas_binning.build_rank_table (fused TPU kernel).
    """
    T, n2 = Cin_t.shape
    n_chunks = cumtot_t.shape[1]
    c = n2 // n_chunks

    count = jnp.minimum(cumtot_t[:, -1], M)

    target = (jnp.arange(M, dtype=jnp.int32) + 1)[None, :]   # (1, M)

    # Level 1: first chunk k with cumtot(t, k) >= m + 1.  Search space is
    # [0, n_chunks] — n_chunks + 1 candidates.
    lo = jnp.zeros((T, M), jnp.int32)
    hi = jnp.full((T, M), n_chunks, jnp.int32)
    for _ in range(max(1, n_chunks.bit_length())):
        mid = (lo + hi) >> 1
        val = jnp.take_along_axis(
            cumtot_t, jnp.minimum(mid, n_chunks - 1), axis=1)
        ge = val >= target
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, mid + 1)
    k = jnp.minimum(hi, n_chunks - 1)                        # (T, M)

    # Level 2: within chunk k, first j with in-chunk rank >= the residual
    # target.  For a correctly found chunk the last in-chunk value meets the
    # target, so the answer lies in [0, c-1] — c candidates, log2(c) steps.
    base_k = jnp.where(
        k > 0, jnp.take_along_axis(cumtot_t, jnp.maximum(k - 1, 0), axis=1),
        0)                                                   # exclusive base
    target2 = target - base_k                                # (T, M)
    lo = jnp.zeros((T, M), jnp.int32)
    hi = jnp.full((T, M), c - 1, jnp.int32)
    kc = k * c
    for _ in range(max(1, (c - 1).bit_length())):
        mid = (lo + hi) >> 1
        val = jnp.take_along_axis(Cin_t, kc + mid, axis=1)
        ge = val.astype(jnp.int32) >= target2
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, mid + 1)

    tile_valid = jnp.arange(M, dtype=jnp.int32)[None, :] < count[:, None]
    tile_indices = jnp.where(tile_valid, jnp.minimum(kc + hi, n2 - 1), 0)
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
    static_argnames=("config", "return_depth", "return_transmittance",
                     "return_overflow", "background"),
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
    return_transmittance: bool = False,
    return_overflow: bool = False,
    config: TileRendererConfig = TileRendererConfig(),
):
    """Render a Gaussian cloud to a (3, H, W) image in [0, 1].

    `phases` (unit interval, per Gaussian) activates interference blending
    when config.use_phase_blending is set.

    `return_transmittance` appends the per-pixel residual transmittance
    map (H, W) — the compositor already computes it, so callers that need
    (color, T) partials (e.g. the Gaussian-axis-sharded renderer's
    associative over-combine, parallel/render.py) get it for free instead
    of a second render.  Order: img[, depth][, transmittance].

    `return_overflow` appends a (4,) int32 capacity-telemetry vector
    [dropped_pairs, total_pairs, overflow_tiles, max_tile_hits]: how many
    (Gaussian, tile) pairs the static max_per_tile cap silently drops —
    the one behavioral deviation from the reference's uncapped per-pixel
    loop (renderer.cpp:242-273).  Gradient-free (int32) and cheap (one
    masked MXU einsum); training logs it per epoch (VERDICT r2 weak #6).
    Order: img[, depth][, transmittance][, overflow].
    """
    cfg = config
    H, W = camera.height, camera.width
    ts = cfg.tile_size
    n_tiles_x = -(-W // ts)
    n_tiles_y = -(-H // ts)
    T_tiles = n_tiles_x * n_tiles_y
    P = ts * ts
    bg = jnp.asarray(background, jnp.float32)

    # The pair-window binning only covers tiles within (tile_window//2)
    # of a Gaussian's center tile — clamp radii to match.
    eff_max_radius = min(cfg.max_radius, (cfg.tile_window // 2) * ts)
    proj = project_gaussians(positions, scales, rotations, camera,
                             max_radius=eff_max_radius)
    # Zero-opacity Gaussians (masked entries from static-shape pipelines like
    # SAAG) contribute nothing — drop them from binning so they don't occupy
    # per-tile capacity slots.
    proj = dataclasses.replace(proj, visible=proj.visible & (opacities > 0.0))
    N = positions.shape[0]
    sort_method = cfg.depth_sort
    if sort_method == "auto":
        # Measured (T-012): the quantized counting sort loses to lax.sort
        # at every N — its permutation gathers/scatters cost more than the
        # O(N log^2 N) sort saves.  "auto" therefore always means exact.
        sort_method = "exact"
    order = depth_sort_indices(proj, method=sort_method)

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

    binning = cfg.binning
    if binning == "auto":
        # Pair-scatter cost grows ~0.7 us/Gaussian; the rank-table search
        # is output-proportional beyond that.  Crossover at 512²: ~100k.
        # NOTE the table-free "chunked" path is NOT auto-selected: on real
        # v5e its (T, M, 256) level-2 interval gather costs a ~650 ms floor
        # (4-6x slower than search at 200k-1M, T-022) — it only wins if
        # that gather moves into a Pallas kernel.
        binning = "search" if N >= 98304 else "pairs"
    if binning == "stream":
        from fresnel_tpu.render.pallas_stream_binning import (
            bin_gaussians_stream)

        tile_idx, tile_valid = bin_gaussians_stream(
            means2d, radii, visible, n_tiles_x, n_tiles_y, ts, m_cap,
            interpret=cfg.pallas_interpret)
    elif binning == "chunked":
        tile_idx, tile_valid = _bin_gaussians_chunked(
            means2d, radii, visible, n_tiles_x, n_tiles_y, ts, m_cap)
    elif binning == "rows":
        tile_idx, tile_valid = _bin_gaussians_rows(
            means2d, radii, visible, n_tiles_x, n_tiles_y, ts, m_cap,
            row_capacity=cfg.row_capacity)
    elif binning == "search":
        # Bound the bf16 rank-table slab to ~2 GB (2^30 bf16 elements) by
        # scanning tile-row groups: keeps 5M Gaussians (the reference's
        # sort cap) inside HBM.  groups=1 up to ~1M @512^2 (unchanged).
        T_tiles_all = n_tiles_x * n_tiles_y
        n2_est = -(-N // 256) * 256
        groups = 1
        while (n2_est * T_tiles_all) // groups > (1 << 30) \
                and groups < n_tiles_y:
            groups *= 2
        tile_idx, tile_valid = _bin_gaussians_search(
            means2d, radii, visible, n_tiles_x, n_tiles_y, ts, m_cap,
            tile_window=cfg.tile_window, groups=groups,
            table=cfg.table_build, pallas_interpret=cfg.pallas_interpret)
    else:
        tile_idx, tile_valid = _bin_gaussians(
            means2d, radii, visible, n_tiles_x, n_tiles_y, ts, m_cap,
            tile_window=cfg.tile_window)

    # ONE gather from a per-Gaussian packed table instead of six separate
    # fancy-index gathers — the gathers dominate pre-composite cost (~11 ms
    # of the 36 ms forward at 512^2 / 20k Gaussians).  Invalid slots index
    # the sentinel row N (opacity 0, radius -1: the inside-box test is false
    # everywhere and no gradient — incl. d/d-opacity — can leak out; the
    # gather VJP scatters their cotangents onto the constant sentinel row).
    # Radius gradient is stopped: it only gates the inside-box test, and a
    # LITERAL zero cotangent into effective_radius hits sqrt'(0) = inf for
    # exactly-isotropic Gaussians (trace^2 == 4 det).
    fields = jnp.concatenate(
        [means2d, conic,
         jax.lax.stop_gradient(radii)[..., None],
         colors_s, opac_s[..., None], depths[..., None],
         jnp.zeros_like(opac_s)[..., None]], axis=-1)      # (N, 12)
    sentinel = jnp.zeros((1, fields.shape[-1]), fields.dtype).at[0, 5].set(-1.0)
    fields = jnp.concatenate([fields, sentinel], axis=0)   # (N + 1, 12)
    idx_safe = jnp.where(tile_valid, tile_idx, fields.shape[0] - 1)
    g_pack = fields[idx_safe]                              # (T, M, 12)

    g_mean = g_pack[..., 0:2]
    g_conic = g_pack[..., 2:5]
    g_radius = g_pack[..., 5]
    g_color = g_pack[..., 6:9]
    g_op = g_pack[..., 9]
    g_depth = g_pack[..., 10]
    g_phase = None
    if cfg.use_phase_blending and phases_s is not None:
        ph = phases_s if phases_s.ndim == 1 else phases_s[..., 0]
        g_phase = jnp.where(tile_valid, ph[tile_idx], 0.0)

    # Per-tile pixel coordinates (T, P).
    tx = jnp.arange(n_tiles_x, dtype=jnp.float32) * ts
    ty = jnp.arange(n_tiles_y, dtype=jnp.float32) * ts
    x0 = jnp.tile(tx, n_tiles_y)[:, None]
    y0 = jnp.repeat(ty, n_tiles_x)[:, None]
    lx = jnp.tile(jnp.arange(ts, dtype=jnp.float32), ts)[None, :]
    ly = jnp.repeat(jnp.arange(ts, dtype=jnp.float32), ts)[None, :]
    px = x0 + lx                      # (T, P)
    py = y0 + ly

    backend = cfg.backend
    if backend == "auto":
        # The Pallas kernel's analytic backward is ~1.8x faster than XLA
        # autodiff on TPU; on CPU/GPU backends Pallas TPU kernels can't run
        # compiled, so fall back to the portable scan compositor.
        backend = "pallas" if jax.default_backend() not in ("cpu", "gpu")             else "xla"
    if backend == "pallas" and g_phase is None and ts == 16:
        from fresnel_tpu.render.pallas_raster import (
            composite_tiles_pallas_packed)
        # g_pack is already kernel-ready: sentinel row supplied the
        # opacity-0 / radius -1 masking and the radius grad is stopped.
        acc_c, acc_d, Tr = composite_tiles_pallas_packed(
            g_pack, n_tiles_x, interpret=cfg.pallas_interpret,
            counts=jnp.sum(tile_valid, axis=1))
    else:
        acc_c, acc_d, Tr = _composite_tiles(
            px, py, g_mean, g_conic, g_color, g_op, g_depth, g_radius,
            tile_valid, cfg, g_phase=g_phase)

    acc_c = acc_c + Tr[..., None] * bg

    # Reassemble (T, P, 3) tiles into the padded image, then crop.
    img = acc_c.reshape(n_tiles_y, n_tiles_x, ts, ts, 3)
    img = img.transpose(0, 2, 1, 3, 4).reshape(n_tiles_y * ts, n_tiles_x * ts, 3)
    img = jnp.clip(img[:H, :W], 0.0, 1.0).transpose(2, 0, 1)

    def _untile(x):
        x = x.reshape(n_tiles_y, n_tiles_x, ts, ts)
        return x.transpose(0, 2, 1, 3).reshape(
            n_tiles_y * ts, n_tiles_x * ts)[:H, :W]

    out = (img,)
    if return_depth:
        out += (_untile(acc_d),)
    if return_transmittance:
        out += (_untile(Tr),)
    if return_overflow:
        totals = _tile_totals(means2d, radii, visible,
                              n_tiles_x, n_tiles_y, ts)
        dropped = jnp.sum(jnp.maximum(totals - m_cap, 0))
        out += (jnp.stack([dropped, jnp.sum(totals),
                           jnp.sum((totals > m_cap).astype(jnp.int32)),
                           jnp.max(totals)]),)
    return out if len(out) > 1 else img
