"""EWA projection of 3D Gaussians to screen space — the analytic core every
renderer shares.

All functions are pure jnp over full arrays (no Python loops over Gaussians):
a single fused XLA program per camera, vmap-able over batch.

Parity notes:
  * Math mirrors the reference's shared projection
    (reference: scripts/models/differentiable_renderer.py:123-195):
    Sigma3D = (V R) S S^T (V R)^T in camera frame, 2x3 perspective Jacobian J,
    Sigma2D = J Sigma3D J^T.
  * The reference's Jacobian uses J[1,2] = +fy*y/z^2 (analytically the term is
    negative for v = fy*y/z).  We reproduce the reference's convention because
    trained checkpoints and its render fidelity baselines embed it; it only
    flips the sign of the y-z shear contribution to the off-diagonal term.
  * 3-sigma radius from the max eigenvalue of Sigma2D, clamped
    (reference: differentiable_renderer.py:452-487).
  * Conic = inverse of (Sigma2D + 1e-4 I)
    (reference: differentiable_renderer.py:560-562).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fresnel_tpu.core.camera import Camera
from fresnel_tpu.core.gaussians import quaternion_to_rotation_matrix


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianProjection:
    """Screen-space view of a Gaussian cloud (all shapes lead with N)."""

    means2d: jax.Array    # (N, 2) pixel centers
    cov2d: jax.Array      # (N, 2, 2)
    conic: jax.Array      # (N, 3) packed inverse covariance [a, b, c]:
                          #   mahal = a dx^2 + 2 b dx dy + c dy^2
    depths: jax.Array     # (N,) positive view-space depth
    radii: jax.Array      # (N,) 3-sigma pixel radius (clamped)
    visible: jax.Array    # (N,) bool frustum/screen visibility


def compute_2d_covariance(
    positions: jax.Array,   # (N, 3)
    scales: jax.Array,      # (N, 3)
    rotations: jax.Array,   # (N, 4) wxyz
    camera: Camera,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (cov2d (N,2,2), means2d (N,2), depths (N,))."""
    p_cam = camera.world_to_camera(positions)
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    depths = -z

    R = quaternion_to_rotation_matrix(rotations)              # (N, 3, 3)
    view_rot = camera.view[:3, :3]
    # Batched 3x3 matmuls are the wrong op on TPU twice over: tiny matrices
    # waste the 128x128 MXU, and the default bf16 multiplies corrupt the
    # covariance chain (0.68% conic error that the inversion amplifies —
    # T-017), while Precision.HIGHEST costs 6 passes (82 ms for projection
    # alone at 1M, T-020).  Broadcast-and-reduce keeps the whole chain
    # elementwise on the VPU: exact f32 AND fully fusable (6 ms at 1M).
    # M = view_rot @ R, expanded over the contracted axis:
    M = jnp.sum(view_rot[None, :, :, None] * R[:, None, :, :], axis=2)
    # cov3d = M diag(s^2) M^T (symmetric quadratic form):
    s2 = scales * scales                                      # (N, 3)
    Ms = M * s2[:, None, :]
    cov3d = jnp.sum(Ms[:, :, None, :] * M[:, None, :, :], axis=-1)

    z_safe = jnp.maximum(jnp.abs(z), 0.01) * jnp.sign(z + 1e-8)
    z2 = z_safe * z_safe
    fx, fy = camera.fx, camera.fy

    # J rows: du/d(x,y,z), dv/d(x,y,z)  (reference convention, see module
    # doc).  J is sparse ([0,1] and [1,0] are zero), so J Sigma J^T expands
    # to a handful of scalar products — again pure VPU, no (N,2,3) matmuls.
    ja = fx / (-z_safe)               # du/dx
    jb = fx * x / z2                  # du/dz
    jc = fy / z_safe                  # dv/dy
    jd = fy * y / z2                  # dv/dz
    s00 = cov3d[..., 0, 0]
    s01 = cov3d[..., 0, 1]
    s02 = cov3d[..., 0, 2]
    s11 = cov3d[..., 1, 1]
    s12 = cov3d[..., 1, 2]
    s22 = cov3d[..., 2, 2]
    c00 = ja * ja * s00 + 2.0 * ja * jb * s02 + jb * jb * s22
    c01 = ja * (jc * s01 + jd * s02) + jb * (jc * s12 + jd * s22)
    c11 = jc * jc * s11 + 2.0 * jc * jd * s12 + jd * jd * s22
    cov2d = jnp.stack(
        [jnp.stack([c00, c01], axis=-1), jnp.stack([c01, c11], axis=-1)],
        axis=-2)                                               # (N, 2, 2)

    u = fx * x / (-z_safe) + camera.cx
    v = fy * (-y) / (-z_safe) + camera.cy
    means2d = jnp.stack([u, v], axis=-1)
    return cov2d, means2d, depths


def effective_radius(cov2d: jax.Array, max_radius: float = 64.0) -> jax.Array:
    """3-sigma pixel radius from the larger eigenvalue of each 2x2 covariance."""
    a = cov2d[..., 0, 0]
    b = cov2d[..., 0, 1]
    c = cov2d[..., 1, 0]
    d = cov2d[..., 1, 1]
    trace = a + d
    det = jnp.maximum(a * d - b * c, 1e-6)
    disc = jnp.maximum(trace * trace - 4.0 * det, 0.0)
    lam_max = 0.5 * (trace + jnp.sqrt(disc))
    radii = 3.0 * jnp.sqrt(jnp.maximum(lam_max, 1e-6))
    return jnp.minimum(radii, max_radius)


def conic_from_cov(cov2d: jax.Array, eps: float = 1e-4) -> jax.Array:
    """Packed inverse of the regularized 2x2 covariance: [a, b, c] such that
    mahalanobis = a dx^2 + 2 b dx dy + c dy^2."""
    a = cov2d[..., 0, 0] + eps
    b = 0.5 * (cov2d[..., 0, 1] + cov2d[..., 1, 0])
    d = cov2d[..., 1, 1] + eps
    det = jnp.maximum(a * d - b * b, 1e-12)
    inv_det = 1.0 / det
    return jnp.stack([d * inv_det, -b * inv_det, a * inv_det], axis=-1)


def project_gaussians(
    positions: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    camera: Camera,
    max_radius: float = 64.0,
    visibility_margin: Optional[float] = None,
) -> GaussianProjection:
    """Full screen-space projection with visibility classification.

    visibility_margin=None uses the per-Gaussian radius as the screen margin
    (tile-renderer semantics); a float uses a fixed pixel margin (the dense
    reference renderer uses 100).
    """
    cov2d, means2d, depths = compute_2d_covariance(positions, scales, rotations, camera)
    radii = effective_radius(cov2d, max_radius=max_radius)
    conic = conic_from_cov(cov2d)

    W, H = camera.width, camera.height
    margin = radii if visibility_margin is None else visibility_margin
    u, v = means2d[..., 0], means2d[..., 1]
    visible = (depths > camera.near) & (depths < camera.far)
    visible &= (u + margin > 0) & (u - margin < W)
    visible &= (v + margin > 0) & (v - margin < H)
    return GaussianProjection(
        means2d=means2d, cov2d=cov2d, conic=conic,
        depths=depths, radii=radii, visible=visible,
    )


def depth_sort_indices(proj: GaussianProjection,
                       method: str = "exact") -> jax.Array:
    """Front-to-back order with invisible Gaussians pushed to the end.

    method="exact": lax.sort via jnp.argsort — the hardware sort library.
    Its O(N log^2 N) cost dominates projection beyond ~500k Gaussians
    (~60 ms of the 71 ms proj+sort at 1M, experiments/README.md T-011).

    method="counting": 16-bit-quantized two-pass LSD counting sort built on
    the same MXU rank-cumsum trick as the search binning — the TPU-native
    realization of the reference's GPU radix sort, which ALSO quantizes its
    depth keys (reference: src/core/compute/radix_sort.cpp:8-58 quantizes
    depth*1000 to u32).  Keys are quantized to 65535 levels over the visible
    depth range; ties keep submission order (stable).

    method="packed": 12-bit-quantized depth packed with the 20-bit index
    into ONE uint32, sorted as a single array — halves the sort's memory
    traffic vs the (f32 key, i32 index) pair of "exact", yet measured a
    WASH end to end (130 vs 131 ms @500k, 203 both @1M, T-013): the TPU
    sort's cost sits in its O(log^2 N) comparator passes, not bandwidth.
    Kept as the documented negative result.  Index-in-low-bits makes ties
    stable; only the compositing ORDER is quantized (4095 depth levels
    across the visible range — finer than the reference GPU sort's 1 mm
    buckets); rendered depths stay exact.  Requires N <= 2^20.
    """
    if method == "counting":
        return _counting_depth_sort(proj.depths, proj.visible)
    if method == "packed":
        return _packed_depth_sort(proj.depths, proj.visible)
    key = jnp.where(proj.visible, proj.depths, jnp.inf)
    return jnp.argsort(key)


def _packed_depth_sort(depths: jax.Array, visible: jax.Array) -> jax.Array:
    n = depths.shape[0]
    if n > (1 << 20):
        raise ValueError("packed depth sort supports at most 2^20 Gaussians")
    big = jnp.float32(3.4e38)
    dmin = jnp.min(jnp.where(visible, depths, big))
    dmax = jnp.max(jnp.where(visible, depths, -big))
    scale = 4094.0 / jnp.maximum(dmax - dmin, 1e-12)
    q = jnp.clip((depths - dmin) * scale, 0.0, 4094.0).astype(jnp.uint32)
    q = jnp.where(visible, q, jnp.uint32(4095))      # invisible sort last
    packed = (q << 20) | jnp.arange(n, dtype=jnp.uint32)
    return (jax.lax.sort(packed) & jnp.uint32(0xFFFFF)).astype(jnp.int32)


def _digit_positions(digit: jax.Array, n2: int) -> jax.Array:
    """Stable destination of each element when sorted by its 8-bit digit.

    Per-256-chunk one-hot cumsums are ONE lower-triangular bf16 matmul per
    chunk (counts <= 256 exact in bf16); chunk bases and bucket starts are
    small int32 cumsums.
    """
    c = 256
    n_chunks = n2 // c
    oh = (digit[:, None] == jnp.arange(256, dtype=jnp.int32)[None, :])
    oh = oh.reshape(n_chunks, c, 256).astype(jnp.bfloat16)
    L = jnp.tril(jnp.ones((c, c), jnp.bfloat16))
    C_in = jnp.einsum("ij,njd->nid", L, oh,
                      preferred_element_type=jnp.bfloat16)   # (nch, c, 256)
    totals = C_in[:, -1, :].astype(jnp.int32)                # (nch, 256)
    base = jnp.cumsum(totals, axis=0) - totals               # exclusive
    digit_totals = base[-1] + totals[-1]                     # (256,)
    bucket_start = jnp.cumsum(digit_totals) - digit_totals   # exclusive

    # Rank of each element within its digit bucket: row-contiguous gather
    # from the chunk cumsum + a small gather from the (nch, 256) base table.
    C_flat = C_in.reshape(n2, 256)
    d_col = digit[:, None]
    in_chunk = jnp.take_along_axis(C_flat, d_col, axis=1)[:, 0]
    chunk_id = jnp.arange(n2, dtype=jnp.int32) // c
    rank = in_chunk.astype(jnp.int32) - 1 + base[chunk_id, digit]
    return bucket_start[digit] + rank


def _counting_depth_sort(depths: jax.Array, visible: jax.Array) -> jax.Array:
    n = depths.shape[0]
    c = 256
    n2 = -(-n // c) * c

    # Quantize visible depths to [0, 65534] over their dynamic range;
    # invisible (and padding) keys are 0xFFFF and sort last (stably after
    # any real 0xFFFF key).
    big = jnp.float32(3.4e38)
    dmin = jnp.min(jnp.where(visible, depths, big))
    dmax = jnp.max(jnp.where(visible, depths, -big))
    scale = 65534.0 / jnp.maximum(dmax - dmin, 1e-12)
    q = jnp.clip((depths - dmin) * scale, 0.0, 65534.0).astype(jnp.int32)
    keys = jnp.where(visible, q, 0xFFFF)
    keys = jnp.pad(keys, (0, n2 - n), constant_values=0xFFFF)

    idx = jnp.arange(n2, dtype=jnp.int32)
    for shift in (0, 8):
        digit = (keys >> shift) & 0xFF
        pos = _digit_positions(digit, n2)
        # invperm[p] = the element that lands at p; applying it is two
        # gathers (cheaper than scattering both payload arrays).
        invperm = jnp.zeros((n2,), jnp.int32).at[pos].set(
            jnp.arange(n2, dtype=jnp.int32), unique_indices=True)
        keys = keys[invperm]
        idx = idx[invperm]
    return idx[:n]
