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
    R_cam = jnp.einsum("ij,njk->nik", view_rot, R)
    RS = R_cam * scales[..., None, :]                          # scale columns
    cov3d = RS @ jnp.swapaxes(RS, -1, -2)                      # (N, 3, 3)

    z_safe = jnp.maximum(jnp.abs(z), 0.01) * jnp.sign(z + 1e-8)
    z2 = z_safe * z_safe
    fx, fy = camera.fx, camera.fy

    # J rows: du/d(x,y,z), dv/d(x,y,z)  (reference convention, see module doc)
    zeros = jnp.zeros_like(z_safe)
    J = jnp.stack(
        [
            jnp.stack([fx / (-z_safe), zeros, fx * x / z2], axis=-1),
            jnp.stack([zeros, fy / z_safe, fy * y / z2], axis=-1),
        ],
        axis=-2,
    )  # (N, 2, 3)

    cov2d = J @ cov3d @ jnp.swapaxes(J, -1, -2)                # (N, 2, 2)

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


def depth_sort_indices(proj: GaussianProjection) -> jax.Array:
    """Front-to-back order with invisible Gaussians pushed to the end.

    Uses lax.sort via jnp.argsort on a masked key — on TPU this lowers to the
    hardware sort library rather than a hand-written radix sort (the TPU-native
    answer to the reference's 4-pass GLSL radix sort,
    reference: src/core/compute/radix_sort.cpp).
    """
    key = jnp.where(proj.visible, proj.depths, jnp.inf)
    return jnp.argsort(key)
