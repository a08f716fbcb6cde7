"""Gaussian data model: the central pytree of the framework.

Parity notes (reference behavior, not code):
  * Parameter layout follows the reference's 14-float-per-Gaussian
    interchange convention [pos3, scale3, quat_wxyz4, rgb3, opacity1]
    (reference: src/core/renderer/gaussian.hpp:128-137,
    scripts/models/differentiable_renderer.py:1461-1497).
  * Quaternions are (w, x, y, z) everywhere
    (reference: scripts/models/differentiable_renderer.py:98-120).
  * 6D rotation parameterization follows Zhou et al. CVPR 2019 as used by
    the reference decoders
    (reference: scripts/models/gaussian_decoder_models.py:186-276).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianCloud:
    """A (possibly batched) cloud of 3D Gaussians as a JAX pytree.

    Shapes: leading dims ``(...,)`` are arbitrary batch dims, trailing dims
    fixed per field.  All fields are float32 arrays.

      positions:  (..., N, 3)   world-space centers
      scales:     (..., N, 3)   per-axis standard deviations (world units)
      rotations:  (..., N, 4)   unit quaternions, (w, x, y, z)
      colors:     (..., N, 3)   RGB in [0, 1]
      opacities:  (..., N)      opacity in [0, 1]
      phases:     (..., N, P) or None — optional wave phases (radians);
                  P=1 scalar phase or P=3 per-RGB-channel phase.
    """

    positions: jax.Array
    scales: jax.Array
    rotations: jax.Array
    colors: jax.Array
    opacities: jax.Array
    phases: Optional[jax.Array] = None

    @property
    def num_gaussians(self) -> int:
        return self.positions.shape[-2]

    def __len__(self) -> int:
        return self.num_gaussians

    def replace(self, **kw) -> "GaussianCloud":
        return dataclasses.replace(self, **kw)

    # ------------------------------------------------------------------
    # Geometry helpers
    # ------------------------------------------------------------------
    def covariance_3d(self) -> jax.Array:
        """Sigma = R S S^T R^T per Gaussian, shape (..., N, 3, 3).

        Elementwise broadcast-and-reduce: exact f32 on TPU (the batched
        3x3 matmul default is bf16) and VPU-fusable (see T-017/T-020)."""
        R = quaternion_to_rotation_matrix(self.rotations)
        RS = R * self.scales[..., None, :]  # scale columns of R
        return jnp.sum(RS[..., :, None, :] * RS[..., None, :, :], axis=-1)

    def bounds(self):
        lo = jnp.min(self.positions, axis=-2)
        hi = jnp.max(self.positions, axis=-2)
        return lo, hi

    def center(self) -> "GaussianCloud":
        lo, hi = self.bounds()
        mid = 0.5 * (lo + hi)
        return self.replace(positions=self.positions - mid[..., None, :])

    def normalize(self, target_extent: float = 3.0) -> "GaussianCloud":
        """Center and uniformly rescale so the largest extent equals target."""
        lo, hi = self.bounds()
        mid = 0.5 * (lo + hi)
        extent = jnp.max(hi - lo, axis=-1)
        s = target_extent / jnp.maximum(extent, 1e-8)
        return self.replace(
            positions=(self.positions - mid[..., None, :]) * s[..., None, None],
            scales=self.scales * s[..., None, None],
        )

    def concatenate(self, other: "GaussianCloud") -> "GaussianCloud":
        cat = lambda a, b: jnp.concatenate([a, b], axis=-2)
        phases = None
        if self.phases is not None and other.phases is not None:
            phases = cat(self.phases, other.phases)
        return GaussianCloud(
            positions=cat(self.positions, other.positions),
            scales=cat(self.scales, other.scales),
            rotations=cat(self.rotations, other.rotations),
            colors=cat(self.colors, other.colors),
            opacities=jnp.concatenate([self.opacities, other.opacities], axis=-1),
            phases=phases,
        )

    # ------------------------------------------------------------------
    # Interchange with flat (N, 14) parameter arrays
    # ------------------------------------------------------------------
    def to_flat(self) -> jax.Array:
        """Pack into (..., N, 14): [pos3, scale3, quat4, rgb3, opacity1]."""
        return jnp.concatenate(
            [
                self.positions,
                self.scales,
                self.rotations,
                self.colors,
                self.opacities[..., None],
            ],
            axis=-1,
        )

    @classmethod
    def from_flat(cls, flat: jax.Array) -> "GaussianCloud":
        return cls(
            positions=flat[..., 0:3],
            scales=flat[..., 3:6],
            rotations=flat[..., 6:10],
            colors=flat[..., 10:13],
            opacities=flat[..., 13],
        )

    # ------------------------------------------------------------------
    # Constructors
    # ------------------------------------------------------------------
    @classmethod
    def test_cloud(cls, n: int = 100, seed: int = 0, spread: float = 0.5,
                   z_offset: float = -3.0, scale: float = 0.1) -> "GaussianCloud":
        """A random cloud in front of the default camera (for tests/benchmarks)."""
        rng = np.random.default_rng(seed)
        pos = rng.normal(size=(n, 3)).astype(np.float32) * spread
        pos[:, 2] += z_offset
        rots = np.zeros((n, 4), np.float32)
        rots[:, 0] = 1.0
        return cls(
            positions=jnp.asarray(pos),
            scales=jnp.full((n, 3), scale, jnp.float32),
            rotations=jnp.asarray(rots),
            colors=jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
            opacities=jnp.full((n,), 0.8, jnp.float32),
        )


# ----------------------------------------------------------------------
# Rotation math
# ----------------------------------------------------------------------

def quaternion_normalize(q: jax.Array, eps: float = 1e-8) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quaternion_to_rotation_matrix(q: jax.Array) -> jax.Array:
    """(..., 4) wxyz unit quaternion -> (..., 3, 3) rotation matrix."""
    q = quaternion_normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    rows = jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def quaternion_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product of wxyz quaternions."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def rotation_matrix_to_quaternion(R: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix -> (..., 4) wxyz quaternion.

    Branch-free 4-case selection (the classic Shepperd method expressed with
    jnp.where so it traces cleanly under jit/vmap).
    """
    r00, r01, r02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    r10, r11, r12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    r20, r21, r22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    trace = r00 + r11 + r22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-10))

    s1 = safe_sqrt(trace + 1.0) * 2
    c1 = jnp.stack([0.25 * s1, (r21 - r12) / s1, (r02 - r20) / s1, (r10 - r01) / s1], -1)
    s2 = safe_sqrt(1.0 + r00 - r11 - r22) * 2
    c2 = jnp.stack([(r21 - r12) / s2, 0.25 * s2, (r01 + r10) / s2, (r02 + r20) / s2], -1)
    s3 = safe_sqrt(1.0 + r11 - r00 - r22) * 2
    c3 = jnp.stack([(r02 - r20) / s3, (r01 + r10) / s3, 0.25 * s3, (r12 + r21) / s3], -1)
    s4 = safe_sqrt(1.0 + r22 - r00 - r11) * 2
    c4 = jnp.stack([(r10 - r01) / s4, (r02 + r20) / s4, (r12 + r21) / s4, 0.25 * s4], -1)

    cond1 = (trace > 0)[..., None]
    cond2 = ((r00 > r11) & (r00 > r22))[..., None]
    cond3 = (r11 > r22)[..., None]
    q = jnp.where(cond1, c1, jnp.where(cond2, c2, jnp.where(cond3, c3, c4)))
    return quaternion_normalize(q)


def rotation_6d_to_quaternion(rot6d: jax.Array) -> jax.Array:
    """(..., 6) Zhou-et-al 6D rotation -> (..., 4) wxyz quaternion.

    Gram-Schmidt on the two 3-vectors, then matrix->quaternion.  Degenerate
    (parallel) inputs fall back to a fixed third axis rather than NaN.
    """
    a1, a2 = rot6d[..., 0:3], rot6d[..., 3:6]

    def norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-6)

    b1 = norm(a1)
    b2 = norm(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    b3n = jnp.linalg.norm(b3, axis=-1, keepdims=True)
    fallback = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], b3.dtype), b3.shape)
    b3 = jnp.where(b3n < 1e-6, fallback, b3)
    b3 = norm(b3)
    # Column-stack: R[:, 0] = b1, R[:, 1] = b2, R[:, 2] = b3
    R = jnp.stack([b1, b2, b3], axis=-1)
    return rotation_matrix_to_quaternion(R)
