"""Pinhole camera model with the reference's projection conventions.

Parity notes (conventions, verified against the reference — sign bugs here
dominated the reference's bug history, experiments/003 & 009):
  * View matrix is world->camera; camera looks down -Z
    (reference: scripts/models/differentiable_renderer.py:24-86).
  * Pixel projection:  u = fx * x / (-z) + cx,  v = fy * (-y) / (-z) + cy
    — the Y flip puts the image origin at top-left
    (reference: differentiable_renderer.py:78-80, src/core/renderer/camera.hpp:95-104).
  * Positive depth = -z (in front of camera)
    (reference: camera.hpp:109-112).
  * Default training camera: fx = fy = size * 0.8, cx = cy = size / 2
    (reference: scripts/training/train_gaussian_decoder.py:1910-1917).
  * Frontal eval camera: identity view with view[2,3] = -2
    (reference: scripts/training/visual_eval.py:128-131).
  * Orbit camera (elevation, azimuth, distance) with R rows
    [right, up, -forward] (reference: train_gaussian_decoder.py:684-757).

Width/height are static metadata (Python ints) so jit-compiled renderers get
static output shapes; everything else is traced.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    view: jax.Array  # (4, 4) world->camera
    width: int = dataclasses.field(metadata=dict(static=True), default=512)
    height: int = dataclasses.field(metadata=dict(static=True), default=512)
    near: float = dataclasses.field(metadata=dict(static=True), default=0.01)
    far: float = dataclasses.field(metadata=dict(static=True), default=100.0)

    # ------------------------------------------------------------------
    # Constructors
    # ------------------------------------------------------------------
    @classmethod
    def create(cls, fx, fy, cx, cy, width, height, view=None,
               near: float = 0.01, far: float = 100.0) -> "Camera":
        if view is None:
            view = jnp.eye(4, dtype=jnp.float32)
        return cls(
            fx=jnp.asarray(fx, jnp.float32),
            fy=jnp.asarray(fy, jnp.float32),
            cx=jnp.asarray(cx, jnp.float32),
            cy=jnp.asarray(cy, jnp.float32),
            view=jnp.asarray(view, jnp.float32),
            width=int(width),
            height=int(height),
            near=float(near),
            far=float(far),
        )

    @classmethod
    def default_training(cls, render_size: int, focal_mult: float = 0.8,
                         origin_depth: float = 2.0) -> "Camera":
        """Frontal camera used by the reference training loop: camera at
        world (0, 0, origin_depth) looking down -Z (view[2,3] = -origin_depth)."""
        view = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(-origin_depth)
        return cls.create(
            fx=render_size * focal_mult,
            fy=render_size * focal_mult,
            cx=render_size / 2,
            cy=render_size / 2,
            width=render_size,
            height=render_size,
            view=view,
        )

    @classmethod
    def from_pose(cls, elevation_rad, azimuth_rad, render_size: int,
                  focal_mult: float = 0.8, distance: float = 2.0,
                  near: float = 0.01, far: float = 100.0) -> "Camera":
        """Orbit camera at (elevation, azimuth) looking at the origin.

        Traceable: elevation/azimuth may be JAX scalars (no Python branching
        on degenerate poses — the straight-up singularity is resolved with
        jnp.where).
        """
        el = jnp.asarray(elevation_rad, jnp.float32)
        az = jnp.asarray(azimuth_rad, jnp.float32)
        d = jnp.asarray(distance, jnp.float32)
        cam = jnp.stack(
            [d * jnp.cos(el) * jnp.sin(az), d * jnp.sin(el), d * jnp.cos(el) * jnp.cos(az)]
        )
        view = look_at_view(cam, jnp.zeros(3, jnp.float32))
        return cls.create(
            fx=render_size * focal_mult,
            fy=render_size * focal_mult,
            cx=render_size / 2,
            cy=render_size / 2,
            width=render_size,
            height=render_size,
            view=view,
            near=near,
            far=far,
        )

    @classmethod
    def look_at(cls, eye, target, render_size: int = 512, fov_y_deg: float = 45.0,
                up=(0.0, 1.0, 0.0), near: float = 0.1, far: float = 100.0) -> "Camera":
        """Camera with focal length from vertical FOV (matches the C++ viewer:
        fy = H / (2 tan(fov_y/2)), square pixels)."""
        fy = render_size / (2.0 * np.tan(np.radians(fov_y_deg) * 0.5))
        view = look_at_view(jnp.asarray(eye, jnp.float32),
                            jnp.asarray(target, jnp.float32),
                            jnp.asarray(up, jnp.float32))
        return cls.create(
            fx=fy, fy=fy, cx=render_size / 2, cy=render_size / 2,
            width=render_size, height=render_size, view=view, near=near, far=far,
        )

    # ------------------------------------------------------------------
    # Derived quantities
    # ------------------------------------------------------------------
    def replace(self, **kw) -> "Camera":
        return dataclasses.replace(self, **kw)

    @property
    def position(self) -> jax.Array:
        """Camera center in world space: -R^T t."""
        R = self.view[:3, :3]
        t = self.view[:3, 3]
        return -R.T @ t

    def world_to_camera(self, points: jax.Array) -> jax.Array:
        """(..., 3) world points -> (..., 3) camera-space points.

        Broadcast-and-reduce instead of an (N, 3) x (3, 3) matmul: the TPU
        default would run the matmul with bf16 multiplies (~0.4% position
        error, T-017) and Precision.HIGHEST makes the tiny matmul 6-pass;
        the elementwise form is exact f32, fully fusable, and never touches
        the MXU (T-020)."""
        R = self.view[:3, :3]
        t = self.view[:3, 3]
        return jnp.sum(points[..., None, :] * R, axis=-1) + t

    def project(self, points: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """(..., 3) world points -> ((..., 2) pixel uv, (...,) positive depth).

        Matches the reference projection exactly, including the near-plane
        z clamp and the Y flip.
        """
        p_cam = self.world_to_camera(points)
        x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
        z_safe = jnp.maximum(jnp.abs(z), self.near) * jnp.sign(z + 1e-8)
        u = self.fx * x / (-z_safe) + self.cx
        v = self.fy * (-y) / (-z_safe) + self.cy
        return jnp.stack([u, v], axis=-1), -z

    def intrinsics(self) -> jax.Array:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )


def look_at_view(eye: jax.Array, target: jax.Array, up=None) -> jax.Array:
    """Right-handed Y-up lookAt view matrix (world->camera), rows
    [right, up', -forward] with translation -R @ eye.  Degenerate poses
    (looking straight along up) fall back to world X as right."""
    if up is None:
        up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    fwd = target - eye
    fn = jnp.linalg.norm(fwd)
    fwd = jnp.where(fn < 1e-6, jnp.array([0.0, 0.0, -1.0], jnp.float32), fwd / jnp.maximum(fn, 1e-6))
    right = jnp.cross(fwd, up)
    rn = jnp.linalg.norm(right)
    right = jnp.where(rn < 1e-6, jnp.array([1.0, 0.0, 0.0], jnp.float32), right / jnp.maximum(rn, 1e-6))
    up2 = jnp.cross(right, fwd)
    R = jnp.stack([right, up2, -fwd])  # (3, 3)
    t = -R @ eye
    view = jnp.eye(4, dtype=jnp.float32)
    view = view.at[:3, :3].set(R)
    view = view.at[:3, 3].set(t)
    return view
