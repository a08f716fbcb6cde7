"""Geometry/core tests: quaternions, 6D rotation, camera conventions, I/O.

Mirrors the reference's analytic checks (covariance Sigma = 0.25 I for
isotropic scale 0.5, camera center/right-of-center/depth invariants —
reference: tests/test_gaussian_renderer.cpp:20-86) plus round-trip property
tests the reference lacks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fresnel_tpu.core.gaussians import (
    GaussianCloud,
    quaternion_to_rotation_matrix,
    quaternion_multiply,
    rotation_matrix_to_quaternion,
    rotation_6d_to_quaternion,
)
from fresnel_tpu.core.camera import Camera
from fresnel_tpu.core import io as gio


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuaternions:
    def test_identity(self):
        R = quaternion_to_rotation_matrix(jnp.array([1.0, 0.0, 0.0, 0.0]))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_orthonormal(self):
        q = jnp.asarray(random_quats(64))
        R = quaternion_to_rotation_matrix(q)
        RtR = jnp.einsum("nij,nik->njk", R, R)
        np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (64, 3, 3)), atol=1e-5)
        det = jnp.linalg.det(R)
        np.testing.assert_allclose(det, np.ones(64), atol=1e-5)

    def test_roundtrip_matrix_quat(self):
        q = jnp.asarray(random_quats(128, seed=3))
        R = quaternion_to_rotation_matrix(q)
        q2 = rotation_matrix_to_quaternion(R)
        # q and -q are the same rotation.
        dot = jnp.abs(jnp.sum(q * q2, axis=-1))
        np.testing.assert_allclose(dot, np.ones(128), atol=1e-4)

    def test_multiply_matches_matrix_product(self):
        qa = jnp.asarray(random_quats(16, seed=1))
        qb = jnp.asarray(random_quats(16, seed=2))
        Rab = quaternion_to_rotation_matrix(quaternion_multiply(qa, qb))
        RaRb = quaternion_to_rotation_matrix(qa) @ quaternion_to_rotation_matrix(qb)
        np.testing.assert_allclose(Rab, RaRb, atol=1e-5)

    def test_6d_valid_rotation(self):
        rng = np.random.default_rng(7)
        r6 = jnp.asarray(rng.normal(size=(256, 6)).astype(np.float32))
        q = rotation_6d_to_quaternion(r6)
        norms = jnp.linalg.norm(q, axis=-1)
        np.testing.assert_allclose(norms, np.ones(256), atol=1e-4)
        R = quaternion_to_rotation_matrix(q)
        det = jnp.linalg.det(R)
        np.testing.assert_allclose(det, np.ones(256), atol=1e-4)

    def test_6d_degenerate_no_nan(self):
        # Parallel vectors and zeros must not produce NaN.
        bad = jnp.array([
            [1.0, 0, 0, 1.0, 0, 0],
            [0, 0, 0, 0, 0, 0],
            [1e-9, 0, 0, 0, 1e-9, 0],
        ], jnp.float32)
        q = rotation_6d_to_quaternion(bad)
        assert not bool(jnp.any(jnp.isnan(q)))


class TestCovariance:
    def test_isotropic_analytic(self):
        # scale 0.5 in all axes -> Sigma = 0.25 I regardless of rotation
        # (reference: tests/test_gaussian_renderer.cpp:30-49).
        cloud = GaussianCloud.test_cloud(8, seed=1).replace(
            scales=jnp.full((8, 3), 0.5, jnp.float32),
            rotations=jnp.asarray(random_quats(8, seed=5)),
        )
        cov = cloud.covariance_3d()
        np.testing.assert_allclose(
            cov, np.broadcast_to(0.25 * np.eye(3), (8, 3, 3)), atol=1e-5)


class TestCamera:
    def test_center_projects_to_center(self):
        cam = Camera.look_at(eye=(0, 0, 5), target=(0, 0, 0), render_size=800)
        uv, depth = cam.project(jnp.array([0.0, 0.0, 0.0]))
        np.testing.assert_allclose(uv, [400.0, 400.0], atol=1.0)
        np.testing.assert_allclose(depth, 5.0, atol=1e-4)

    def test_right_of_center(self):
        cam = Camera.look_at(eye=(0, 0, 5), target=(0, 0, 0), render_size=800)
        uv, _ = cam.project(jnp.array([1.0, 0.0, 0.0]))
        assert float(uv[0]) > 400.0

    def test_y_flip(self):
        # World +Y (up) must project ABOVE center: smaller v (origin top-left).
        cam = Camera.look_at(eye=(0, 0, 5), target=(0, 0, 0), render_size=800)
        uv, _ = cam.project(jnp.array([0.0, 1.0, 0.0]))
        assert float(uv[1]) < 400.0

    def test_default_training_camera(self):
        cam = Camera.default_training(256)
        np.testing.assert_allclose(float(cam.view[2, 3]), -2.0)
        uv, depth = cam.project(jnp.array([0.0, 0.0, 0.0]))
        np.testing.assert_allclose(uv, [128.0, 128.0], atol=1e-3)
        np.testing.assert_allclose(depth, 2.0, atol=1e-5)

    def test_from_pose_frontal_matches_identity_view(self):
        cam = Camera.from_pose(0.0, 0.0, 256, distance=2.0)
        ref = Camera.default_training(256)
        np.testing.assert_allclose(cam.view, ref.view, atol=1e-5)

    def test_from_pose_orbits(self):
        cam = Camera.from_pose(0.3, 1.2, 128, distance=2.0)
        pos = cam.position
        np.testing.assert_allclose(float(jnp.linalg.norm(pos)), 2.0, atol=1e-4)
        # Looking at origin: origin depth equals distance.
        _, depth = cam.project(jnp.zeros(3))
        np.testing.assert_allclose(depth, 2.0, atol=1e-4)

    def test_traceable_pose(self):
        f = jax.jit(lambda az: Camera.from_pose(0.0, az, 64).view)
        v = f(jnp.float32(0.5))
        assert v.shape == (4, 4)


class TestIO:
    def test_binary_roundtrip(self, tmp_path):
        cloud = GaussianCloud.test_cloud(37, seed=2)
        p = tmp_path / "cloud.bin"
        gio.save_binary(p, cloud)
        # 14 little-endian floats per Gaussian.
        assert p.stat().st_size == 37 * 14 * 4
        back = gio.load_binary(p)
        np.testing.assert_allclose(back.positions, cloud.positions, rtol=1e-6)
        np.testing.assert_allclose(back.opacities, cloud.opacities, rtol=1e-6)

    def test_ply_roundtrip(self, tmp_path):
        cloud = GaussianCloud.test_cloud(21, seed=4)
        p = tmp_path / "cloud.ply"
        gio.save_ply(p, cloud)
        back = gio.load_ply(p)
        np.testing.assert_allclose(back.positions, cloud.positions, rtol=1e-5)
        np.testing.assert_allclose(back.scales, cloud.scales, rtol=1e-4)
        np.testing.assert_allclose(back.colors, cloud.colors, atol=1e-5)
        np.testing.assert_allclose(back.opacities, cloud.opacities, atol=1e-5)

    def test_flat_roundtrip(self):
        cloud = GaussianCloud.test_cloud(10)
        back = GaussianCloud.from_flat(cloud.to_flat())
        np.testing.assert_allclose(back.rotations, cloud.rotations)


class TestCloudOps:
    def test_normalize(self):
        cloud = GaussianCloud.test_cloud(100, seed=9, spread=2.0)
        norm = cloud.normalize(3.0)
        lo, hi = norm.bounds()
        np.testing.assert_allclose(float(jnp.max(hi - lo)), 3.0, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(lo + hi), np.zeros(3), atol=1e-4)

    def test_concatenate(self):
        a = GaussianCloud.test_cloud(5)
        b = GaussianCloud.test_cloud(7)
        c = a.concatenate(b)
        assert c.num_gaussians == 12
