"""Direct numerical parity against the REFERENCE implementation.

BASELINE.md requires "render fidelity: PSNR parity with reference renders".
The reference's training renderer is pure torch (no GPU needed), so when the
reference checkout is present (mounted read-only at /root/reference) we run
its TileBasedRenderer / compute_2d_covariance on CPU against this
framework's implementations on the SAME Gaussians and camera.

These tests are skipped when the reference isn't available (e.g. CI without
the mount) — they are validation artifacts, not unit tests of our code.
"""

import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

REF = Path("/root/reference/scripts")
ref_available = (REF / "models" / "differentiable_renderer.py").exists()

pytestmark = pytest.mark.skipif(
    not ref_available, reason="reference checkout not mounted")

if ref_available:
    sys.path.insert(0, str(REF / "models"))


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(42)
    n = 200
    pos = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    pos[:, 2] -= 0.0
    scales = rng.uniform(0.02, 0.12, size=(n, 3)).astype(np.float32)
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    op = rng.uniform(0.3, 0.95, size=n).astype(np.float32)
    return pos, scales, quat, colors, op


def torch_camera(size=128):
    import torch
    from differentiable_renderer import Camera as TorchCamera

    cam = TorchCamera(fx=size * 0.8, fy=size * 0.8, cx=size / 2, cy=size / 2,
                      width=size, height=size)
    view = torch.eye(4)
    view[2, 3] = -2.0
    cam.set_view(view)
    return cam


class TestCovarianceParity:
    def test_projection_matches_reference(self, scene):
        import torch
        from differentiable_renderer import compute_2d_covariance

        pos, scales, quat, colors, op = scene
        tcam = torch_camera()
        cov_t, means_t, depths_t = compute_2d_covariance(
            torch.from_numpy(pos), torch.from_numpy(scales),
            torch.from_numpy(quat), tcam)

        from fresnel_tpu.core.camera import Camera
        from fresnel_tpu.render.projection import compute_2d_covariance as ours

        cam = Camera.default_training(128)
        cov_j, means_j, depths_j = ours(
            jnp.asarray(pos), jnp.asarray(scales), jnp.asarray(quat), cam)

        np.testing.assert_allclose(np.asarray(means_j),
                                   means_t.numpy(), atol=1e-2)
        np.testing.assert_allclose(np.asarray(depths_j),
                                   depths_t.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(cov_j),
                                   cov_t.numpy(), rtol=2e-2, atol=2e-2)

    def test_render_psnr_parity(self, scene):
        """Full-image PSNR between the reference TileBasedRenderer and our
        tiled rasterizer on the same scene."""
        import torch
        from differentiable_renderer import TileBasedRenderer

        pos, scales, quat, colors, op = scene
        tcam = torch_camera()
        with torch.no_grad():
            ref_img = TileBasedRenderer(128, 128)(
                torch.from_numpy(pos), torch.from_numpy(scales),
                torch.from_numpy(quat), torch.from_numpy(colors),
                torch.from_numpy(op), tcam).numpy()

        from fresnel_tpu.core.camera import Camera
        from fresnel_tpu.render.tile import TileRendererConfig, render_tiled

        cam = Camera.default_training(128)
        ours = np.asarray(render_tiled(
            jnp.asarray(pos), jnp.asarray(scales), jnp.asarray(quat),
            jnp.asarray(colors), jnp.asarray(op), cam,
            config=TileRendererConfig(max_per_tile=256)))

        mse = float(np.mean((ref_img - ours) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        # The implementations differ in evaluation support (reference:
        # per-Gaussian bbox; ours: 3-sigma box within binned tiles), so
        # expect high but not exact agreement.
        assert psnr > 30.0, f"render parity PSNR {psnr:.1f} dB < 30"

    def test_dense_renderer_parity(self, scene):
        import torch
        from differentiable_renderer import DifferentiableGaussianRenderer

        pos, scales, quat, colors, op = scene
        tcam = torch_camera(64)
        with torch.no_grad():
            ref_img = DifferentiableGaussianRenderer(64, 64)(
                torch.from_numpy(pos), torch.from_numpy(scales),
                torch.from_numpy(quat), torch.from_numpy(colors),
                torch.from_numpy(op), tcam).numpy()

        from fresnel_tpu.core.camera import Camera
        from fresnel_tpu.render.dense import render_dense

        cam = Camera.default_training(64)
        ours = np.asarray(render_dense(
            jnp.asarray(pos), jnp.asarray(scales), jnp.asarray(quat),
            jnp.asarray(colors), jnp.asarray(op), cam))
        mse = float(np.mean((ref_img - ours) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr > 35.0, f"dense parity PSNR {psnr:.1f} dB"


class TestDecoderParity:
    def test_fresnel_zone_centers_match(self):
        """Zone-center snapping matches the reference FresnelZones."""
        sys.path.insert(0, str(REF))
        import torch
        from utils.fresnel_zones import FresnelZones as RefZones

        from fresnel_tpu.physics import FresnelZones

        ref = RefZones(num_zones=8)
        ours = FresnelZones(num_zones=8)
        d = np.linspace(0, 1, 101).astype(np.float32)
        ref_c = ref.get_zone_centers_for_depth(torch.from_numpy(d)).numpy()
        our_c = np.asarray(ours.zone_centers_for_depth(jnp.asarray(d)))
        np.testing.assert_allclose(our_c, ref_c, atol=1e-6)

    def test_physics_phase_matches(self):
        sys.path.insert(0, str(REF))
        import torch
        from utils.fresnel_zones import PhysicsFresnelZones as RefPhys

        from fresnel_tpu.physics import PhysicsFresnelZones

        ref = RefPhys(wavelength=0.05, focal_depth=0.5,
                      learnable_wavelength=False)
        ours = PhysicsFresnelZones(wavelength_init=0.05, focal_depth=0.5)
        d = np.linspace(0, 1, 64).astype(np.float32)
        with torch.no_grad():
            ref_p = ref.depth_to_phase(torch.from_numpy(d)).numpy()
        our_p = np.asarray(ours.depth_to_phase(jnp.asarray(d)))
        np.testing.assert_allclose(our_p, ref_p, rtol=1e-5)

    def test_rotation_6d_matches(self):
        sys.path.insert(0, str(REF / "models"))
        import torch
        from gaussian_decoder_models import rotation_6d_to_quaternion as ref_r6d

        from fresnel_tpu.core.gaussians import rotation_6d_to_quaternion

        rng = np.random.default_rng(1)
        r6 = rng.normal(size=(128, 6)).astype(np.float32)
        with torch.no_grad():
            ref_q = ref_r6d(torch.from_numpy(r6)).numpy()
        our_q = np.asarray(rotation_6d_to_quaternion(jnp.asarray(r6)))
        # Same rotation up to sign: |<q, q'>| == 1.
        dots = np.abs(np.sum(ref_q * our_q, axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-4)
