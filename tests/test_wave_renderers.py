"""Wave-optics renderer tests: wave field, ASM propagation, Fourier/HFGS."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fresnel_tpu.core.gaussians import GaussianCloud
from fresnel_tpu.core.camera import Camera
from fresnel_tpu.render import (
    render_wave_field,
    render_asm_wave_field,
    render_fourier,
    render_simplified,
    AngularSpectrumPropagator,
    make_renderer,
    select_training_renderer,
)
from fresnel_tpu.train.config import TrainingConfig, PhysicsConfig, HFGSConfig


def cloud_and_cam(n=50, res=48, seed=0):
    cloud = GaussianCloud.test_cloud(n, seed=seed, spread=0.4, z_offset=-2.0)
    cam = Camera.default_training(res)
    return cloud, cam


def args_of(cloud, cam):
    return (cloud.positions, cloud.scales, cloud.rotations,
            cloud.colors, cloud.opacities, cam)


class TestWaveField:
    def test_scalar_phases(self):
        cloud, cam = cloud_and_cam()
        phases = jnp.zeros(50)
        img = render_wave_field(*args_of(cloud, cam), phases)
        assert img.shape == (3, 48, 48)
        assert float(img.max()) <= 1.0 and float(img.min()) >= 0.0
        assert float(img.max()) > 0.1  # something visible

    def test_per_rgb_phases(self):
        cloud, cam = cloud_and_cam()
        rng = np.random.default_rng(0)
        phases = jnp.asarray(rng.uniform(0, 2 * np.pi, size=(50, 3)).astype(np.float32))
        img = render_wave_field(*args_of(cloud, cam), phases)
        assert img.shape == (3, 48, 48)

    def test_destructive_interference(self):
        """Two identical coincident Gaussians with opposite phases cancel."""
        base = GaussianCloud(
            positions=jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]]),
            scales=jnp.full((2, 3), 0.3),
            rotations=jnp.array([[1.0, 0, 0, 0], [1.0, 0, 0, 0]]),
            colors=jnp.ones((2, 3)),
            opacities=jnp.array([0.8, 0.8]),
        )
        cam = Camera.default_training(32)
        img_opp = render_wave_field(*args_of(base, cam), jnp.array([0.0, np.pi]))
        img_same = render_wave_field(*args_of(base, cam), jnp.array([0.0, 0.0]))
        # Opposite phases: field cancels; same phase: bright.
        assert float(img_opp[:, 16, 16].max()) < 0.05
        assert float(img_same[:, 16, 16].max()) > 0.5

    def test_depth_output_and_grad(self):
        cloud, cam = cloud_and_cam(20, 32)
        phases = jnp.zeros(20)
        img, dep = render_wave_field(*args_of(cloud, cam), phases, return_depth=True)
        assert dep.shape == (32, 32)
        g = jax.grad(lambda c: jnp.sum(render_wave_field(
            cloud.positions, cloud.scales, cloud.rotations, c,
            cloud.opacities, cam, phases)))(cloud.colors)
        assert bool(jnp.all(jnp.isfinite(g)))


class TestASM:
    def test_propagator_zero_distance_identity(self):
        prop = AngularSpectrumPropagator(32, 32)
        rng = np.random.default_rng(1)
        field = jnp.asarray((rng.normal(size=(32, 32)) +
                             1j * rng.normal(size=(32, 32))).astype(np.complex64))
        out = prop.propagate(field, 0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(field), atol=1e-4)

    def test_propagation_preserves_bandlimited_energy(self):
        prop = AngularSpectrumPropagator(32, 32, band_limit=True)
        # Low-frequency field: energy preserved under propagation (unitary
        # within the propagating band).
        x = jnp.linspace(0, 2 * np.pi, 32)
        field = (jnp.sin(x)[None, :] * jnp.ones((32, 1))).astype(jnp.complex64)
        out = prop.propagate(field, 0.3)
        e_in = float(jnp.sum(jnp.abs(field) ** 2))
        e_out = float(jnp.sum(jnp.abs(out) ** 2))
        np.testing.assert_allclose(e_out, e_in, rtol=0.05)

    def test_asm_render(self):
        cloud, cam = cloud_and_cam(30, 32)
        phases = jnp.zeros(30)
        img = render_asm_wave_field(*args_of(cloud, cam), phases)
        assert img.shape == (3, 32, 32)
        assert bool(jnp.all(jnp.isfinite(img)))

    def test_asm_per_channel_wavelengths(self):
        cloud, cam = cloud_and_cam(30, 32)
        phases = jnp.zeros(30)
        img1 = render_asm_wave_field(*args_of(cloud, cam), phases,
                                     wavelengths_rgb=jnp.array([0.0635, 0.05, 0.041]))
        img2 = render_asm_wave_field(*args_of(cloud, cam), phases)
        assert img1.shape == img2.shape


class TestFourier:
    def test_spatial_mode(self):
        cloud, cam = cloud_and_cam(40, 48)
        img = render_fourier(*args_of(cloud, cam))
        assert img.shape == (3, 48, 48)
        assert float(img.max()) > 0.1

    def test_true_fourier_mode_matches_spatial_roughly(self):
        """The frequency-domain path with zero phases should produce a
        similar (additive-splat) image to the spatial path."""
        cloud, cam = cloud_and_cam(20, 32, seed=5)
        phases = jnp.zeros(20)
        img_sp = render_fourier(*args_of(cloud, cam), phases=phases)
        img_ft = render_fourier(*args_of(cloud, cam), phases=phases, mode="fourier")
        # Same structure: high correlation (not exact — spatial mode clips
        # splats at image borders while FFT wraps).
        a = np.asarray(img_sp).ravel()
        b = np.asarray(img_ft).ravel()
        corr = np.corrcoef(a, b)[0, 1]
        assert corr > 0.8, f"corr {corr}"

    def test_grad(self):
        cloud, cam = cloud_and_cam(15, 32)
        g = jax.grad(lambda o: jnp.sum(render_fourier(
            cloud.positions, cloud.scales, cloud.rotations, cloud.colors,
            o, cam)))(cloud.opacities)
        assert bool(jnp.all(jnp.isfinite(g)))


class TestSimplified:
    def test_render(self):
        cloud, cam = cloud_and_cam(30, 32)
        img, dep = render_simplified(*args_of(cloud, cam), return_depth=True)
        assert img.shape == (3, 32, 32)
        assert dep.shape == (32, 32)
        assert float(img.max()) > 0.1


class TestFactory:
    def test_all_names(self):
        cloud, cam = cloud_and_cam(10, 32)
        phases = jnp.zeros(10)
        for name in ["tile", "dense", "wave", "asm", "fourier",
                     "fourier_true", "simplified"]:
            r = make_renderer(name)
            img = r(*args_of(cloud, cam), phases=phases)
            assert img.shape == (3, 32, 32), name

    def test_selection_logic(self):
        cfg = TrainingConfig()
        sel = select_training_renderer(cfg, PhysicsConfig(), HFGSConfig())
        cloud, cam = cloud_and_cam(10, 32)
        img = sel(*args_of(cloud, cam))
        assert img.shape == (3, 32, 32)
        # physics wave rendering selection
        sel_wave = select_training_renderer(
            cfg, PhysicsConfig(use_wave_rendering=True), HFGSConfig())
        img = sel_wave(*args_of(cloud, cam), phases=jnp.zeros(10))
        assert img.shape == (3, 32, 32)
