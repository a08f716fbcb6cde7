"""Physics utilities and loss tests."""

import numpy as np
import jax
import jax.numpy as jnp

from fresnel_tpu.physics import (
    FresnelZones,
    PhysicsFresnelZones,
    MultiWavelengthPhysics,
    FresnelEdgeDetector,
)
from fresnel_tpu.losses import (
    ssim,
    ms_ssim,
    phase_retrieval_loss,
    frequency_domain_loss,
    wave_equation_loss,
    normalized_depth_l1,
    compute_losses,
    constrain_learnable_wavelengths,
    init_learnable_wavelengths,
    random_lpips,
)
from fresnel_tpu.train.config import TrainingConfig, PhysicsConfig, HFGSConfig, HFTSConfig


class TestFresnelZones:
    def setup_method(self):
        self.fz = FresnelZones(num_zones=8)

    def test_quantize(self):
        d = jnp.array([0.0, 0.05, 0.124, 0.126, 0.5, 0.99, 1.0])
        idx = self.fz.quantize_depth(d)
        assert int(idx[0]) == 0
        assert int(idx[2]) == 0 and int(idx[3]) == 1  # boundary at 0.125
        assert int(idx[-1]) == 7  # 1.0 clamps into the last zone

    def test_zone_centers_snap(self):
        d = jnp.array([0.1, 0.5, 0.9])
        centers = self.fz.zone_centers_for_depth(d)
        # Zone width 0.125: centers at 0.0625 + k*0.125.  Exactly-on-boundary
        # values (0.5) belong to the LOWER zone (reference bucketize parity).
        np.testing.assert_allclose(centers, [0.0625, 0.4375, 0.9375], atol=1e-6)

    def test_boundary_mask_peaks_at_boundaries(self):
        d = jnp.linspace(0.0, 1.0, 101)
        mask = self.fz.boundary_mask(d)
        # At exactly 0.125 (a boundary) mask should be near 1.
        at_boundary = float(mask[12])  # 0.12 close to boundary
        mid_zone = float(mask[6])      # 0.06 mid-zone
        assert at_boundary > mid_zone

    def test_boundary_emphasis_identity_and_weighting(self):
        # emphasis=ones reproduces the un-emphasized mask; raising one
        # boundary's emphasis raises the mask near THAT boundary only, and
        # gradients flow into the emphasis vector (it is the learnable
        # parameter the reference declares at fresnel_zones.py:94).
        d = jnp.linspace(0.0, 1.0, 101)
        ones = jnp.ones(self.fz.num_zones + 1)
        np.testing.assert_allclose(
            self.fz.boundary_mask(d, emphasis=ones),
            self.fz.boundary_mask(d), atol=1e-6)

        emph = ones.at[1].set(2.0)           # boundary at depth 0.125
        m0 = self.fz.boundary_mask(d)
        m1 = self.fz.boundary_mask(d, emphasis=emph)
        assert float(m1[12]) > float(m0[12])          # near 0.125: boosted
        assert abs(float(m1[50]) - float(m0[50])) < 1e-6  # near 0.5: same

        g = jax.grad(lambda e: jnp.sum(
            self.fz.boundary_mask(d, emphasis=e)))(ones)
        assert float(jnp.abs(g).max()) > 0

    def test_boundary_weight_range(self):
        d = jnp.linspace(0, 1, 64).reshape(8, 8)
        w = self.fz.boundary_weight(d, base_weight=1.0, boundary_boost=2.0)
        assert float(w.min()) >= 1.0 - 1e-5
        assert float(w.max()) <= 2.0 + 1e-5

    def test_adaptive_density_and_encoding(self):
        d = jnp.linspace(0, 1, 32)
        dens = self.fz.adaptive_density(d)
        assert dens.shape == (32,)
        enc = self.fz.zone_encoding(d)
        assert enc.shape == (32, 8)
        np.testing.assert_allclose(jnp.sum(enc, -1), np.ones(32), atol=1e-5)

    def test_zone_gradients(self):
        d = jnp.zeros((2, 16, 16)).at[:, :, 8:].set(1.0)
        g = self.fz.zone_gradients(d)
        assert g.shape == (2, 16, 16)
        assert float(g[0, 8, 8]) > float(g[0, 8, 2])  # edge at column 8


class TestPhysicsFresnelZones:
    def test_sqrt_boundaries(self):
        pz = PhysicsFresnelZones(num_zones=4, wavelength_init=0.05, focal_depth=0.5)
        b = pz.zone_boundaries()
        # r_n ∝ sqrt(n): normalized boundaries are sqrt(n/4).
        np.testing.assert_allclose(b, np.sqrt(np.arange(5) / 4.0), atol=1e-5)

    def test_phase_wave_equation(self):
        pz = PhysicsFresnelZones(wavelength_init=0.05, focal_depth=0.5)
        d = jnp.array([0.5, 0.55, 0.45])
        ph = pz.depth_to_phase(d)
        np.testing.assert_allclose(float(ph[0]), 0.0, atol=1e-6)
        np.testing.assert_allclose(float(ph[1]), 2 * np.pi / 0.05 * 0.05, rtol=1e-5)
        np.testing.assert_allclose(float(ph[1]), float(ph[2]), rtol=1e-5)

    def test_alternating_zone_phase(self):
        ph = PhysicsFresnelZones.zone_phase(jnp.array([0, 1, 2, 3]))
        np.testing.assert_allclose(ph, [0, np.pi, 0, np.pi], atol=1e-6)

    def test_wavelength_clamped(self):
        pz = PhysicsFresnelZones()
        ph_small = pz.depth_to_phase(jnp.array([0.7]), wavelength=1e-6)
        # Clamped to min 0.01, so phase = 2π/0.01 * 0.2.
        np.testing.assert_allclose(float(ph_small[0]), 2 * np.pi / 0.01 * 0.2, rtol=1e-4)


class TestMultiWavelength:
    def test_ratios(self):
        mw = MultiWavelengthPhysics(base_wavelength=0.05)
        wl = mw.init_wavelengths()
        np.testing.assert_allclose(wl[0] / wl[1], 700 / 550, rtol=1e-5)
        np.testing.assert_allclose(wl[2] / wl[1], 450 / 550, rtol=1e-5)

    def test_rgb_phases_ordered(self):
        mw = MultiWavelengthPhysics()
        ph = mw.depth_to_phase_rgb(jnp.array([0.8]))
        assert ph.shape == (1, 3)
        # Shorter wavelength (blue) accumulates more phase.
        assert float(ph[0, 2]) > float(ph[0, 1]) > float(ph[0, 0])


class TestEdgeDetector:
    def test_output_shape_range(self):
        model = FresnelEdgeDetector()
        d = jnp.zeros((2, 37, 37)).at[:, :, 18:].set(1.0)
        params = model.init(jax.random.PRNGKey(0), d)
        out = model.apply(params, d)
        assert out.shape == (2, 37, 37, 1)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


class TestSSIM:
    def test_identical_is_one(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(size=(2, 3, 64, 64)).astype(np.float32))
        np.testing.assert_allclose(float(ssim(img, img)), 1.0, atol=1e-5)

    def test_noise_lowers_ssim(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.uniform(size=(1, 3, 64, 64)).astype(np.float32))
        noisy = jnp.clip(img + 0.2 * jnp.asarray(
            rng.normal(size=img.shape).astype(np.float32)), 0, 1)
        s = float(ssim(img, noisy))
        assert 0.0 < s < 0.95

    def test_ms_ssim(self):
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.uniform(size=(1, 3, 192, 192)).astype(np.float32))
        np.testing.assert_allclose(float(ms_ssim(img, img)), 1.0, atol=1e-4)

    def test_differentiable(self):
        rng = np.random.default_rng(2)
        a = jnp.asarray(rng.uniform(size=(1, 3, 32, 32)).astype(np.float32))
        b = jnp.asarray(rng.uniform(size=(1, 3, 32, 32)).astype(np.float32))
        g = jax.grad(lambda x: 1.0 - ssim(x, b))(a)
        assert bool(jnp.all(jnp.isfinite(g)))


class TestPhysicsLosses:
    def setup_method(self):
        rng = np.random.default_rng(3)
        self.r = jnp.asarray(rng.uniform(size=(2, 3, 32, 32)).astype(np.float32))
        self.t = jnp.asarray(rng.uniform(size=(2, 3, 32, 32)).astype(np.float32))
        self.d = jnp.asarray(rng.uniform(size=(2, 32, 32)).astype(np.float32))

    def test_phase_retrieval_zero_when_equal(self):
        l0 = float(phase_retrieval_loss(self.t, self.t, self.d))
        l1 = float(phase_retrieval_loss(self.r, self.t, self.d))
        assert l0 < 1e-6
        assert l1 > l0

    def test_frequency_loss(self):
        assert float(frequency_domain_loss(self.t, self.t)) < 1e-6
        assert float(frequency_domain_loss(self.r, self.t)) > 0

    def test_wave_equation_finite_and_grad(self):
        l = wave_equation_loss(self.r, wavelength=0.05)
        assert bool(jnp.isfinite(l))
        g = jax.grad(lambda x: wave_equation_loss(x, 0.05))(self.r)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_normalized_depth_invariant_to_scale_shift(self):
        d2 = self.d * 5.0 + 3.0
        assert float(normalized_depth_l1(d2, self.d)) < 1e-5

    def test_wavelength_constraint(self):
        raw = init_learnable_wavelengths()
        wl = constrain_learnable_wavelengths(raw)
        np.testing.assert_allclose(wl, [0.0635, 0.05, 0.041], rtol=1e-4)


class TestComputeLosses:
    def test_full_aggregate(self):
        rng = np.random.default_rng(4)
        r = jnp.asarray(rng.uniform(size=(2, 3, 64, 64)).astype(np.float32))
        t = jnp.asarray(rng.uniform(size=(2, 3, 64, 64)).astype(np.float32))
        d = jnp.asarray(rng.uniform(size=(2, 64, 64)).astype(np.float32))
        cfg = TrainingConfig(boundary_weight=0.1)
        pcfg = PhysicsConfig(wave_equation_weight=0.01)
        hcfg = HFGSConfig()
        from fresnel_tpu.physics import FresnelZones
        total, ld = compute_losses(
            r, t, rendered_depth=d, target_depth=d, config=cfg,
            physics_config=pcfg, hfgs_config=hcfg,
            fresnel_zones=FresnelZones(num_zones=8))
        assert bool(jnp.isfinite(total))
        for k in ["rgb", "ssim", "depth", "boundary", "wave_eq",
                  "phase_retrieval", "frequency", "total"]:
            assert k in ld, f"missing {k}"

    def test_jittable_and_differentiable(self):
        cfg = TrainingConfig()
        t = jnp.zeros((1, 3, 32, 32))

        @jax.jit
        def f(r):
            total, _ = compute_losses(r, t, config=cfg)
            return total

        r = jnp.full((1, 3, 32, 32), 0.5)
        g = jax.grad(f)(r)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_lpips_random_proxy(self):
        apply_fn, params = random_lpips()
        rng = np.random.default_rng(5)
        a = jnp.asarray(rng.uniform(-1, 1, size=(1, 3, 64, 64)).astype(np.float32))
        b = jnp.asarray(rng.uniform(-1, 1, size=(1, 3, 64, 64)).astype(np.float32))
        d_same = float(apply_fn(params, a, a)[0])
        d_diff = float(apply_fn(params, a, b)[0])
        assert d_same < 1e-6
        assert d_diff > d_same


class TestHFTS:
    def test_progressive_schedule(self):
        h = HFTSConfig(progressive_schedule=True)
        assert h.get_gaussians_per_patch(0, 100) == 1
        assert h.get_gaussians_per_patch(30, 100) == 2
        assert h.get_gaussians_per_patch(60, 100) == 4
        assert h.get_gaussians_per_patch(90, 100, base_gpp=8) == 8

    def test_fast_mode(self):
        h = HFTSConfig(fast_mode=True)
        assert h.get_effective_train_resolution(256) == 64
        assert h.get_stochastic_k(5000) == 256
