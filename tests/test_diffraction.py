"""Fresnel diffraction (C/S integrals, fringes) and D²NN diffractive layers.

Parity model: reference scripts/utils/fresnel_zones.py:828-1081 and
scripts/models/gaussian_decoder_models.py:1154-1415.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fresnel_tpu.physics import (
    FresnelDiffraction, DiffractiveLayer, MultiscaleDiffractiveLayer)


class TestFresnelDiffraction:
    def setup_method(self):
        self.fd = FresnelDiffraction(wavelength=0.05)

    def test_integrals_match_quadrature(self):
        # Independent fine-grained quadrature of C(w)=∫₀ʷ cos(πt²/2)dt.
        w = np.asarray([0.5, 1.0, 2.0, 4.0], np.float32)
        t = np.linspace(0, 1, 20001)
        for wi in w:
            tt = t * wi
            c_ref = np.trapezoid(np.cos(np.pi * tt**2 / 2), tt)
            s_ref = np.trapezoid(np.sin(np.pi * tt**2 / 2), tt)
            assert abs(float(self.fd.fresnel_C(jnp.float32(wi))) - c_ref) < 0.02
            assert abs(float(self.fd.fresnel_S(jnp.float32(wi))) - s_ref) < 0.02

    def test_intensity_profile(self):
        # Deep shadow (w→0 side of an opaque edge): I → (C+½)²+(S+½)² at w=0
        # is 0.5; far-field illuminated asymptote oscillates around ~2·(½+½)...
        # Known physics: I(0) = 0.5·I_unobstructed, first fringe OVERSHOOTS.
        i0 = float(self.fd.fresnel_intensity(jnp.float32(0.0)))
        assert abs(i0 - 0.5) < 0.05
        w = jnp.linspace(0.0, 5.0, 512)
        i = np.asarray(self.fd.fresnel_intensity(w))
        assert i.max() > 1.2          # first-fringe overshoot above unity
        assert np.isfinite(i).all()

    def test_fresnel_parameter(self):
        w = self.fd.compute_fresnel_parameter(
            jnp.float32(0.1), jnp.float32(2.0))
        assert abs(float(w) - 0.1 * np.sqrt(2 / (0.05 * 2.0))) < 1e-5
        # depth clamped at 0.1
        w0 = self.fd.compute_fresnel_parameter(jnp.float32(0.1),
                                               jnp.float32(0.0))
        wc = self.fd.compute_fresnel_parameter(jnp.float32(0.1),
                                               jnp.float32(0.1))
        assert float(w0) == float(wc)

    def test_fringe_positions_monotone(self):
        x = np.asarray(self.fd.get_fringe_positions(2.0))
        assert x.shape == (16,)
        assert (np.diff(x) > 0).all()
        # w_0 = sqrt(0.5) -> x_0 = sqrt(0.5)*sqrt(lambda*z/2)
        assert abs(x[0] - np.sqrt(0.5) * np.sqrt(0.05 * 2.0 / 2)) < 1e-5

    def test_edge_density_masked_and_jittable(self):
        depth = jnp.full((8, 8), 2.0)
        mask = jnp.zeros((8, 8)).at[4, 4].set(1.0)
        dist = jnp.ones((8, 8)) * 0.05
        dens = jax.jit(self.fd.compute_edge_density)(depth, mask, dist)
        assert dens.shape == (8, 8)
        assert float(dens[0, 0]) == 0.0
        assert float(dens[4, 4]) > 0.0


class TestDiffractiveLayer:
    def test_transmission_modulates_field(self):
        layer = DiffractiveLayer(height=8, width=8, num_channels=3)
        field = jnp.ones((3, 8, 8), jnp.complex64)
        params = layer.init(jax.random.PRNGKey(0), field)
        out = layer.apply(params, field)
        assert out.shape == (3, 8, 8)
        assert out.dtype == jnp.complex64
        # amplitude sigmoid(0.5)≈0.62, |t| must be < 1 (passive layer)
        assert float(jnp.abs(out).max()) < 1.0
        # batched path
        outb = layer.apply(params, field[None].repeat(2, 0))
        np.testing.assert_allclose(np.asarray(outb[0]), np.asarray(out),
                                   rtol=1e-6)

    def test_gradients_flow_to_amp_and_phase(self):
        layer = DiffractiveLayer(height=4, width=4)
        field = jnp.ones((3, 4, 4), jnp.complex64)
        params = layer.init(jax.random.PRNGKey(1), field)

        def loss(p):
            out = layer.apply(p, field)
            reg = layer.apply(p, method=layer.regularization_loss)
            return jnp.sum(jnp.abs(out) ** 2) + reg

        g = jax.grad(loss)(params)
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)

    def test_regularization_scalar_finite(self):
        layer = DiffractiveLayer(height=4, width=4)
        params = layer.init(jax.random.PRNGKey(2),
                            jnp.ones((3, 4, 4), jnp.complex64))
        reg = layer.apply(params, method=layer.regularization_loss)
        assert reg.shape == ()
        assert float(reg) >= 0.0 and np.isfinite(float(reg))


class TestMultiscaleDiffractiveLayer:
    def test_pyramid_shapes(self):
        layer = MultiscaleDiffractiveLayer(height=16, width=16, num_scales=3)
        field = jnp.ones((3, 16, 16), jnp.complex64)
        params = layer.init(jax.random.PRNGKey(0), field)
        out = layer.apply(params, field)
        assert out.shape == (3, 16, 16)
        scales = params["params"].keys()
        assert {"scale_0", "scale_1", "scale_2"} <= set(scales)
        # batched
        outb = layer.apply(params, field[None])
        assert outb.shape == (1, 3, 16, 16)
