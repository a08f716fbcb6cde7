"""SSIM / MS-SSIM numerical-contract tests.

Regression coverage for two real failures (experiments/README.md T-017):
  * On TPU the default bf16 conv precision destroyed the E[x^2] - E[x]^2
    cancellation and produced SSIM values like -7.4 / +2.4 on smooth
    images, silently corrupting every SSIM loss and once flipping a
    best-checkpoint selection (total loss -1.28).  Fixed with
    Precision.HIGHEST convs + variance relu; the bound tests here pin the
    contract on every backend.
  * ms_ssim NaN'd below 176 px: the 5th dyadic level of a 128 input is
    8 px, smaller than the 11-tap window -> empty VALID conv.  Fixed by
    dropping undersized levels and renormalizing weights.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fresnel_tpu.losses.ssim import ms_ssim, ssim, ssim_loss


class TestSSIMBounds:
    def test_smooth_images_stay_in_range(self):
        # Large mean + tiny variance is the worst case for the variance
        # cancellation — exactly where low-precision conv blows up.
        rng = np.random.default_rng(0)
        for _ in range(6):
            base = rng.uniform(0.5, 1.0)
            a = jnp.asarray(np.clip(
                base + 1e-3 * rng.standard_normal((1, 3, 64, 64)),
                0, 1).astype(np.float32))
            b = jnp.asarray(np.clip(
                base + 1e-3 * rng.standard_normal((1, 3, 64, 64)),
                0, 1).astype(np.float32))
            v = float(ssim(a, b))
            assert -1.0 <= v <= 1.0
            assert v > 0.9  # nearly identical smooth images

    def test_identity_and_opposite(self):
        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.uniform(size=(1, 3, 64, 64)).astype(np.float32))
        assert float(ssim(a, a)) == pytest.approx(1.0, abs=1e-5)
        assert float(ssim_loss(a, a)) == pytest.approx(0.0, abs=1e-5)
        assert float(ssim(a, 1.0 - a)) < 0.5

    def test_batched_matches_mean_of_singles(self):
        rng = np.random.default_rng(2)
        a = jnp.asarray(rng.uniform(size=(3, 3, 32, 32)).astype(np.float32))
        b = jnp.asarray(rng.uniform(size=(3, 3, 32, 32)).astype(np.float32))
        whole = float(ssim(a, b))
        singles = np.mean([float(ssim(a[i:i+1], b[i:i+1]))
                           for i in range(3)])
        assert whole == pytest.approx(singles, abs=1e-5)

    def test_gradient_finite(self):
        rng = np.random.default_rng(3)
        a = jnp.asarray(rng.uniform(size=(1, 3, 32, 32)).astype(np.float32))
        b = jnp.asarray(rng.uniform(size=(1, 3, 32, 32)).astype(np.float32))
        g = jax.grad(lambda x: ssim_loss(x, b))(a)
        assert bool(jnp.isfinite(g).all())


class TestMSSSIMSizes:
    @pytest.mark.parametrize("size", [256, 176, 128, 64, 32])
    def test_finite_and_self_one(self, size):
        rng = np.random.default_rng(size)
        a = jnp.asarray(rng.uniform(size=(1, 3, size, size))
                        .astype(np.float32))
        b = jnp.asarray(rng.uniform(size=(1, 3, size, size))
                        .astype(np.float32))
        v = float(ms_ssim(a, b))
        assert np.isfinite(v) and -1.0 <= v <= 1.0
        assert float(ms_ssim(a, a)) == pytest.approx(1.0, abs=1e-4)

    @pytest.mark.parametrize("size", [8, 16])
    def test_tiny_images_shrink_window(self, size):
        # Below the 11-tap window both ssim and ms_ssim must shrink the
        # window instead of producing an empty VALID conv -> NaN.
        rng = np.random.default_rng(size)
        a = jnp.asarray(rng.uniform(size=(1, 3, size, size))
                        .astype(np.float32))
        b = jnp.asarray(rng.uniform(size=(1, 3, size, size))
                        .astype(np.float32))
        for fn in (ssim, ms_ssim):
            v = float(fn(a, b))
            assert np.isfinite(v)
            assert float(fn(a, a)) == pytest.approx(1.0, abs=1e-4)

    def test_large_size_uses_all_levels(self):
        # At 512 all 5 standard levels are usable; sanity-check ordering:
        # similar images score higher than dissimilar ones.
        rng = np.random.default_rng(9)
        a = jnp.asarray(rng.uniform(size=(1, 1, 512, 512))
                        .astype(np.float32))
        near = jnp.clip(a + 0.05, 0, 1)
        far = jnp.asarray(rng.uniform(size=(1, 1, 512, 512))
                          .astype(np.float32))
        assert float(ms_ssim(a, near)) > float(ms_ssim(a, far))
