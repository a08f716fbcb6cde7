"""Decoder model tests (mirrors reference smoke-test strategy,
scripts/tests/test_gaussian_decoders.py, with dummy 37x37x384 features)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fresnel_tpu.models import DirectPatchDecoder, PhysicsDirectPatchDecoder
from fresnel_tpu.models.blocks import (
    fibonacci_spiral_positions,
    rotate_positions_for_pose,
    tensegrity_loss,
)


def dummy_inputs(b=2, grid=37, c=384, depth_res=64, seed=0):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.normal(size=(b, grid, grid, c)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(size=(b, depth_res, depth_res)).astype(np.float32))
    return feats, depth


class TestDirectPatchDecoder:
    def test_basic_forward(self):
        feats, depth = dummy_inputs()
        model = DirectPatchDecoder(gaussians_per_patch=4)
        params = model.init(jax.random.PRNGKey(0), feats, depth)
        out = model.apply(params, feats, depth)
        N = 37 * 37 * 4
        assert out["positions"].shape == (2, N, 3)
        assert out["scales"].shape == (2, N, 3)
        assert out["rotations"].shape == (2, N, 4)
        assert out["colors"].shape == (2, N, 3)
        assert out["opacities"].shape == (2, N)
        # Ranges
        assert float(out["colors"].min()) >= 0 and float(out["colors"].max()) <= 1
        assert float(out["opacities"].min()) >= 0 and float(out["opacities"].max()) <= 1
        assert float(out["scales"].min()) >= 1e-6 and float(out["scales"].max()) <= 2.0
        norms = jnp.linalg.norm(out["rotations"], axis=-1)
        np.testing.assert_allclose(norms, np.ones_like(norms), atol=1e-4)

    def test_feature_upsample_finer_lattice(self):
        # feature_upsample=2 decodes on a 74x74 lattice: 74*74*K Gaussians,
        # base-grid pitch halved, gradients flow into the refinement convs.
        feats, depth = dummy_inputs(b=1, grid=16)
        model = DirectPatchDecoder(gaussians_per_patch=2, feature_upsample=2)
        params = model.init(jax.random.PRNGKey(0), feats, depth)
        out = model.apply(params, feats, depth)
        N = 32 * 32 * 2
        assert out["positions"].shape == (1, N, 3)
        assert "upsample_conv" in params["params"]

        # Base lattice is genuinely finer: unique x cells ~= 32, not 16.
        xs = out["positions"][0, :, 0]
        assert len(np.unique(np.round(np.asarray(xs), 3))) > 16 * 2

        def loss(p):
            o = model.apply(p, feats, depth)
            return jnp.sum(o["positions"] ** 2) + jnp.sum(o["colors"])

        g = jax.grad(loss)(params)
        # refine is zero-init (T-045), so at init the gradient reaches its
        # own kernel first (upsample_conv unblocks once refine moves).
        gnorm = jnp.linalg.norm(
            g["params"]["upsample_refine"]["kernel"])
        assert float(gnorm) > 0

    def test_z_locked_to_depth(self):
        feats, _ = dummy_inputs()
        depth = jnp.full((2, 64, 64), 0.5, jnp.float32)
        model = DirectPatchDecoder(gaussians_per_patch=2)
        params = model.init(jax.random.PRNGKey(0), feats, depth)
        out = model.apply(params, feats, depth)
        z = out["positions"][..., 2]
        # base_z = depth_offset(-2) + 0.5 * (-2) = -3, exactly (Z locked).
        np.testing.assert_allclose(np.asarray(z), -3.0, atol=1e-5)

    def test_depth_z_scale_flips_parallax(self):
        # depth_z_scale=+2.0 (physically-correct mapping for corpus_v2
        # view-aware training) must place CLOSER content (larger
        # disparity) at LARGER z; the reference-parity -2.0 inverts it.
        feats, _ = dummy_inputs()
        depth = jnp.full((2, 64, 64), 0.5, jnp.float32)
        model = DirectPatchDecoder(gaussians_per_patch=2, depth_z_scale=2.0)
        params = model.init(jax.random.PRNGKey(0), feats, depth)
        z = model.apply(params, feats, depth)["positions"][..., 2]
        # base_z = depth_offset(-2) + 0.5 * (+2) = -1, exactly.
        np.testing.assert_allclose(np.asarray(z), -1.0, atol=1e-5)

    def test_z_offset_scale_unlocks_bounded_residual(self):
        feats, _ = dummy_inputs()
        depth = jnp.full((2, 64, 64), 0.5, jnp.float32)
        model = DirectPatchDecoder(gaussians_per_patch=2, z_offset_scale=0.3)
        params = model.init(jax.random.PRNGKey(0), feats, depth)
        z = np.asarray(model.apply(params, feats, depth)["positions"][..., 2])
        # Residual is tanh(raw_z) * 0.3 around the -3.0 depth lock: varies,
        # but bounded by the scale.
        assert z.std() > 0
        assert np.all(np.abs(z - (-3.0)) <= 0.3 + 1e-5)

    def test_progressive_k(self):
        feats, depth = dummy_inputs()
        model = DirectPatchDecoder(gaussians_per_patch=8)
        params = model.init(jax.random.PRNGKey(0), feats, depth)
        out1 = model.apply(params, feats, depth, num_gaussians=1)
        out8 = model.apply(params, feats, depth)
        assert out1["positions"].shape[1] == 37 * 37 * 1
        assert out8["positions"].shape[1] == 37 * 37 * 8
        # First-K predictions agree between the two calls.
        a = out1["colors"].reshape(2, 37, 37, 1, 3)
        b = out8["colors"].reshape(2, 37, 37, 8, 3)[:, :, :, :1]
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_phase_output(self):
        feats, depth = dummy_inputs()
        model = DirectPatchDecoder(gaussians_per_patch=2, use_phase_output=True)
        params = model.init(jax.random.PRNGKey(0), feats, depth)
        out = model.apply(params, feats, depth)
        assert out["phases"].shape == (2, 37 * 37 * 2, 3)
        assert float(out["phases"].min()) >= 0
        assert float(out["phases"].max()) <= 2 * np.pi + 1e-5

    def test_fresnel_zones_quantize_z(self):
        feats, _ = dummy_inputs()
        rngd = np.random.default_rng(1)
        depth = jnp.asarray(rngd.uniform(size=(2, 64, 64)).astype(np.float32))
        model = DirectPatchDecoder(gaussians_per_patch=1, use_fresnel_zones=True)
        params = model.init(jax.random.PRNGKey(0), feats, depth)
        out = model.apply(params, feats, depth)
        z = np.unique(np.round(np.asarray(out["positions"][..., 2]), 4))
        # Quantized depth -> at most 8 distinct z values.
        assert len(z) <= 8

    def test_edge_aware_and_pose(self):
        feats, depth = dummy_inputs()
        model = DirectPatchDecoder(
            gaussians_per_patch=2, use_edge_aware=True, use_pose_encoding=True)
        el = jnp.array([0.0, 0.3])
        az = jnp.array([0.0, 1.0])
        params = model.init(jax.random.PRNGKey(0), feats, depth,
                            elevation=el, azimuth=az)
        out = model.apply(params, feats, depth, elevation=el, azimuth=az)
        assert "edge_strength" in out
        assert out["edge_strength"].shape == (2, 37, 37, 1)

    def test_depth_fusion(self):
        feats, depth = dummy_inputs()
        model = DirectPatchDecoder(gaussians_per_patch=2, use_depth_fusion=True)
        params = model.init(jax.random.PRNGKey(0), feats, depth)
        out = model.apply(params, feats, depth)
        assert out["positions"].shape[1] == 37 * 37 * 2

    def test_gradients_flow(self):
        feats, depth = dummy_inputs(b=1)
        model = DirectPatchDecoder(gaussians_per_patch=2)
        params = model.init(jax.random.PRNGKey(0), feats, depth)

        def loss(p):
            out = model.apply(p, feats, depth)
            return (jnp.mean(out["colors"]) + jnp.mean(out["positions"]) +
                    jnp.mean(out["opacities"]))

        g = jax.grad(loss)(params)
        leaves = jax.tree.leaves(g)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
        assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


class TestPhysicsDecoder:
    def test_physics_phases(self):
        feats, depth = dummy_inputs()
        model = PhysicsDirectPatchDecoder(gaussians_per_patch=2)
        params = model.init(jax.random.PRNGKey(0), feats, depth)
        out = model.apply(params, feats, depth)
        assert out["phases"].shape == (2, 37 * 37 * 2)
        assert float(out["phases"].min()) >= 0
        assert float(out["phases"].max()) < 2 * np.pi + 1e-5

    def test_diffraction_placement_modulates_opacity(self):
        feats, depth = dummy_inputs()
        base = PhysicsDirectPatchDecoder(gaussians_per_patch=2)
        diff = PhysicsDirectPatchDecoder(gaussians_per_patch=2,
                                         use_diffraction_placement=True)
        params = base.init(jax.random.PRNGKey(0), feats, depth)
        o_base = base.apply(params, feats, depth)
        o_diff = diff.apply(params, feats, depth)
        # Same params, flag on -> fringe-modulated opacities, all else equal.
        assert not np.allclose(np.asarray(o_base["opacities"]),
                               np.asarray(o_diff["opacities"]))
        np.testing.assert_allclose(np.asarray(o_base["positions"]),
                                   np.asarray(o_diff["positions"]))
        op = np.asarray(o_diff["opacities"])
        assert np.isfinite(op).all() and op.min() >= 0 and op.max() <= 1


class TestGeometryHelpers:
    def test_fibonacci_spiral(self):
        x, y = fibonacci_spiral_positions(377)
        assert x.shape == (377,)
        r = jnp.sqrt(x * x + y * y)
        assert float(r.max()) <= 1.0 + 1e-5
        # Radial density should be ~uniform in area: median radius ~ sqrt(0.5).
        np.testing.assert_allclose(float(jnp.median(r)), np.sqrt(0.5), atol=0.05)

    def test_rotate_identity_pose(self):
        rng = np.random.default_rng(0)
        pos = jnp.asarray(rng.normal(size=(2, 5, 5, 3, 3)).astype(np.float32))
        out = rotate_positions_for_pose(pos, jnp.zeros(2), jnp.zeros(2))
        np.testing.assert_allclose(out, pos, atol=1e-6)

    def test_rotate_90deg_azimuth(self):
        pos = jnp.array([[[[[1.0, 0.0, 0.0]]]]])  # (1,1,1,1,3)
        out = rotate_positions_for_pose(
            pos, jnp.zeros(1), jnp.full((1,), np.pi / 2))
        # x=1 rotates to z=-1 under Ry(90°): x' = x cos + z sin = 0, z' = -x sin = -1
        np.testing.assert_allclose(out[0, 0, 0, 0], [0.0, 0.0, -1.0], atol=1e-6)

    def test_tensegrity_loss(self):
        rng = np.random.default_rng(2)
        pos = jnp.asarray(rng.normal(size=(2, 32, 3)).astype(np.float32))
        l = tensegrity_loss(pos)
        assert bool(jnp.isfinite(l)) and float(l) >= 0
        g = jax.grad(lambda p: tensegrity_loss(p))(pos)
        assert bool(jnp.all(jnp.isfinite(g)))
