"""Fresnel v2 (SLat distillation) and CVS tests (tiny configs, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fresnel_tpu.models.slat import (
    DirectSLatDecoder, MLPSLatDecoder, DirectStructurePredictor,
    PositionalEncoding3D, occupancy_to_coords)
from fresnel_tpu.losses.matching import (
    MatchingWeights, gaussian_matching_loss, occupancy_bce_loss,
    proximity_occupancy_targets)


def dummy_slat_inputs(b=2, n=64, patches=49, fdim=256, seed=0):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.normal(size=(b, patches, fdim)).astype(np.float32))
    coords = jnp.asarray(
        np.concatenate([np.zeros((b, n, 1)),
                        rng.integers(0, 64, (b, n, 3))], -1).astype(np.int32))
    mask = jnp.asarray(np.ones((b, n), bool))
    return feats, coords, mask


class TestSLatDecoder:
    def test_forward_shapes(self):
        feats, coords, mask = dummy_slat_inputs()
        model = DirectSLatDecoder(feature_dim=256, hidden_dim=128,
                                  num_layers=2, num_gaussians_per_voxel=4)
        params = model.init(jax.random.PRNGKey(0), feats, coords,
                            coord_mask=mask)
        out = model.apply(params, feats, coords, coord_mask=mask)
        assert out["gaussians"].shape == (2, 64 * 4, 14)
        assert out["occupancy_logits"].shape == (2, 64)
        g = out["gaussians"]
        # Activation ranges.
        assert float(jnp.max(jnp.abs(g[..., :3]))) <= 1.0
        assert float(jnp.min(g[..., 3:6])) >= 1e-4
        assert float(jnp.max(g[..., 13])) <= 1.0
        norms = jnp.linalg.norm(g[..., 6:10], axis=-1)
        np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-4)

    def test_occupancy_gating_static(self):
        feats, coords, mask = dummy_slat_inputs()
        model = DirectSLatDecoder(feature_dim=256, hidden_dim=128,
                                  num_layers=1, num_gaussians_per_voxel=2)
        params = model.init(jax.random.PRNGKey(0), feats, coords,
                            coord_mask=mask)
        out = model.apply(params, feats, coords, coord_mask=mask,
                          apply_occupancy_mask=True)
        assert out["gaussian_mask"].shape == (2, 64 * 2)
        assert out["gaussians"].shape == (2, 64 * 2, 14)  # static shape

    def test_positions_near_voxel_centers(self):
        feats, coords, mask = dummy_slat_inputs(seed=3)
        model = DirectSLatDecoder(feature_dim=256, hidden_dim=128,
                                  num_layers=1, num_gaussians_per_voxel=2)
        params = model.init(jax.random.PRNGKey(0), feats, coords,
                            coord_mask=mask)
        out = model.apply(params, feats, coords, coord_mask=mask)
        g = out["gaussians"].reshape(2, 64, 2, 14)
        centers = coords[..., 1:4].astype(jnp.float32) / 64 * 2 - 1
        d = jnp.abs(g[..., :3] - centers[:, :, None, :])
        # offsets bounded by |position_offset_scale| (init 0.5)
        assert float(jnp.max(d)) <= 0.5 + 1e-5

    def test_grad(self):
        feats, coords, mask = dummy_slat_inputs(b=1, n=32)
        model = DirectSLatDecoder(feature_dim=256, hidden_dim=64,
                                  num_layers=1, num_gaussians_per_voxel=2)
        params = model.init(jax.random.PRNGKey(0), feats, coords,
                            coord_mask=mask)
        g = jax.grad(lambda p: jnp.mean(model.apply(
            p, feats, coords, coord_mask=mask)["gaussians"]))(params)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(g))


class TestMLPSLat:
    def test_forward(self):
        feats, coords, mask = dummy_slat_inputs()
        model = MLPSLatDecoder(feature_dim=256, hidden_dim=64,
                               num_gaussians_per_voxel=2)
        params = model.init(jax.random.PRNGKey(0), feats, coords)
        out = model.apply(params, feats, coords)
        assert out["gaussians"].shape == (2, 128, 14)


class TestStructurePredictor:
    def test_occupancy_grid(self):
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.normal(size=(1, 49, 256)).astype(np.float32))
        model = DirectStructurePredictor(feature_dim=256, hidden_dim=32,
                                         resolution=16)
        params = model.init(jax.random.PRNGKey(0), feats)
        occ, logits = model.apply(params, feats)
        assert occ.shape == (1, 16, 16, 16)
        assert float(occ.min()) >= 0 and float(occ.max()) <= 1

    def test_occupancy_to_coords(self):
        occ = jnp.zeros((8, 8, 8)).at[1, 2, 3].set(0.9).at[4, 5, 6].set(0.8)
        coords, valid = occupancy_to_coords(occ, max_coords=4)
        assert coords.shape == (4, 4)
        got = {tuple(np.asarray(coords[i, 1:4])) for i in range(2)}
        assert (1, 2, 3) in got and (4, 5, 6) in got
        assert int(valid.sum()) == 2


class TestMatchingLoss:
    def make_clouds(self, seed=0, n=128):
        rng = np.random.default_rng(seed)
        g = np.zeros((1, n, 14), np.float32)
        g[..., :3] = rng.uniform(-1, 1, (1, n, 3))
        g[..., 3:6] = rng.uniform(0.01, 0.1, (1, n, 3))
        q = rng.normal(size=(1, n, 4))
        g[..., 6:10] = q / np.linalg.norm(q, axis=-1, keepdims=True)
        g[..., 10:13] = rng.uniform(size=(1, n, 3))
        g[..., 13] = rng.uniform(0.3, 1, (1, n))
        return jnp.asarray(g)

    def test_zero_for_identical(self):
        g = self.make_clouds()
        ld = gaussian_matching_loss(g, g)
        assert float(ld["total"]) < 1e-5

    def test_positive_for_different(self):
        a = self.make_clouds(seed=1)
        b = self.make_clouds(seed=2)
        ld = gaussian_matching_loss(a, b)
        assert float(ld["total"]) > 0.01
        for k in ["position", "scale", "rotation", "color", "opacity",
                  "coverage"]:
            assert k in ld

    def test_coverage_penalizes_sparse_predictions(self):
        """A prediction covering only half the targets must score worse than
        full coverage (the bug the bidirectional loss fixes)."""
        t = self.make_clouds(seed=3, n=128)
        # Full coverage: predictions = targets.
        full = gaussian_matching_loss(t, t)
        # Sparse: all predictions collapse onto the first target.
        sparse = jnp.broadcast_to(t[:, :1], t.shape)
        sp = gaussian_matching_loss(sparse, t)
        assert float(sp["coverage"]) > float(full["coverage"]) + 0.01

    def test_masked_invalid_ignored(self):
        a = self.make_clouds(seed=4)
        b = self.make_clouds(seed=4)
        # Append garbage rows masked off.
        pad = jnp.zeros((1, 32, 14))
        a2 = jnp.concatenate([a, pad], 1)
        mask = jnp.concatenate(
            [jnp.ones((1, 128), bool), jnp.zeros((1, 32), bool)], 1)
        ld = gaussian_matching_loss(a2, b, pred_mask=mask)
        assert float(ld["total"]) < 1e-5

    def test_grad(self):
        a = self.make_clouds(seed=5)
        b = self.make_clouds(seed=6)
        g = jax.grad(lambda x: gaussian_matching_loss(x, b)["total"])(a)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_occupancy_bce_and_targets(self):
        coords = jnp.asarray(
            np.concatenate([np.zeros((64, 1)),
                            np.random.default_rng(0).integers(0, 64, (64, 3))],
                           -1).astype(np.int32))
        gpos = coords[:8, 1:4].astype(jnp.float32) / 64 * 2 - 1
        occ = proximity_occupancy_targets(
            coords, gpos, jnp.ones(64, bool), jnp.ones(8, bool))
        assert occ.shape == (64,)
        assert float(occ[:8].min()) == 1.0  # voxels AT gaussian positions
        logits = jnp.where(occ > 0, 10.0, -10.0)
        assert float(occupancy_bce_loss(logits, occ)) < 1e-3


class TestCVS:
    def test_forward_and_generate(self):
        from fresnel_tpu.models.cvs import CVSConfig, ConsistencyViewSynthesizer
        cfg = CVSConfig(image_size=32, base_channels=32,
                        num_image_tokens=32)
        model = ConsistencyViewSynthesizer(cfg)
        rng = np.random.default_rng(0)
        B, S = 1, 32
        ii = jnp.asarray(rng.uniform(size=(B, 3, S, S)).astype(np.float32))
        ft = jnp.asarray(rng.normal(size=(B, 37, 37, 384)).astype(np.float32))
        Rr = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        tr = jnp.ones((B, 3))
        params = model.init(jax.random.PRNGKey(0), ii, ft, Rr, tr,
                            target_image=ii,
                            timestep=jnp.zeros((B,), jnp.int32),
                            noise=jnp.zeros((B, 3, S, S)))
        out = model.apply(params, ii, ft, Rr, tr, target_image=ii,
                          timestep=jnp.array([500]),
                          noise=jnp.asarray(
                              rng.normal(size=(B, 3, S, S)).astype(np.float32)))
        assert out["x0_pred"].shape == (B, 3, S, S)
        # One-step generation.
        gen = model.apply(params, ft, Rr, tr,
                          jnp.asarray(rng.normal(size=(B, 3, S, S)).astype(np.float32)),
                          1, method=model.generate)
        assert gen.shape == (B, 3, S, S)

    def test_predict_x0_no_rescale(self):
        """predict_x0(noisy, t) must equal the training path's x0_pred when
        fed the SAME noisy sample — the consistency branch's EMA target
        (reference consistency_view_synthesis.py:929-933 calls the unet
        directly; routing through add_noise rescaled x_t by
        sqrt_alphas_cumprod[t], collapsing high-t EMA targets — T-034)."""
        from fresnel_tpu.models.cvs import CVSConfig, ConsistencyViewSynthesizer
        cfg = CVSConfig(image_size=32, base_channels=32, num_image_tokens=32)
        model = ConsistencyViewSynthesizer(cfg)
        rng = np.random.default_rng(1)
        B, S = 1, 32
        ii = jnp.asarray(rng.uniform(size=(B, 3, S, S)).astype(np.float32))
        ft = jnp.asarray(rng.normal(size=(B, 37, 37, 384)).astype(np.float32))
        Rr = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        tr = jnp.ones((B, 3))
        t = jnp.array([900])          # high t: where the rescale bug bit
        noise = jnp.asarray(rng.normal(size=(B, 3, S, S)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), ii, ft, Rr, tr,
                            target_image=ii,
                            timestep=jnp.zeros((B,), jnp.int32),
                            noise=jnp.zeros((B, 3, S, S)))
        out = model.apply(params, ii, ft, Rr, tr, target_image=ii,
                          timestep=t, noise=noise)
        x0_direct = model.apply(params, ii, ft, Rr, tr, out["noisy"], t,
                                method=model.predict_x0)
        np.testing.assert_array_equal(np.asarray(x0_direct),
                                      np.asarray(out["x0_pred"]))

    def test_concat_input_view_conditioning(self):
        """concat_input_view=True feeds the input view to the U-Net:
        generation must depend on the input image and require it."""
        import pytest
        from fresnel_tpu.models.cvs import CVSConfig, ConsistencyViewSynthesizer
        cfg = CVSConfig(image_size=32, base_channels=32, num_image_tokens=32,
                        concat_input_view=True)
        model = ConsistencyViewSynthesizer(cfg)
        rng = np.random.default_rng(2)
        B, S = 1, 32
        ii = jnp.asarray(rng.uniform(size=(B, 3, S, S)).astype(np.float32))
        ft = jnp.asarray(rng.normal(size=(B, 37, 37, 384)).astype(np.float32))
        Rr = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
        tr = jnp.ones((B, 3))
        noise = jnp.asarray(rng.normal(size=(B, 3, S, S)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), ii, ft, Rr, tr,
                            target_image=ii,
                            timestep=jnp.zeros((B,), jnp.int32),
                            noise=jnp.zeros((B, 3, S, S)))
        g1 = model.apply(params, ft, Rr, tr, noise, 1,
                         method=model.generate, input_image=ii)
        g2 = model.apply(params, ft, Rr, tr, noise, 1,
                         method=model.generate, input_image=ii * 0.5)
        assert g1.shape == (B, 3, S, S)
        assert not np.allclose(np.asarray(g1), np.asarray(g2))
        with pytest.raises(ValueError, match="input view"):
            model.apply(params, ft, Rr, tr, noise, 1, method=model.generate)

    def test_cosine_schedule(self):
        from fresnel_tpu.models.cvs import cosine_beta_schedule
        betas = cosine_beta_schedule(1000)
        assert betas.shape == (1000,)
        assert float(betas.min()) >= 9e-5 and float(betas.max()) <= 0.99995
        ac = jnp.cumprod(1 - betas)
        assert float(ac[-1]) < 0.01  # nearly pure noise at T

    def test_relative_pose(self):
        from fresnel_tpu.models.cvs import get_relative_pose
        R = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
        t = jnp.zeros((1, 3))
        R2 = R
        t2 = jnp.array([[1.0, 0, 0]])
        R_rel, t_rel = get_relative_pose(R, t, R2, t2)
        np.testing.assert_allclose(np.asarray(R_rel[0]), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(t_rel[0]), [1, 0, 0], atol=1e-6)


class TestTeacherMultiviewDataset:
    def test_orbit_pairs_from_teacher_sidecars(self, tmp_path):
        """CVS multiview data from the quality campaign's teacher fits:
        a tiny fake corpus (png + depth cache + teacher sidecar) must
        yield geometry-consistent orbit pairs in the bootstrap-dataset
        sample contract (train_cvs.TeacherMultiviewDataset)."""
        from PIL import Image

        from fresnel_tpu.train.fit_teacher import init_raw
        from fresnel_tpu.core.camera import Camera
        from fresnel_tpu.train.train_cvs import TeacherMultiviewDataset

        rng = np.random.default_rng(0)
        S = 32
        for name in ("a", "b"):
            img = rng.uniform(0.2, 0.9, (S, S, 3)).astype(np.float32)
            depth = rng.uniform(0.1, 0.9, (S, S)).astype(np.float32)
            Image.fromarray((img * 255).astype(np.uint8)).save(
                tmp_path / f"{name}.png")
            depth.tofile(tmp_path / f"{name}_depth.bin")
            raw = init_raw(np.transpose(img, (2, 0, 1)), depth,
                           Camera.default_training(S), grid=5, K=1)
            np.savez(tmp_path / f"{name}_teacher.npz", raw=raw[0],
                     depth_offset=np.float32(-2.0))

        cache = str(tmp_path / "mv_cache.npz")
        ds = TeacherMultiviewDataset(str(tmp_path), image_size=S,
                                     views_per_scene=3, seed=1, cache=cache)
        assert len(ds) == 4                      # 2 scenes x 2 targets
        ds_cached = TeacherMultiviewDataset(str(tmp_path), image_size=S,
                                            cache=cache)
        assert len(ds_cached) == 4
        np.testing.assert_array_equal(ds_cached._samples[0]["target_image"],
                                      ds._samples[0]["target_image"])
        b = next(iter(ds.batches(2, np.random.default_rng(0))))
        assert b["input_image"].shape == (2, 3, S, S)
        assert b["target_image"].shape == (2, 3, S, S)
        assert b["target_depth"].shape == (2, S, S)
        assert b["R_rel"].shape == (2, 3, 3)
        assert b["features"].shape[0] == 2
        # Targets are genuinely novel views (pose moved the image).
        assert not np.allclose(b["input_image"], b["target_image"])
        # Rotations are valid (orthonormal) relative poses.
        RtR = np.einsum("bij,bik->bjk", b["R_rel"], b["R_rel"])
        np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (2, 3, 3)),
                                   atol=1e-5)

    def test_missing_teachers_raise(self, tmp_path):
        from fresnel_tpu.train.train_cvs import TeacherMultiviewDataset

        with pytest.raises(FileNotFoundError, match="teacher"):
            TeacherMultiviewDataset(str(tmp_path), image_size=32)


class TestGTMultiviewDataset:
    def test_pairs_from_views_sidecars(self, tmp_path):
        """Exact-GT CVS pairs from corpus_v2-style {scene}_views.npz:
        frontal input + non-frontal targets with valid relative poses,
        cache round-trip included (train_cvs.GTMultiviewDataset)."""
        from PIL import Image

        from fresnel_tpu.train.train_cvs import GTMultiviewDataset

        rng = np.random.default_rng(0)
        S = 32
        az = np.array([0.0, 90.0, 180.0, 270.0], np.float32)
        for name in ("a", "b"):
            views = rng.uniform(0.1, 0.9, (4, S, S, 3))
            Image.fromarray(
                (views[0] * 255).astype(np.uint8)).save(
                    tmp_path / f"{name}.png")
            np.savez(tmp_path / f"{name}_views.npz",
                     images=(views * 255).astype(np.uint8),
                     azimuths_deg=az)

        cache = str(tmp_path / "gt_cache.npz")
        ds = GTMultiviewDataset(str(tmp_path), image_size=S,
                                views_per_scene=3, seed=1, cache=cache)
        assert len(ds) == 4                      # 2 scenes x 2 targets
        ds_cached = GTMultiviewDataset(str(tmp_path), image_size=S,
                                       cache=cache)
        assert len(ds_cached) == 4
        np.testing.assert_array_equal(
            ds_cached._samples[0]["target_image"],
            ds._samples[0]["target_image"])
        b = next(iter(ds.batches(2, np.random.default_rng(0))))
        assert b["input_image"].shape == (2, 3, S, S)
        assert b["target_image"].shape == (2, 3, S, S)
        assert b["features"].shape == (2, 37, 37, 384)
        assert not np.allclose(b["input_image"], b["target_image"])
        RtR = np.einsum("bij,bik->bjk", b["R_rel"], b["R_rel"])
        np.testing.assert_allclose(
            RtR, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-5)

    def test_missing_views_raise(self, tmp_path):
        from fresnel_tpu.train.train_cvs import GTMultiviewDataset

        with pytest.raises(FileNotFoundError, match="views"):
            GTMultiviewDataset(str(tmp_path), image_size=32)
