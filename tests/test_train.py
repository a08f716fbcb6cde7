"""Training harness tests (tiny synthetic runs on the CPU backend)."""

import json
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fresnel_tpu.train.config import (
    TrainingConfig, PhysicsConfig, HFGSConfig, HFTSConfig)
from fresnel_tpu.train.harness import Trainer, gumbel_topk_indices
from fresnel_tpu.data.dataset import SyntheticGaussianDataset


@pytest.fixture(scope="module")
def tiny_dataset():
    return SyntheticGaussianDataset(
        n_samples=4, image_size=32, n_gaussians=40, seed=1)


def tiny_config(tmp_path, **kw):
    defaults = dict(
        experiment=2, epochs=1, batch_size=2, image_size=32,
        gaussians_per_patch=1, output_dir=str(tmp_path), save_interval=1,
        ssim_weight=0.5, lpips_weight=0.0, depth_weight=0.1)
    defaults.update(kw)
    return TrainingConfig(**defaults)


class TestGumbelTopK:
    def test_without_replacement(self):
        rng = jax.random.PRNGKey(0)
        w = jnp.ones(100)
        idx = gumbel_topk_indices(rng, w, 50)
        assert len(np.unique(np.asarray(idx))) == 50

    def test_importance_biased(self):
        rng = jax.random.PRNGKey(0)
        w = jnp.concatenate([jnp.full((50,), 100.0), jnp.full((50,), 0.01)])
        counts = 0
        for i in range(20):
            idx = gumbel_topk_indices(jax.random.fold_in(rng, i), w, 10)
            counts += int(jnp.sum(idx < 50))
        assert counts > 170  # overwhelmingly from the high-weight half


class TestTrainer:
    def test_one_epoch_decreases_or_finite(self, tiny_dataset, tmp_path):
        cfg = tiny_config(tmp_path, epochs=2)
        trainer = Trainer(cfg, PhysicsConfig(),
                          HFGSConfig(use_phase_retrieval_loss=False,
                                     use_frequency_loss=False,
                                     learnable_wavelengths=False),
                          HFTSConfig())
        trainer.fit(tiny_dataset)
        assert len(trainer.history["total"]) == 2
        assert all(np.isfinite(v) for v in trainer.history["total"])
        assert (tmp_path / "best_model.msgpack").exists()
        assert (tmp_path / "loss_history.json").exists()
        hist = json.loads((tmp_path / "loss_history.json").read_text())
        assert "rgb" in hist

    def test_native_finer_encoder_grid_trains(self, tiny_dataset, tmp_path):
        # --feature_size with --train_encoder: the encoder emits the finer
        # grid natively; pooled attention keeps it HBM-feasible.  One
        # epoch end-to-end + sidecar round-trip of both fields.
        cfg = tiny_config(tmp_path, epochs=1, train_encoder=True,
                          feature_size=16, encoder_attn_pool=2,
                          gaussians_per_patch=1)
        trainer = Trainer(cfg, PhysicsConfig(), HFGSConfig(
            use_phase_retrieval_loss=False, use_frequency_loss=False,
            learnable_wavelengths=False), HFTSConfig())
        rng = np.random.default_rng(0)
        batch = next(iter(tiny_dataset.batches(2, rng)))
        feats = trainer.encode(trainer.init_state(batch)["params"],
                               jnp.asarray(batch["image"]))
        assert feats.shape == (2, 16, 16, cfg.feature_dim)
        trainer.fit(tiny_dataset)
        assert np.isfinite(trainer.history["total"][0])
        meta = json.loads(
            (tmp_path / "final_model.msgpack.json").read_text())
        assert meta["config"]["feature_size"] == 16
        assert meta["config"]["encoder_attn_pool"] == 2

    def test_feature_upsample_trains(self, tiny_dataset, tmp_path):
        # Finer-lattice decoder (T-040 attack): one step end to end, and
        # the checkpoint sidecar round-trips the feature_upsample field.
        cfg = tiny_config(tmp_path, epochs=1, feature_upsample=2,
                          gaussians_per_patch=1)
        trainer = Trainer(cfg, PhysicsConfig(), HFGSConfig(
            use_phase_retrieval_loss=False, use_frequency_loss=False,
            learnable_wavelengths=False), HFTSConfig())
        trainer.fit(tiny_dataset)
        assert np.isfinite(trainer.history["total"][0])
        meta = json.loads(
            (tmp_path / "final_model.msgpack.json").read_text())
        assert meta["config"]["feature_upsample"] == 2

    def test_segmented_fit_resumes_schedule(self, tiny_dataset, tmp_path):
        """start_epoch/stop_epoch segments (T-026 OOM workaround): two
        segments must cover exactly the full epoch range, write a resume
        checkpoint at the boundary, and end with final_model."""
        cfg = tiny_config(tmp_path, epochs=4)
        hcfg = HFGSConfig(use_phase_retrieval_loss=False,
                          use_frequency_loss=False,
                          learnable_wavelengths=False)
        trainer = Trainer(cfg, PhysicsConfig(), hcfg, HFTSConfig())
        state = trainer.fit(tiny_dataset, stop_epoch=2)
        assert len(trainer.history["total"]) == 2
        assert (tmp_path / "checkpoint_epoch2.msgpack").exists()
        assert not (tmp_path / "final_model.msgpack").exists()

        trainer2 = Trainer(cfg, PhysicsConfig(), hcfg, HFTSConfig())
        batch = next(iter(tiny_dataset.batches(2, np.random.default_rng(0))))
        state2, ep = trainer2.load_checkpoint(
            str(tmp_path / "checkpoint_epoch2.msgpack"), batch)
        trainer2.fit(tiny_dataset, state=state2, start_epoch=ep + 1)
        assert len(trainer2.history["total"]) == 2      # epochs 2..3 only
        assert (tmp_path / "final_model.msgpack").exists()

    def test_distill_inits_depth_offset_at_teacher_mean(self, tiny_dataset,
                                                        tmp_path):
        """T-027: Adam cannot walk the global depth_offset scalar to the
        teacher consensus; fit() must start it there when distilling."""
        ds = tiny_dataset
        g = ds._samples[0].features.shape[0]
        rng = np.random.default_rng(0)
        for s in ds._samples:
            s.teacher_raw = rng.standard_normal(
                (g, g, 1, 16)).astype(np.float32) * 0.1
            s.teacher_do = np.float32(-0.5)
        cfg = tiny_config(tmp_path, epochs=1, distill_weight=1.0)
        trainer = Trainer(cfg, PhysicsConfig(), HFGSConfig(
            use_phase_retrieval_loss=False, use_frequency_loss=False,
            learnable_wavelengths=False), HFTSConfig())
        logs = []
        trainer.fit(ds, log_fn=logs.append)
        assert any("depth_offset initialized at teacher mean -0.5" in m
                   for m in logs)

    def test_explicit_depth_offset_init(self, tiny_dataset, tmp_path):
        cfg = tiny_config(tmp_path, epochs=1, depth_offset_init=-0.25)
        trainer = Trainer(cfg, PhysicsConfig(), HFGSConfig(
            use_phase_retrieval_loss=False, use_frequency_loss=False,
            learnable_wavelengths=False), HFTSConfig())
        logs = []
        state = trainer.fit(tiny_dataset, log_fn=logs.append)
        assert any("depth_offset initialized at -0.250" in m for m in logs)

    def test_constant_lr_schedule_flag(self, tiny_dataset, tmp_path):
        import optax

        cfg = tiny_config(tmp_path, epochs=1, lr_schedule="constant",
                          lr=3e-3)
        trainer = Trainer(cfg, PhysicsConfig(), HFGSConfig(
            use_phase_retrieval_loss=False, use_frequency_loss=False,
            learnable_wavelengths=False), HFTSConfig())
        trainer._make_optimizer(100)
        # A constant schedule is a bare float; cosine would be callable.
        trainer.fit(tiny_dataset)
        assert np.isfinite(trainer.history["total"][0])

    def test_checkpoint_roundtrip(self, tiny_dataset, tmp_path):
        cfg = tiny_config(tmp_path)
        trainer = Trainer(cfg, PhysicsConfig(),
                          HFGSConfig(learnable_wavelengths=True),
                          HFTSConfig())
        rng = np.random.default_rng(0)
        batch = next(iter(tiny_dataset.batches(2, rng)))
        state = trainer.init_state(batch)
        trainer.save_checkpoint(tmp_path / "ck.msgpack", state, 0)
        state2, epoch = trainer.load_checkpoint(tmp_path / "ck.msgpack", batch)
        assert epoch == 0
        # Learnable wavelengths are checkpointed (reference lost them).
        np.testing.assert_allclose(
            np.asarray(state["params"]["wavelengths_raw"]),
            np.asarray(state2["params"]["wavelengths_raw"]))
        l1 = jax.tree.leaves(state["params"])
        l2 = jax.tree.leaves(state2["params"])
        for a, b in zip(l1, l2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_thin_checkpoint_resume(self, tiny_dataset, tmp_path):
        """Thin (bf16 params-only) exports resume: params within bf16
        rounding, fresh optimizer state, epoch/step from the sidecar."""
        from fresnel_tpu.train.thin_ckpt import to_thin

        cfg = tiny_config(tmp_path)
        trainer = Trainer(cfg, PhysicsConfig(),
                          HFGSConfig(learnable_wavelengths=True),
                          HFTSConfig())
        rng = np.random.default_rng(0)
        batch = next(iter(tiny_dataset.batches(2, rng)))
        state = trainer.init_state(batch)
        state["step"] = jnp.asarray(123)
        trainer.save_checkpoint(tmp_path / "full.msgpack", state, 7)
        meta = to_thin(tmp_path / "full.msgpack", tmp_path / "thin.msgpack")
        assert meta["thin"] and meta["step"] == 123 and meta["epoch"] == 7
        # ~6x smaller: f32 params + 2 Adam moments -> bf16 params.
        full_sz = (tmp_path / "full.msgpack").stat().st_size
        thin_sz = (tmp_path / "thin.msgpack").stat().st_size
        assert thin_sz < full_sz / 4
        state2, epoch = trainer.load_checkpoint(tmp_path / "thin.msgpack",
                                                batch)
        assert epoch == 7 and int(state2["step"]) == 123
        for a, b in zip(jax.tree.leaves(state["params"]),
                        jax.tree.leaves(state2["params"])):
            a = np.asarray(a)
            np.testing.assert_allclose(
                a, np.asarray(b, a.dtype), rtol=1e-2, atol=1e-2)
        # The resumed state trains.
        trainer.fit(tiny_dataset, state=state2, start_epoch=epoch + 1)

    def test_learnable_boundary_emphasis_trains(self, tiny_dataset,
                                                tmp_path):
        # The emphasis vector must exist in params, receive gradient
        # through the boundary loss, and move off its ones init.
        cfg = tiny_config(tmp_path, epochs=1, use_fresnel_zones=True,
                          boundary_weight=0.5,
                          learnable_boundary_emphasis=True)
        trainer = Trainer(cfg, PhysicsConfig(), HFGSConfig(
            use_phase_retrieval_loss=False, use_frequency_loss=False,
            learnable_wavelengths=False), HFTSConfig())
        rng = np.random.default_rng(0)
        batch = next(iter(tiny_dataset.batches(2, rng)))
        state = trainer.init_state(batch)
        emph0 = np.asarray(state["params"]["boundary_emphasis"])
        np.testing.assert_allclose(emph0, 1.0)
        step = trainer.get_step(K=cfg.gaussians_per_patch,
                                stochastic_k=None)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        state2, ld = step(state, jb, jax.random.PRNGKey(0))
        assert "boundary" in ld
        emph1 = np.asarray(state2["params"]["boundary_emphasis"])
        assert not np.allclose(emph1, emph0)

    def test_missing_sidecar_raises(self, tiny_dataset, tmp_path,
                                    monkeypatch):
        # A resume without the .msgpack.json sidecar silently restarts LR
        # schedules at epoch 0 — unattended queues must fail loudly
        # (advisor r3), with an env opt-out for hand-exported weights.
        cfg = tiny_config(tmp_path)
        trainer = Trainer(cfg, PhysicsConfig(), HFGSConfig(
            use_phase_retrieval_loss=False, use_frequency_loss=False,
            learnable_wavelengths=False), HFTSConfig())
        rng = np.random.default_rng(0)
        batch = next(iter(tiny_dataset.batches(2, rng)))
        state = trainer.init_state(batch)
        trainer.save_checkpoint(tmp_path / "ck.msgpack", state, 3)
        (tmp_path / "ck.msgpack.json").unlink()
        with pytest.raises(FileNotFoundError, match="sidecar"):
            trainer.load_checkpoint(tmp_path / "ck.msgpack", batch)
        monkeypatch.setenv("FRESNEL_ALLOW_MISSING_SIDECAR", "1")
        _, epoch = trainer.load_checkpoint(tmp_path / "ck.msgpack", batch)
        assert epoch == 0

    def test_step_updates_params(self, tiny_dataset, tmp_path):
        cfg = tiny_config(tmp_path)
        trainer = Trainer(cfg, PhysicsConfig(),
                          HFGSConfig(use_phase_retrieval_loss=False,
                                     use_frequency_loss=False,
                                     learnable_wavelengths=False),
                          HFTSConfig())
        rng = np.random.default_rng(0)
        batch = next(iter(tiny_dataset.batches(2, rng)))
        jb = jax.tree.map(jnp.asarray, batch)
        state = trainer.init_state(batch)
        before = jax.tree.leaves(state["params"])[0].copy()
        step = trainer.get_step(1, None)
        state2, ld = step(state, jb, jax.random.PRNGKey(1))
        after = jax.tree.leaves(state2["params"])[0]
        assert float(jnp.max(jnp.abs(after - before))) > 0
        assert bool(jnp.isfinite(ld["total"]))

    def test_multi_pose_step(self, tiny_dataset, tmp_path):
        cfg = tiny_config(tmp_path, multi_pose_augmentation=True,
                          use_pose_encoding=True)
        trainer = Trainer(cfg, PhysicsConfig(),
                          HFGSConfig(use_phase_retrieval_loss=False,
                                     use_frequency_loss=False,
                                     learnable_wavelengths=False),
                          HFTSConfig())
        rng = np.random.default_rng(0)
        batch = next(iter(tiny_dataset.batches(2, rng)))
        jb = jax.tree.map(jnp.asarray, batch)
        state = trainer.init_state(batch)
        step = trainer.get_step(1, None)
        state2, ld = step(state, jb, jax.random.PRNGKey(1))
        assert bool(jnp.isfinite(ld["total"]))

    def test_stochastic_k_step(self, tiny_dataset, tmp_path):
        cfg = tiny_config(tmp_path)
        trainer = Trainer(cfg, PhysicsConfig(),
                          HFGSConfig(use_phase_retrieval_loss=False,
                                     use_frequency_loss=False,
                                     learnable_wavelengths=False),
                          HFTSConfig(stochastic_k=100))
        rng = np.random.default_rng(0)
        batch = next(iter(tiny_dataset.batches(2, rng)))
        jb = jax.tree.map(jnp.asarray, batch)
        state = trainer.init_state(batch)
        step = trainer.get_step(1, 100)
        state2, ld = step(state, jb, jax.random.PRNGKey(1))
        assert bool(jnp.isfinite(ld["total"]))


class TestDataParallel:
    def test_mesh_sharded_training_step(self, tiny_dataset, tmp_path):
        """Data-parallel step over the 8-virtual-device CPU mesh."""
        from fresnel_tpu.parallel.mesh import get_mesh, shard_batch, replicate
        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices")
        mesh = get_mesh(4)
        cfg = tiny_config(tmp_path, batch_size=4)
        trainer = Trainer(cfg, PhysicsConfig(),
                          HFGSConfig(use_phase_retrieval_loss=False,
                                     use_frequency_loss=False,
                                     learnable_wavelengths=False),
                          HFTSConfig())
        rng = np.random.default_rng(0)
        batch = next(iter(tiny_dataset.batches(4, rng)))
        state = trainer.init_state(batch)
        state = replicate(state, mesh)
        jb = shard_batch(jax.tree.map(jnp.asarray, batch), mesh)
        step = trainer.get_step(1, None)
        state2, ld = step(state, jb, jax.random.PRNGKey(0))
        assert bool(jnp.isfinite(ld["total"]))
        # Result equals the single-device step (same math, psum-reduced).
        state_s = trainer.init_state(batch)
        state2_s, ld_s = step(state_s, jax.tree.map(jnp.asarray, batch),
                              jax.random.PRNGKey(0))
        np.testing.assert_allclose(float(ld["total"]), float(ld_s["total"]),
                                   rtol=1e-4)


class TestCLI:
    def test_parser_flag_surface(self):
        from fresnel_tpu.train.train_gaussian_decoder import build_parser
        p = build_parser()
        args = p.parse_args([
            "--experiment", "2", "--use_fresnel_zones", "--use_edge_aware",
            "--use_phase_blending", "--fast_mode", "--use_qsr",
            "--stochastic_k", "128", "--pose_range_elevation", "-30", "45"])
        assert args.use_fresnel_zones and args.use_edge_aware
        assert args.use_phase_blending and args.fast_mode and args.use_qsr

    def test_qsr_expansion(self):
        from fresnel_tpu.train.train_gaussian_decoder import (
            build_parser, configs_from_args)
        args = build_parser().parse_args(["--use_qsr"])
        config, physics, hfgs, hfts = configs_from_args(args)
        assert config.use_phase_output
        assert physics.use_wave_rendering
        assert hfgs.use_phase_retrieval_loss

    def test_max_per_tile_threads_to_renderer(self):
        # The reference's training loop is uncapped (differentiable_
        # renderer.py:582-667); --max_per_tile raises our rasterizer's
        # per-tile capacity so occluded splats keep gradients early in
        # training.  Guard the flag -> config -> renderer plumbing.
        from fresnel_tpu.train.train_gaussian_decoder import (
            build_parser, configs_from_args)
        from fresnel_tpu.render.factory import select_training_renderer
        args = build_parser().parse_args(["--max_per_tile", "512"])
        config, physics, hfgs, hfts = configs_from_args(args)
        assert config.max_per_tile == 512
        render = select_training_renderer(config, physics, hfgs)
        from fresnel_tpu.render.tile import TileRendererConfig
        cfgs = [c.cell_contents for c in render.__closure__
                if isinstance(c.cell_contents, TileRendererConfig)]
        assert cfgs and cfgs[0].max_per_tile == 512

    def test_surface_init_umbrella(self):
        # --surface_init biases the decoder heads into the direct-fit basin
        # (T-023); explicit --scale_bias/--opacity_bias win over it.
        from fresnel_tpu.train.train_gaussian_decoder import (
            build_parser, configs_from_args)
        from fresnel_tpu.train.harness import build_decoder
        args = build_parser().parse_args(["--surface_init"])
        config, physics, *_ = configs_from_args(args)
        assert config.scale_bias == -2.6 and config.opacity_bias == 1.5
        model = build_decoder(config, physics)
        assert model.scale_bias == -2.6 and model.opacity_bias == 1.5
        args = build_parser().parse_args(
            ["--surface_init", "--scale_bias", "-1.0"])
        config, *_ = configs_from_args(args)
        assert config.scale_bias == -1.0 and config.opacity_bias == 1.5


class TestDistillation:
    """Raw-head distillation from fit_teacher.py sidecars (the TPU analogue
    of the reference's v2 distillation trainer, reference:
    scripts/training/train_direct_decoder.py)."""

    def _teacher_dataset(self, ds):
        # Attach synthetic teacher sidecars matching each sample's grid.
        g = ds._samples[0].features.shape[0]
        rng = np.random.default_rng(0)
        for s in ds._samples:
            s.teacher_raw = rng.standard_normal(
                (g, g, 1, 16)).astype(np.float32) * 0.1
            s.teacher_do = np.float32(0.0)
        return ds

    def test_batches_carry_teachers(self, tiny_dataset):
        ds = self._teacher_dataset(tiny_dataset)
        b = next(iter(ds.batches(2, np.random.default_rng(0))))
        assert b["teacher_raw"].shape[0] == 2
        assert b["teacher_raw"].shape[-1] == 16
        assert b["teacher_do"].shape == (2,)

    def test_distill_step_reduces_raw_gap(self, tiny_dataset, tmp_path):
        # With a huge distill weight, a few steps must move the decoder's
        # raw outputs toward the teacher and log a finite "distill" term.
        ds = self._teacher_dataset(tiny_dataset)
        cfg = tiny_config(tmp_path, epochs=1, distill_weight=50.0,
                          lr=1e-3)
        trainer = Trainer(cfg, PhysicsConfig(), HFGSConfig(
            use_phase_retrieval_loss=False, use_frequency_loss=False,
            learnable_wavelengths=False), HFTSConfig())
        nprng = np.random.default_rng(0)
        first = next(iter(ds.batches(2, nprng)))
        state = trainer.init_state(first)
        step = trainer.get_step(1, None)
        jb = {k: jnp.asarray(v) for k, v in first.items()}
        jb["distill_scale"] = jnp.float32(1.0)
        key = jax.random.PRNGKey(0)
        _, ld0 = step(state, jb, key)
        d0 = float(ld0["distill"])
        state = trainer.init_state(first)
        for i in range(8):
            state, ld = step(state, jb, jax.random.fold_in(key, i))
        assert np.isfinite(d0)
        assert float(ld["distill"]) < d0

    def test_distill_requires_teachers(self, tiny_dataset, tmp_path):
        cfg = tiny_config(tmp_path, distill_weight=1.0)
        trainer = Trainer(cfg, PhysicsConfig(), HFGSConfig(
            use_phase_retrieval_loss=False, use_frequency_loss=False,
            learnable_wavelengths=False), HFTSConfig())
        ds = SyntheticGaussianDataset(
            n_samples=4, image_size=32, n_gaussians=40, seed=2)
        with pytest.raises(ValueError, match="teacher"):
            trainer.fit(ds)

    def test_decoder_return_raw_matches_head_transform(self):
        # The decoder's outputs must equal head_transform applied to its
        # own raw values — the contract the distillation loss relies on.
        from fresnel_tpu.models.decoders import (
            DirectPatchDecoder, head_transform)
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.standard_normal((1, 5, 5, 8)), jnp.float32)
        depth = jnp.asarray(rng.random((1, 16, 16)), jnp.float32)
        m = DirectPatchDecoder(feature_dim=8, gaussians_per_patch=2,
                               hidden_dims=(16,), dropout=0.0)
        p = m.init(jax.random.PRNGKey(0), feats, depth)
        out = m.apply(p, feats, depth, return_raw=True)
        do = p["params"]["depth_offset"]
        ref = head_transform(out["raw"], depth, do)
        for k in ("positions", "scales", "rotations", "colors", "opacities"):
            np.testing.assert_allclose(out[k], ref[k], atol=1e-6)

    def test_fit_teacher_smoke(self):
        # Tiny decoder-space fit: runs, improves loss, returns the sidecar
        # contract (raw grid + fixed depth_offset + metrics).
        from fresnel_tpu.train.fit_teacher import fit_scene
        rng = np.random.default_rng(0)
        img = rng.random((3, 32, 32)).astype(np.float32)
        depth = rng.random((32, 32)).astype(np.float32)
        teacher, m = fit_scene(img, depth, steps=3, grid=4, K=2, res=32,
                               fixed_depth_offset=0.0)
        assert teacher["raw"].shape == (4, 4, 2, 16)
        assert teacher["depth_offset"] == 0.0
        assert np.isfinite(m["ssim"]) and np.isfinite(m["psnr"])

    def test_fit_teacher_exp4_spiral_space(self):
        # Exp-4 teachers are fit in FibonacciPatchDecoder spiral head space
        # (VERDICT r2 next #9 — the reference's best PSNR is an exp-4
        # number, so parity must be claimable on the same architecture).
        from fresnel_tpu.train.fit_teacher import fit_scene
        rng = np.random.default_rng(1)
        img = rng.random((3, 32, 32)).astype(np.float32)
        depth = rng.random((32, 32)).astype(np.float32)
        teacher, m = fit_scene(img, depth, steps=3, grid=21, K=1, res=32,
                               fixed_depth_offset=0.0, experiment=4)
        assert teacher["raw"].shape == (21, 1, 16)
        assert np.isfinite(m["ssim"]) and np.isfinite(m["psnr"])

    def test_fib_decoder_return_raw_matches_head_transform(self):
        # Same contract as exp-2: the fibonacci decoder's outputs must
        # equal fib_head_transform applied to its own raw values.
        from fresnel_tpu.models.fibonacci import (
            FibonacciPatchDecoder, fib_head_transform)
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.standard_normal((1, 5, 5, 8)), jnp.float32)
        depth = jnp.asarray(rng.random((1, 16, 16)), jnp.float32)
        m = FibonacciPatchDecoder(feature_dim=8, n_points=13,
                                  hidden_dims=(16,), dropout=0.0)
        p = m.init(jax.random.PRNGKey(0), feats, depth)
        out = m.apply(p, feats, depth, return_raw=True)
        do = p["params"]["depth_offset"]
        ref = fib_head_transform(out["raw"], depth, do)
        for k in ("positions", "scales", "rotations", "colors", "opacities"):
            np.testing.assert_allclose(out[k], ref[k], atol=1e-6)

    def test_exp4_distill_step_runs(self, tiny_dataset, tmp_path):
        # Exp-4 distillation end to end: spiral teachers (B, N, K, 16)
        # flow through the K-agnostic slice and produce a finite,
        # decreasing distill term.
        ds = tiny_dataset
        rng = np.random.default_rng(0)
        for s in ds._samples:
            s.teacher_raw = rng.standard_normal(
                (13, 1, 16)).astype(np.float32) * 0.1
            s.teacher_do = np.float32(0.0)
        cfg = tiny_config(tmp_path, epochs=1, distill_weight=50.0,
                          lr=1e-3, experiment=4, n_spiral_points=13)
        trainer = Trainer(cfg, PhysicsConfig(), HFGSConfig(
            use_phase_retrieval_loss=False, use_frequency_loss=False,
            learnable_wavelengths=False), HFTSConfig())
        nprng = np.random.default_rng(0)
        first = next(iter(ds.batches(2, nprng)))
        state = trainer.init_state(first)
        step = trainer.get_step(1, None)
        jb = {k: jnp.asarray(v) for k, v in first.items()}
        jb["distill_scale"] = jnp.float32(1.0)
        key = jax.random.PRNGKey(0)
        _, ld0 = step(state, jb, key)
        d0 = float(ld0["distill"])
        state = trainer.init_state(first)   # step donates its state arg
        for i in range(8):
            state, ld = step(state, jb, jax.random.fold_in(key, i))
        assert np.isfinite(d0)
        assert float(ld["distill"]) < d0

    def test_dataset_teacher_experiment_suffix(self, tmp_path):
        # teacher_experiment=4 picks up _teacher4.npz and ignores the
        # exp-2 sidecar (and vice versa).
        from PIL import Image

        from fresnel_tpu.data.dataset import ImageDataset

        img_path = tmp_path / "scene.png"
        Image.fromarray(np.full((32, 32, 3), 90, np.uint8)).save(img_path)
        rng = np.random.default_rng(0)
        np.savez(tmp_path / "scene_teacher.npz",
                 raw=rng.random((4, 4, 1, 16)).astype(np.float32),
                 depth_offset=np.float32(-2.0))
        np.savez(tmp_path / "scene_teacher4.npz",
                 raw=rng.random((13, 1, 16)).astype(np.float32),
                 depth_offset=np.float32(-1.0))
        ds2 = ImageDataset(str(tmp_path), image_size=32, feature_size=4,
                           feature_dim=8, use_augmentation=False,
                           write_cache=False)
        ds4 = ImageDataset(str(tmp_path), image_size=32, feature_size=4,
                           feature_dim=8, use_augmentation=False,
                           write_cache=False, teacher_experiment=4)
        assert ds2._samples[0].teacher_raw.shape == (4, 4, 1, 16)
        assert ds4._samples[0].teacher_raw.shape == (13, 1, 16)
        assert float(ds4._samples[0].teacher_do) == -1.0


class TestViewAware:
    """View-aware training on corpus_v2 GT orbit views (harness.py view
    loss block): one random non-frontal GT view per sample per step is
    rendered from the canonical cloud and scored against raytraced GT."""

    def _trainer(self, tmp_path, **kw):
        cfg = tiny_config(tmp_path, epochs=1, **kw)
        return Trainer(cfg, PhysicsConfig(), HFGSConfig(
            use_phase_retrieval_loss=False, use_frequency_loss=False,
            learnable_wavelengths=False), HFTSConfig())

    def _attach_views(self, ds, n_views=4, size=32, seed=0):
        rng = np.random.default_rng(seed)
        az = np.linspace(0.0, 360.0, n_views, endpoint=False).astype(
            np.float32)
        for s in ds._samples:
            s.views = rng.uniform(
                size=(n_views, size, size, 3)).astype(np.float32)
            s.view_azimuths_deg = az

    def test_batches_carry_views(self, tiny_dataset):
        self._attach_views(tiny_dataset)
        batch = next(iter(tiny_dataset.batches(2, np.random.default_rng(0))))
        assert batch["views"].shape == (2, 4, 3, 32, 32)
        assert batch["view_azimuths_deg"].shape == (4,)

    def test_view_loss_in_step(self, tiny_dataset, tmp_path):
        self._attach_views(tiny_dataset)
        trainer = self._trainer(tmp_path, view_weight=0.5,
                                depth_z_scale=2.0, z_offset_scale=0.2)
        batch = next(iter(tiny_dataset.batches(2, np.random.default_rng(0))))
        jb = trainer._device_batch(batch, np.random.default_rng(1))
        # Host-side view selection: the full (B, V, ...) stack never
        # crosses to the device, one non-frontal view per sample does.
        assert "views" not in jb
        assert jb["view_gt"].shape == (2, 3, 32, 32)
        assert jb["view_az_deg"].shape == (2,)
        assert np.all(np.asarray(jb["view_az_deg"]) > 0)  # frontal skipped
        state = trainer.init_state(jb)
        step = trainer.get_step(1, None)
        state, ld = step(state, jb, jax.random.PRNGKey(0))
        assert "view" in ld and np.isfinite(float(ld["view"]))
        assert np.isfinite(float(ld["total"]))
        # The view term is part of the total the gradient sees.
        assert float(ld["total"]) >= 0.5 * float(ld["view"]) - 1e-6

    def test_view_weight_zero_ignores_views(self, tiny_dataset, tmp_path):
        self._attach_views(tiny_dataset)
        trainer = self._trainer(tmp_path)          # view_weight=0 default
        batch = next(iter(tiny_dataset.batches(2, np.random.default_rng(0))))
        jb = trainer._device_batch(batch, np.random.default_rng(1))
        assert "views" not in jb and "view_gt" not in jb
        state = trainer.init_state(jb)
        step = trainer.get_step(1, None)
        _, ld = step(state, jb, jax.random.PRNGKey(0))
        assert "view" not in ld
