"""End-to-end trainable encoder (--train_encoder) tests.

The encoder replaces frozen DINOv2 features with a jointly-trained
conv+attention module while preserving the (B, 37, 37, C) feature
contract (models/image_encoder.py; reference feature contract:
scripts/inference/dinov2_inference.py / decoder_inference.py:35-48).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fresnel_tpu.data.dataset import SyntheticGaussianDataset
from fresnel_tpu.models.image_encoder import ImageEncoder
from fresnel_tpu.train.config import (
    TrainingConfig, PhysicsConfig, HFGSConfig, HFTSConfig)
from fresnel_tpu.train.harness import Trainer


HCFG = HFGSConfig(use_phase_retrieval_loss=False, use_frequency_loss=False,
                  learnable_wavelengths=False)


def e2e_config(tmp_path, **kw):
    defaults = dict(
        experiment=2, epochs=1, batch_size=2, image_size=32,
        gaussians_per_patch=1, feature_size=5, output_dir=str(tmp_path),
        save_interval=1, lpips_weight=0.0, train_encoder=True,
        encoder_width=8)
    defaults.update(kw)
    return TrainingConfig(**defaults)


class TestImageEncoderModule:
    def test_feature_contract_shape(self):
        enc = ImageEncoder(feature_dim=16, grid=5, width=8, n_attn_blocks=1)
        img = jnp.zeros((2, 3, 32, 32))
        params = enc.init(jax.random.PRNGKey(0), img)
        out = enc.apply(params, img)
        assert out.shape == (2, 5, 5, 16)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_spatial_sensitivity(self):
        """Features must vary across the grid with image content (a
        constant map would be useless as a patch-feature stand-in)."""
        enc = ImageEncoder(feature_dim=16, grid=5, width=8, n_attn_blocks=1)
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.random((1, 3, 40, 40), np.float32))
        params = enc.init(jax.random.PRNGKey(0), img)
        out = np.asarray(enc.apply(params, img))
        patch_var = out.var(axis=(1, 2)).mean()
        assert patch_var > 1e-4


class TestEndToEndTraining:
    def test_one_epoch_trains_encoder(self, tmp_path):
        ds = SyntheticGaussianDataset(n_samples=4, image_size=32,
                                      n_gaussians=40, seed=1)
        cfg = e2e_config(tmp_path, epochs=2)
        trainer = Trainer(cfg, PhysicsConfig(), HCFG, HFTSConfig())
        first = next(iter(ds.batches(2, np.random.default_rng(0))))
        state0 = trainer.init_state(first)
        assert "encoder" in state0["params"]
        # Snapshot before fit(): the jitted step donates its input state.
        enc0 = jax.tree.map(np.asarray, state0["params"]["encoder"])

        state = trainer.fit(ds, state=state0)
        assert all(np.isfinite(v) for v in trainer.history["total"])
        # Encoder params must actually move (gradients flow end to end).
        moved = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            enc0, state["params"]["encoder"])
        assert max(jax.tree.leaves(moved)) > 1e-6

    def test_checkpoint_roundtrip_and_encode(self, tmp_path):
        ds = SyntheticGaussianDataset(n_samples=2, image_size=32,
                                      n_gaussians=40, seed=2)
        cfg = e2e_config(tmp_path)
        trainer = Trainer(cfg, PhysicsConfig(), HCFG, HFTSConfig())
        trainer.fit(ds)

        trainer2 = Trainer(cfg, PhysicsConfig(), HCFG, HFTSConfig())
        batch = next(iter(ds.batches(2, np.random.default_rng(0))))
        state, _ = trainer2.load_checkpoint(
            str(tmp_path / "final_model.msgpack"), batch)
        feats = trainer2.encode(state["params"], batch["image"])
        assert feats.shape == (2, cfg.feature_size, cfg.feature_size,
                               cfg.feature_dim)
        assert np.all(np.isfinite(np.asarray(feats)))

    def test_segmented_resume_keeps_encoder(self, tmp_path):
        """--stop_epoch/--resume segmentation (T-026 RAM workaround) must
        carry the encoder params across the boundary — the encoder
        campaign (cloud/round3_queue3.sh) runs this path for hours."""
        ds = SyntheticGaussianDataset(n_samples=4, image_size=32,
                                      n_gaussians=40, seed=4)
        cfg = e2e_config(tmp_path, epochs=2)
        trainer = Trainer(cfg, PhysicsConfig(), HCFG, HFTSConfig())
        trainer.fit(ds, stop_epoch=1)
        ckpt = tmp_path / "checkpoint_epoch1.msgpack"
        assert ckpt.exists()

        trainer2 = Trainer(cfg, PhysicsConfig(), HCFG, HFTSConfig())
        batch = next(iter(ds.batches(2, np.random.default_rng(0))))
        state2, ep = trainer2.load_checkpoint(str(ckpt), batch)
        assert "encoder" in state2["params"]
        trainer2.fit(ds, state=state2, start_epoch=ep + 1)
        assert (tmp_path / "final_model.msgpack").exists()

    def test_init_state_without_image_uses_zeros(self, tmp_path):
        """infer-time template batches may lack an image key."""
        cfg = e2e_config(tmp_path)
        trainer = Trainer(cfg, PhysicsConfig(), HCFG, HFTSConfig())
        batch = {"features": np.zeros((1, 5, 5, 384), np.float32),
                 "depth": np.zeros((1, 32, 32), np.float32)}
        state = trainer.init_state(batch)
        assert "encoder" in state["params"]

    def test_eval_cli_uses_trained_encoder(self, tmp_path):
        """`fresnel eval` on a --train_encoder checkpoint must source
        features from the checkpoint's own encoder (cli.py cmd_eval)."""
        from fresnel_tpu.cli import main as cli_main
        from fresnel_tpu.data.synthetic_corpus import generate_corpus
        import json

        data_dir = tmp_path / "corpus"
        generate_corpus(str(data_dir), n_images=2, image_size=64, seed=3)
        ds_dir = str(data_dir)

        from fresnel_tpu.data.dataset import ImageDataset
        ds = ImageDataset(ds_dir, image_size=32, use_augmentation=False)
        cfg = e2e_config(tmp_path, epochs=1, batch_size=2)
        trainer = Trainer(cfg, PhysicsConfig(), HCFG, HFTSConfig())
        trainer.fit(ds)

        out_json = tmp_path / "eval.json"
        rc = cli_main(["eval", str(tmp_path / "final_model.msgpack"),
                       "--data_dir", ds_dir, "--size", "32",
                       "--output_json", str(out_json)])
        assert rc == 0
        res = json.loads(out_json.read_text())
        assert np.isfinite(res["frontal_ssim"])

    def test_encode_raises_without_encoder(self, tmp_path):
        cfg = e2e_config(tmp_path, train_encoder=False)
        trainer = Trainer(cfg, PhysicsConfig(), HCFG, HFTSConfig())
        with pytest.raises(ValueError):
            trainer.encode({"model": {}}, np.zeros((1, 3, 32, 32)))
