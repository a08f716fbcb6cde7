"""bf16 mixed-precision tests: cast utilities, gradient dtype/accuracy,
and amp-enabled train steps for all three trainers (CPU backend).

The reference's equivalent is torch.cuda.amp in train_direct_decoder.py;
on TPU bf16 needs no GradScaler (fp32 exponent range), so the contract
under test is: fp32 master params, bf16 network compute, fp32 gradients
close to the fp32-compute gradients.
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from fresnel_tpu.utils.precision import amp_apply, cast_floats, to_bf16


class TestCastFloats:
    def test_float_leaves_cast(self):
        tree = {"w": jnp.ones((2, 2), jnp.float32),
                "i": jnp.ones((2,), jnp.int32),
                "b": jnp.ones((2,), bool),
                "s": 3}
        out = to_bf16(tree)
        assert out["w"].dtype == jnp.bfloat16
        assert out["i"].dtype == jnp.int32
        assert out["b"].dtype == bool
        assert out["s"] == 3

    def test_roundtrip(self):
        x = {"a": jnp.asarray([1.5, -2.25], jnp.float32)}
        back = cast_floats(to_bf16(x), jnp.float32)
        # 1.5 / -2.25 are exactly representable in bf16.
        np.testing.assert_array_equal(np.asarray(back["a"]), [1.5, -2.25])


class TestAmpApply:
    def test_grads_are_f32_and_close(self):
        model = nn.Dense(16)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 32))
        params = model.init(jax.random.PRNGKey(1), x)

        def loss_amp(p):
            return jnp.mean(amp_apply(model.apply, p, x) ** 2)

        def loss_f32(p):
            return jnp.mean(model.apply(p, x) ** 2)

        g_amp = jax.grad(loss_amp)(params)
        g_f32 = jax.grad(loss_f32)(params)
        flat_amp = jax.tree.leaves(g_amp)
        flat_f32 = jax.tree.leaves(g_f32)
        for a, f in zip(flat_amp, flat_f32):
            assert a.dtype == jnp.float32  # master-precision gradients
            # Error normalized by the GRADIENT SCALE, not per element:
            # tiny individual entries legitimately lose all relative
            # precision in bf16 (7-bit mantissa).
            fa, ff = np.asarray(a), np.asarray(f)
            scale = max(float(np.max(np.abs(ff))), 1e-6)
            assert float(np.max(np.abs(fa - ff))) / scale < 0.05

    def test_disabled_is_identity(self):
        model = nn.Dense(4)
        x = jnp.ones((2, 8))
        params = model.init(jax.random.PRNGKey(0), x)
        y0 = model.apply(params, x)
        y1 = amp_apply(model.apply, params, x, use_amp=False)
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    def test_outputs_upcast(self):
        model = nn.Dense(4)
        x = jnp.ones((2, 8))
        params = model.init(jax.random.PRNGKey(0), x)
        y = amp_apply(model.apply, params, x)
        assert y.dtype == jnp.float32


class TestAmpTrainers:
    def test_harness_amp_step(self, tmp_path):
        from fresnel_tpu.data.dataset import SyntheticGaussianDataset
        from fresnel_tpu.train.config import (
            HFGSConfig, HFTSConfig, PhysicsConfig, TrainingConfig)
        from fresnel_tpu.train.harness import Trainer

        ds = SyntheticGaussianDataset(n_samples=2, image_size=32,
                                      n_gaussians=40, seed=1)
        cfg = TrainingConfig(
            experiment=2, epochs=1, batch_size=2, image_size=32,
            gaussians_per_patch=1, output_dir=str(tmp_path),
            lpips_weight=0.0, use_amp=True)
        trainer = Trainer(cfg, PhysicsConfig(),
                          HFGSConfig(use_phase_retrieval_loss=False,
                                     use_frequency_loss=False,
                                     learnable_wavelengths=False),
                          HFTSConfig())
        batch = next(iter(ds.batches(2, np.random.default_rng(0))))
        state = trainer.init_state(batch)
        step = trainer.get_step(K=1, stochastic_k=None)
        jb = jax.tree.map(jnp.asarray, batch)
        new_state, ld = step(state, jb, jax.random.PRNGKey(0))
        assert np.isfinite(float(ld["total"]))
        # Params remain fp32 master weights.
        for leaf in jax.tree.leaves(new_state["params"]):
            if jnp.issubdtype(leaf.dtype, jnp.floating):
                assert leaf.dtype == jnp.float32

    def test_v2_amp_step(self):
        from fresnel_tpu.data.trellis import SyntheticTrellisDataset
        from fresnel_tpu.train.train_direct_decoder import V2Config, V2Trainer

        cfg = V2Config(epochs=1, batch_size=2, hidden_dim=64, num_layers=1,
                       feature_dim=64, num_gaussians_per_voxel=2,
                       max_coords=32, max_gaussians=64, use_amp=True)
        ds = SyntheticTrellisDataset(n_samples=2, seed=0, feature_dim=64)
        trainer = V2Trainer(cfg)
        batch = next(iter(ds.batches(2, np.random.default_rng(0))))
        state = trainer.init_state(batch)
        step = trainer._build_step()
        jb = jax.tree.map(jnp.asarray, batch)
        new_state, ld = step(state, jb, jax.random.PRNGKey(0))
        assert np.isfinite(float(ld["total"]))

    def test_cvs_amp_step(self, tmp_path):
        from fresnel_tpu.train.train_cvs import (
            CVSTrainConfig, CVSTrainer, GaussianBootstrapDataset)

        cfg = CVSTrainConfig(epochs=1, batch_size=2, image_size=32,
                             base_channels=32, output_dir=str(tmp_path),
                             use_amp=True)
        ds = GaussianBootstrapDataset(n_scenes=1, views_per_scene=3,
                                      image_size=32, n_gaussians=20, seed=0)
        trainer = CVSTrainer(cfg)
        batch = next(iter(ds.batches(2, np.random.default_rng(0))))
        state = trainer.init_state(batch)
        step = trainer._build_step()
        jb = jax.tree.map(jnp.asarray, batch)
        new_state, ld = step(state, jb, jax.random.PRNGKey(0),
                             jnp.float32(1.0))
        assert np.isfinite(float(ld["total"]))
