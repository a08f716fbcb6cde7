"""Multi-device rendering + misc utility tests (8-virtual-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fresnel_tpu.core.camera import Camera
from fresnel_tpu.core.gaussians import GaussianCloud
from fresnel_tpu.parallel.mesh import get_mesh
from fresnel_tpu.render.tile import TileRendererConfig, render_tiled


@pytest.fixture(scope="module")
def mesh4():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    return get_mesh(4)


class TestBatchShardedRender:
    def test_matches_single_device(self, mesh4):
        from fresnel_tpu.parallel.render import render_batch_sharded

        clouds = [GaussianCloud.test_cloud(40, seed=s, z_offset=-2.0)
                  for s in range(4)]
        pos = jnp.stack([c.positions for c in clouds])
        sc = jnp.stack([c.scales for c in clouds])
        rot = jnp.stack([c.rotations for c in clouds])
        col = jnp.stack([c.colors for c in clouds])
        op = jnp.stack([c.opacities for c in clouds])
        cam = Camera.default_training(32)
        cfg = TileRendererConfig(max_per_tile=64)

        sharded = render_batch_sharded(pos, sc, rot, col, op, cam, mesh4,
                                       config=cfg)
        for b in range(4):
            ref = render_tiled(pos[b], sc[b], rot[b], col[b], op[b], cam,
                               config=cfg)
            np.testing.assert_allclose(np.asarray(sharded[b]),
                                       np.asarray(ref), atol=1e-5)


class TestGaussianShardedRender:
    def test_matches_single_device(self, mesh4):
        from fresnel_tpu.parallel.render import render_gaussian_sharded
        from fresnel_tpu.render.projection import (
            depth_sort_indices, project_gaussians)
        import dataclasses

        cloud = GaussianCloud.test_cloud(160, seed=7, spread=0.5,
                                         z_offset=-2.0)
        cam = Camera.default_training(32)
        # Capacity >= N so neither path truncates per-tile lists (capacity
        # overflow drops DIFFERENT Gaussians in slab vs global binning).
        cfg = TileRendererConfig(max_per_tile=256)

        # Pre-sort front-to-back so device shards are depth slabs.
        proj = project_gaussians(cloud.positions, cloud.scales,
                                 cloud.rotations, cam)
        proj = dataclasses.replace(
            proj, visible=proj.visible & (cloud.opacities > 0))
        order = depth_sort_indices(proj)
        pos = cloud.positions[order]
        sc = cloud.scales[order]
        rot = cloud.rotations[order]
        col = cloud.colors[order]
        op = cloud.opacities[order]

        out = render_gaussian_sharded(pos, sc, rot, col, op, cam, mesh4,
                                      config=cfg, background=(0.1, 0.2, 0.3))
        ref = render_tiled(pos, sc, rot, col, op, cam, config=cfg,
                           background=(0.1, 0.2, 0.3))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3)


class TestPixelShardedRender:
    def test_matches_single_device(self, mesh4):
        from fresnel_tpu.parallel.render import render_pixel_sharded

        cloud = GaussianCloud.test_cloud(100, seed=3, spread=0.5,
                                         z_offset=-2.0)
        cam = Camera.default_training(64)   # 4 devices -> 16-row bands
        cfg = TileRendererConfig(max_per_tile=128)
        out = render_pixel_sharded(cloud.positions, cloud.scales,
                                   cloud.rotations, cloud.colors,
                                   cloud.opacities, cam, mesh4, config=cfg,
                                   background=(0.1, 0.2, 0.3))
        ref = render_tiled(cloud.positions, cloud.scales, cloud.rotations,
                           cloud.colors, cloud.opacities, cam, config=cfg,
                           background=(0.1, 0.2, 0.3))
        assert out.shape == ref.shape == (3, 64, 64)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-3)

    def test_rejects_indivisible_height(self, mesh4):
        from fresnel_tpu.parallel.render import render_pixel_sharded
        cloud = GaussianCloud.test_cloud(10, z_offset=-2.0)
        cam = Camera.default_training(50)
        with pytest.raises(ValueError, match="not divisible"):
            render_pixel_sharded(cloud.positions, cloud.scales,
                                 cloud.rotations, cloud.colors,
                                 cloud.opacities, cam, mesh4)


class TestTensorParallel:
    def test_spec_inference_rules(self):
        from jax.sharding import PartitionSpec as P
        from fresnel_tpu.parallel.tp import infer_leaf_spec

        assert infer_leaf_spec((), 2) == P()                       # scalar
        assert infer_leaf_spec((128,), 2) == P()                   # too small
        assert infer_leaf_spec((4096, 2), 2, min_elems=1024) == \
            P("model", None)                                       # largest dim
        assert infer_leaf_spec((3, 4096), 2, min_elems=1024) == \
            P(None, "model")
        assert infer_leaf_spec((3, 4097), 2, min_elems=1024) == P()  # nothing divisible

    def test_tp_step_matches_replicated(self):
        """A GSPMD-partitioned grad step on a (data, model) mesh must equal
        the single-device result — placement only, no semantic change."""
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        from fresnel_tpu.parallel.mesh import get_mesh, shard_batch
        from fresnel_tpu.parallel.tp import shard_state, sharded_fraction

        rng = np.random.default_rng(0)
        params = {
            "w1": jnp.asarray(rng.normal(size=(64, 256)).astype(np.float32)
                              * 0.1),
            "b1": jnp.zeros((256,), jnp.float32),
            "w2": jnp.asarray(rng.normal(size=(256, 8)).astype(np.float32)
                              * 0.1),
        }
        x = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))

        def loss_fn(p, x):
            h = jnp.tanh(x @ p["w1"] + p["b1"])
            return jnp.mean((h @ p["w2"]) ** 2)

        step = jax.jit(jax.value_and_grad(loss_fn))
        ref_loss, ref_grads = step(params, x)

        mesh = get_mesh(4, axis_names=("data", "model"), shape=(2, 2))
        tp_params = shard_state(params, mesh, min_elems=1024)
        assert sharded_fraction(tp_params) > 0.9
        tp_x = shard_batch({"x": x}, mesh)["x"]
        tp_loss, tp_grads = step(tp_params, tp_x)

        np.testing.assert_allclose(float(tp_loss), float(ref_loss),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(tp_grads["w1"]),
                                   np.asarray(ref_grads["w1"]), atol=1e-5)


class TestQualityAware:
    def test_quality_mask_low_at_artifacts(self):
        from fresnel_tpu.losses.quality_aware import quality_mask

        depth = jnp.zeros((1, 16, 16)).at[0, 8, 8].set(1.0)  # spike artifact
        qm = quality_mask(depth, threshold=0.1)
        assert float(qm[0, 8, 8]) < 0.1       # artifact down-weighted
        assert float(qm[0, 2, 2]) > 0.6       # flat region trusted

    def test_schedule(self):
        from fresnel_tpu.losses.quality_aware import consistency_weight_schedule

        assert consistency_weight_schedule(0, 100) == 0.1
        assert consistency_weight_schedule(50, 100) == 0.3
        assert consistency_weight_schedule(90, 100) == 1.0

    def test_full_loss(self):
        from fresnel_tpu.losses.quality_aware import quality_aware_cvs_loss

        rng = np.random.default_rng(0)
        pred = jnp.asarray(rng.uniform(size=(1, 3, 16, 16)).astype(np.float32))
        tgt = jnp.asarray(rng.uniform(size=(1, 3, 16, 16)).astype(np.float32))
        d = jnp.asarray(rng.uniform(size=(1, 16, 16)).astype(np.float32))
        ld = quality_aware_cvs_loss(pred, tgt, target_depth=d, x0_ema=tgt,
                                    consistency_weight=0.5)
        for k in ["l1", "gradient", "consistency", "total"]:
            assert bool(jnp.isfinite(ld[k]))


class TestImageUtils:
    def test_ppm_roundtrip(self, tmp_path):
        from fresnel_tpu.utils.image import load_ppm, save_ppm

        rng = np.random.default_rng(0)
        img = rng.uniform(size=(8, 12, 3)).astype(np.float32)
        p = tmp_path / "t.ppm"
        save_ppm(p, img)
        back = load_ppm(p)
        np.testing.assert_allclose(back, img, atol=1 / 255 + 1e-6)

    def test_depth_colormap(self):
        from fresnel_tpu.utils.image import depth_colormap

        d = np.linspace(0, 1, 64).reshape(8, 8)
        c = depth_colormap(d)
        assert c.shape == (8, 8, 3)
        assert not np.allclose(c[0, 0], c[-1, -1])  # near != far color

    def test_resize(self):
        from fresnel_tpu.utils.image import resize

        img = np.random.default_rng(1).uniform(size=(32, 32, 3)).astype(np.float32)
        out = resize(img, 16, 16)
        assert out.shape == (16, 16, 3)
