"""Pallas rasterizer kernel tests (interpret mode on CPU; real TPU runs are
exercised by bench.py and the verify drives)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fresnel_tpu.core.gaussians import GaussianCloud
from fresnel_tpu.core.camera import Camera
from fresnel_tpu.render.tile import render_tiled, TileRendererConfig

XLA_CFG = TileRendererConfig(max_per_tile=128)
PALLAS_CFG = TileRendererConfig(max_per_tile=128, backend="pallas",
                                pallas_interpret=True)


def args_of(cloud, cam):
    return (cloud.positions, cloud.scales, cloud.rotations,
            cloud.colors, cloud.opacities, cam)


class TestForwardParity:
    @pytest.mark.parametrize("n,res", [(1, 32), (80, 48), (300, 64)])
    def test_matches_xla_compositor(self, n, res):
        cloud = GaussianCloud.test_cloud(n, seed=n, spread=0.5, z_offset=-2.0)
        cam = Camera.default_training(res)
        ref = render_tiled(*args_of(cloud, cam), config=XLA_CFG)
        out = render_tiled(*args_of(cloud, cam), config=PALLAS_CFG)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

    def test_depth_parity(self):
        cloud = GaussianCloud.test_cloud(60, seed=3, spread=0.5, z_offset=-2.0)
        cam = Camera.default_training(48)
        ref_img, ref_d = render_tiled(*args_of(cloud, cam), config=XLA_CFG,
                                      return_depth=True)
        out_img, out_d = render_tiled(*args_of(cloud, cam), config=PALLAS_CFG,
                                      return_depth=True)
        np.testing.assert_allclose(np.asarray(out_d), np.asarray(ref_d),
                                   atol=1e-4)

    def test_background(self):
        cloud = GaussianCloud.test_cloud(10, seed=1, z_offset=+5.0)  # behind
        cam = Camera.default_training(32)
        out = render_tiled(*args_of(cloud, cam), config=PALLAS_CFG,
                           background=(0.2, 0.4, 0.6))
        np.testing.assert_allclose(
            np.asarray(out[0]), 0.2, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out[2]), 0.6, atol=1e-6)


class TestBackwardParity:
    def test_grads_match_xla(self):
        cloud = GaussianCloud.test_cloud(50, seed=7, spread=0.4, z_offset=-2.0)
        cam = Camera.default_training(32)
        target = jnp.zeros((3, 32, 32))

        def loss(cfg):
            def f(pos, sc, rot, col, op):
                img = render_tiled(pos, sc, rot, col, op, cam, config=cfg)
                return jnp.mean((img - target) ** 2)
            return f

        args = (cloud.positions, cloud.scales, cloud.rotations,
                cloud.colors, cloud.opacities)
        g_ref = jax.grad(loss(XLA_CFG), argnums=(0, 1, 2, 3, 4))(*args)
        g_out = jax.grad(loss(PALLAS_CFG), argnums=(0, 1, 2, 3, 4))(*args)
        names = ["positions", "scales", "rotations", "colors", "opacities"]
        for a, b, nm in zip(g_ref, g_out, names):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=3e-4, rtol=2e-2,
                err_msg=f"grad mismatch for {nm}")

    def test_grads_with_depth_loss(self):
        cloud = GaussianCloud.test_cloud(30, seed=9, spread=0.4, z_offset=-2.0)
        cam = Camera.default_training(32)

        def loss(cfg):
            def f(op):
                img, d = render_tiled(
                    cloud.positions, cloud.scales, cloud.rotations,
                    cloud.colors, op, cam, config=cfg, return_depth=True)
                return jnp.mean(d) + jnp.sum(img)
            return f

        g_ref = jax.grad(loss(XLA_CFG))(cloud.opacities)
        g_out = jax.grad(loss(PALLAS_CFG))(cloud.opacities)
        np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref),
                                   atol=3e-4, rtol=2e-2)

    def test_finite_difference(self):
        cloud = GaussianCloud.test_cloud(5, seed=11, spread=0.3, z_offset=-2.0)
        cam = Camera.default_training(32)

        def f(op):
            img = render_tiled(cloud.positions, cloud.scales, cloud.rotations,
                               cloud.colors, op, cam, config=PALLAS_CFG)
            return jnp.sum(img)

        op = cloud.opacities
        g = jax.grad(f)(op)
        eps = 1e-3
        for i in range(3):
            e = jnp.zeros_like(op).at[i].set(eps)
            fd = (f(op + e) - f(op - e)) / (2 * eps)
            np.testing.assert_allclose(float(g[i]), float(fd), rtol=2e-2,
                                       atol=1e-4)
