"""SAAG geometry tests (mirrors reference tests/test_pointcloud.cpp plus
static-shape/masking properties unique to the TPU design)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fresnel_tpu.geometry import (
    AdaptiveDensityParams,
    SilhouetteWrapParams,
    SurfaceGaussianParams,
    VolumetricShellParams,
    pointcloud_from_depth,
    pointcloud_to_gaussians,
    quaternion_from_normal,
    surface_info,
    to_surface_gaussians,
)
from fresnel_tpu.core.gaussians import quaternion_to_rotation_matrix


def step_depth(h=32, w=32):
    """Near plane on the left, far on the right -> strong vertical edge."""
    d = np.full((h, w), 0.2, np.float32)
    d[:, w // 2 :] = 0.8
    return jnp.asarray(d)


def ramp_step_depth(h=32, w=32):
    """Smooth ramp with a sharp mid step: spreads confidence over (0, 1)
    while keeping a strong silhouette edge at the center column."""
    x = np.linspace(0.0, 1.0, w, dtype=np.float32)
    d = 0.3 + 0.35 * x[None, :].repeat(h, 0)
    d[:, w // 2 :] += 0.25
    return jnp.asarray(d)


class TestSurfaceInfo:
    def test_flat_depth_camera_facing(self):
        info = surface_info(jnp.full((16, 16), 0.5))
        np.testing.assert_allclose(
            info["normal"], np.broadcast_to([0, 0, 1.0], (16, 16, 3)), atol=1e-5)
        np.testing.assert_allclose(info["gradient_mag"], 0.0, atol=1e-6)

    def test_edge_gradient(self):
        info = surface_info(step_depth())
        mid = info["gradient_mag"][:, 15:17]
        assert float(jnp.max(mid)) > 0.1
        # Gradient direction points toward deeper region (+x).
        gd = info["gradient_dir"][8, 15]
        assert float(gd[0]) > 0.9

    def test_tilted_plane_normal(self):
        xs = jnp.linspace(0, 1, 32)
        depth = jnp.broadcast_to(xs[None, :], (32, 32))
        info = surface_info(depth, gradient_scale=50.0)
        # Depth increases with +x -> normal tilts toward -x.
        n = info["normal"][16, 16]
        assert float(n[0]) < -0.5
        assert float(n[2]) > 0.0


class TestQuaternionFromNormal:
    def test_rotates_z_to_normal(self):
        rng = np.random.default_rng(0)
        normals = rng.normal(size=(64, 3)).astype(np.float32)
        normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
        q = quaternion_from_normal(jnp.asarray(normals))
        R = quaternion_to_rotation_matrix(q)
        z_rotated = R @ jnp.array([0.0, 0.0, 1.0])
        np.testing.assert_allclose(np.asarray(z_rotated), normals, atol=1e-4)

    def test_degenerate_cases(self):
        q_up = quaternion_from_normal(jnp.array([0.0, 0.0, 1.0]))
        np.testing.assert_allclose(q_up, [1, 0, 0, 0], atol=1e-6)
        q_down = quaternion_from_normal(jnp.array([0.0, 0.0, -1.0]))
        R = quaternion_to_rotation_matrix(q_down)
        np.testing.assert_allclose(
            np.asarray(R @ jnp.array([0.0, 0.0, 1.0])), [0, 0, -1], atol=1e-5)


class TestPointCloud:
    def test_from_depth_shapes_and_unprojection(self):
        depth = step_depth()
        pc = pointcloud_from_depth(depth, depth_scale=2.0)
        assert pc.num_points == 32 * 32
        # Closer (smaller raw depth -> z large): left half has z = 2.0
        # (normalized 0 -> z = scale), so Z = -2.
        left = pc.positions.reshape(32, 32, 3)[16, 4]
        assert float(left[2]) == pytest.approx(-2.0, abs=1e-5)
        # Far half: normalized 1 -> z = 0 -> masked invalid.
        valid = pc.valid.reshape(32, 32)
        assert not bool(valid[16, 28])
        assert bool(valid[16, 4])

    def test_y_flip(self):
        depth = jnp.full((16, 16), 0.2)
        depth = depth.at[0, :].set(0.21)  # avoid degenerate range
        pc = pointcloud_from_depth(depth)
        pos = pc.positions.reshape(16, 16, 3)
        # Top rows (small pixel y) have larger world Y.
        assert float(pos[1, 8, 1]) > float(pos[14, 8, 1])

    def test_normalize(self):
        pc = pointcloud_from_depth(step_depth(), depth_scale=2.0).normalize(3.0)
        lo, hi = pc.bounds()
        assert float(jnp.max(hi - lo)) == pytest.approx(3.0, rel=1e-4)

    def test_to_gaussians(self):
        pc = pointcloud_from_depth(step_depth())
        g = pointcloud_to_gaussians(pc, point_size=0.02, opacity=0.8)
        assert g.num_gaussians == pc.num_points
        # Invalid points masked to zero opacity.
        assert float(jnp.min(g.opacities)) == 0.0


class TestSurfaceGaussians:
    def setup_method(self):
        self.depth = step_depth()
        self.pc = pointcloud_from_depth(self.depth, depth_scale=2.0)

    def test_block_layout_static_shape(self):
        g = to_surface_gaussians(self.pc, self.depth)
        n = self.pc.num_points
        expected = n * (1 + 1 + 3 + 3 + 4)  # base+back+walls+wrap+density
        assert g.num_gaussians == expected

    def test_disabled_stages_shrink_output(self):
        g = to_surface_gaussians(
            self.pc, self.depth,
            wrap_params=SilhouetteWrapParams(enabled=False),
            shell_params=VolumetricShellParams(enabled=False),
            density_params=AdaptiveDensityParams(enabled=False))
        assert g.num_gaussians == self.pc.num_points

    def test_saag_discs_are_anisotropic(self):
        g = to_surface_gaussians(
            self.pc, self.depth,
            params=SurfaceGaussianParams(aspect_ratio=5.0),
            wrap_params=SilhouetteWrapParams(enabled=False),
            shell_params=VolumetricShellParams(enabled=False),
            density_params=AdaptiveDensityParams(enabled=False))
        sc = np.asarray(g.scales)
        op = np.asarray(g.opacities)
        live = op > 0
        # Tangent/normal ratio = aspect_ratio (before edge shrink, which is
        # uniform across axes).
        ratio = sc[live, 0] / sc[live, 2]
        np.testing.assert_allclose(ratio, 5.0, rtol=1e-4)

    def test_shell_only_at_silhouettes(self):
        depth = ramp_step_depth()
        pc = pointcloud_from_depth(depth, depth_scale=2.0)
        n = pc.num_points
        g = to_surface_gaussians(
            pc, depth,
            wrap_params=SilhouetteWrapParams(enabled=False),
            density_params=AdaptiveDensityParams(enabled=False))
        back_op = np.asarray(g.opacities[n : 2 * n]).reshape(32, 32)
        # Back shell active near the center edge column, inactive far away.
        assert back_op[16, 14] > 0 or back_op[16, 15] > 0
        assert back_op[16, 4] == 0.0

    def test_edges_shrink_scales(self):
        n = self.pc.num_points
        g = to_surface_gaussians(
            self.pc, self.depth,
            wrap_params=SilhouetteWrapParams(enabled=False),
            shell_params=VolumetricShellParams(enabled=False),
            density_params=AdaptiveDensityParams(enabled=False))
        sc = np.asarray(g.scales).reshape(32, 32, 3)
        op = np.asarray(g.opacities).reshape(32, 32)
        # Edge column Gaussians are smaller than flat-region ones (same
        # confidence row).
        if op[16, 15] > 0 and op[16, 4] > 0:
            assert sc[16, 15, 0] < sc[16, 4, 0]

    def test_density_deterministic(self):
        g1 = to_surface_gaussians(self.pc, self.depth)
        g2 = to_surface_gaussians(self.pc, self.depth)
        np.testing.assert_allclose(np.asarray(g1.positions),
                                   np.asarray(g2.positions))

    def test_jit_compatible(self):
        f = jax.jit(lambda pc, d: to_surface_gaussians(pc, d))
        g = f(self.pc, self.depth)
        assert bool(jnp.all(jnp.isfinite(g.positions)))

    def test_end_to_end_render(self):
        """image -> depth -> cloud -> SAAG -> render (reference
        tests/test_pointcloud.cpp:125-230 end-to-end check)."""
        from fresnel_tpu.core.camera import Camera
        from fresnel_tpu.render.tile import render_tiled, TileRendererConfig

        depth = ramp_step_depth()
        pc = pointcloud_from_depth(depth, depth_scale=2.0).normalize(3.0)
        g = to_surface_gaussians(
            pc, depth,
            params=SurfaceGaussianParams(base_size=0.05),
            opacity=0.9)
        cam = Camera.look_at(eye=(0, 0, 5), target=(0, 0, 0), render_size=64)
        img = render_tiled(g.positions, g.scales, g.rotations, g.colors,
                           g.opacities, cam,
                           config=TileRendererConfig(max_per_tile=512))
        assert float(jnp.max(img)) > 0.1  # visible content
        assert bool(jnp.all(jnp.isfinite(img)))


class TestFeatureGuidedSAAG:
    def test_neutral_modulations_match_plain(self):
        import jax.numpy as jnp
        from fresnel_tpu.geometry.saag import feature_guided_surface_gaussians

        depth = ramp_step_depth()
        pc = pointcloud_from_depth(depth, depth_scale=2.0)
        neutral = {
            "base_size_mult": jnp.ones((37, 37)),
            "aspect_ratio_mult": jnp.ones((37, 37)),
            "edge_threshold_add": jnp.zeros((37, 37)),
            "edge_shrink_mult": jnp.ones((37, 37)),
            "normal_strength_mult": jnp.ones((37, 37)),
            "opacity_mult": jnp.ones((37, 37)),
        }
        g1 = feature_guided_surface_gaussians(pc, depth, neutral)
        g2 = to_surface_gaussians(pc, depth)
        np.testing.assert_allclose(np.asarray(g1.positions),
                                   np.asarray(g2.positions))
        np.testing.assert_allclose(np.asarray(g1.opacities),
                                   np.asarray(g2.opacities))

    def test_spatial_modulation_applies(self):
        import jax.numpy as jnp
        from fresnel_tpu.geometry.saag import feature_guided_surface_gaussians

        depth = ramp_step_depth()
        pc = pointcloud_from_depth(depth, depth_scale=2.0)
        mods = {
            "base_size_mult": jnp.full((37, 37), 1.5),
            "aspect_ratio_mult": jnp.ones((37, 37)),
            "edge_threshold_add": jnp.zeros((37, 37)),
            "edge_shrink_mult": jnp.ones((37, 37)),
            "normal_strength_mult": jnp.ones((37, 37)),
            "opacity_mult": jnp.full((37, 37), 0.5),
        }
        g1 = feature_guided_surface_gaussians(pc, depth, mods)
        g2 = to_surface_gaussians(pc, depth)
        live = np.asarray(g2.opacities) > 0
        # 1.5x base size and 0.5x opacity applied everywhere.
        np.testing.assert_allclose(
            np.asarray(g1.scales)[live], np.asarray(g2.scales)[live] * 1.5,
            rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g1.opacities)[live],
            np.asarray(g2.opacities)[live] * 0.5, rtol=1e-5)
