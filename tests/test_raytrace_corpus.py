"""corpus_v2 raytracer: determinism, contracts, and — load-bearing —
camera alignment with the Gaussian rasterizer.

The whole point of corpus_v2 is that its orbit views are rendered from
the SAME cameras evaluation/novel_view_eval.py uses, so a reconstruction
placed at the true world position must land on the GT pixels from every
azimuth.  test_camera_alignment pins that: a splat rasterized through
Camera.from_pose at the raytraced sphere's world centre must have the
same image-space centroid as the raytraced sphere, at several azimuths.
"""

import numpy as np
import pytest

from fresnel_tpu.data.raytrace_corpus import (
    Primitive, Scene, Texture3D, generate_corpus, render_scene_views,
    render_view, sample_scene)


def _solid(color):
    c = np.asarray(color, np.float32)
    return Texture3D(kind="solid", c0=c, c1=c,
                     direction=np.array([1.0, 0, 0], np.float32),
                     scale=1.0, phase=0.0)


def _single_sphere_scene(center, radius=0.15):
    return Scene(
        primitives=[Primitive("sphere", np.asarray(center, np.float32),
                              np.array([radius], np.float32),
                              _solid([1.0, 1.0, 1.0]))],
        ground_y=-50.0,                      # far away: black background
        ground_tex=_solid([0.0, 0.0, 0.0]),
        wall_radius=40.0,
        wall_tex=_solid([0.0, 0.0, 0.0]),
        light_dir=np.array([0.0, 1.0, 0.0], np.float32),
        ambient=1.0,                          # unshaded: pure albedo
    )


def _centroid(img_hw):
    """Brightness centroid (x, y) of a (H, W) intensity image."""
    w = img_hw / max(img_hw.sum(), 1e-9)
    ys, xs = np.mgrid[0:img_hw.shape[0], 0:img_hw.shape[1]]
    return float((xs * w).sum()), float((ys * w).sum())


class TestRaytracer:
    def test_deterministic(self):
        _, v1, d1 = render_scene_views(seed=7, index=2, image_size=64)
        _, v2, d2 = render_scene_views(seed=7, index=2, image_size=64)
        np.testing.assert_array_equal(v1, v2)
        np.testing.assert_array_equal(d1, d2)

    def test_views_differ_across_azimuth(self):
        _, views, _ = render_scene_views(seed=3, index=0, image_size=64)
        assert np.abs(views[0] - views[4]).mean() > 0.01   # front vs back

    def test_depth_is_camera_distance(self):
        """Frontal depth at the sphere's centre pixel = distance to the
        near surface along the view ray (camera at (0,0,2), sphere at
        origin, radius .3 -> depth 1.7)."""
        scene = _single_sphere_scene([0.0, 0.0, 0.0], radius=0.3)
        rgb, depth = render_view(scene, azimuth_deg=0.0, image_size=64,
                                 supersample=1)
        assert abs(float(depth[32, 32]) - 1.7) < 0.02
        assert rgb[32, 32].mean() > 0.9

    def test_camera_alignment_with_rasterizer(self):
        """Raytraced sphere centroid == rasterized-splat centroid at the
        same world position, from several orbit azimuths (<2 px)."""
        import jax.numpy as jnp
        from fresnel_tpu.core.camera import Camera
        from fresnel_tpu.render.tile import render_tiled

        S = 128
        pos = np.array([0.35, 0.15, -0.2], np.float32)
        scene = _single_sphere_scene(pos, radius=0.12)
        for az in (0.0, 65.0, 150.0, 270.0):
            rgb, _ = render_view(scene, azimuth_deg=az, image_size=S,
                                 supersample=1)
            cx_rt, cy_rt = _centroid(rgb.mean(-1))

            cam = Camera.from_pose(0.0, np.radians(az), S, distance=2.0)
            img = render_tiled(
                jnp.asarray(pos)[None],
                jnp.full((1, 3), 0.05, jnp.float32),
                jnp.array([[1.0, 0, 0, 0]], jnp.float32),
                jnp.ones((1, 3), jnp.float32),
                jnp.ones((1,), jnp.float32),
                cam)
            cx_rs, cy_rs = _centroid(np.asarray(img).mean(0))
            assert abs(cx_rt - cx_rs) < 2.0 and abs(cy_rt - cy_rs) < 2.0, \
                f"az={az}: raytrace ({cx_rt:.1f},{cy_rt:.1f}) vs " \
                f"rasterize ({cx_rs:.1f},{cy_rs:.1f})"

    def test_world_space_texture_is_view_consistent(self):
        """A stripe pattern must rotate WITH the object: the texture seen
        at az and az+180 from opposite sides comes from the same 3-D
        field, so the two views cannot be pixelwise mirror-identical the
        way a screen-space texture would be."""
        rng = np.random.default_rng(0)
        scene = sample_scene(rng)
        v0, _ = render_view(scene, 0.0, image_size=64, supersample=1)
        v180, _ = render_view(scene, 180.0, image_size=64, supersample=1)
        mirrored = v180[:, ::-1]
        assert np.abs(v0 - mirrored).mean() > 0.005


class TestCorpusContract:
    @pytest.fixture(scope="class")
    def corpus(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("corpus_v2")
        generate_corpus(str(d), n_images=2, image_size=64, seed=11)
        return d

    def test_files(self, corpus):
        for i in range(2):
            assert (corpus / f"scene_{i:04d}.png").exists()
            assert (corpus / f"scene_{i:04d}_depth.bin").exists()
            assert (corpus / f"scene_{i:04d}_views.npz").exists()

    def test_views_npz(self, corpus):
        with np.load(corpus / "scene_0000_views.npz") as z:
            imgs = z["images"]
            az = z["azimuths_deg"]
        assert imgs.shape == (8, 64, 64, 3) and imgs.dtype == np.uint8
        np.testing.assert_allclose(az, np.arange(8) * 45.0)

    def test_frontal_png_matches_views0(self, corpus):
        from PIL import Image
        png = np.asarray(Image.open(corpus / "scene_0000.png"))
        with np.load(corpus / "scene_0000_views.npz") as z:
            v0 = z["images"][0]
        np.testing.assert_array_equal(png, v0)

    def test_depth_cache_contract(self, corpus):
        d = np.fromfile(corpus / "scene_0000_depth.bin", np.float32)
        side = int(round(len(d) ** 0.5))
        d = d.reshape(side, side)
        assert d.min() >= 0.0 and d.max() <= 1.0
        assert d.max() - d.min() > 0.5          # normalized min-max span

    def test_dataset_loads_views(self, corpus):
        from fresnel_tpu.data.dataset import ImageDataset
        ds = ImageDataset(str(corpus), image_size=64, use_augmentation=False,
                          write_cache=False)
        rng = np.random.default_rng(0)
        batch = next(ds.batches(2, rng))
        assert "views" in batch and batch["views"].shape == (2, 8, 3, 64, 64)
        assert "view_azimuths_deg" in batch
        # frontal view == training image when augmentation is off
        np.testing.assert_allclose(batch["views"][:, 0], batch["image"],
                                   atol=1 / 255 + 1e-6)
