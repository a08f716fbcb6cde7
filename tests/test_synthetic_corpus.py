"""Synthetic photo-like corpus generator (fresnel_tpu/data/synthetic_corpus.py)."""

import numpy as np

from fresnel_tpu.data.synthetic_corpus import generate_corpus, render_scene


class TestRenderScene:
    def test_shapes_and_ranges(self):
        rgb, disp = render_scene(3, image_size=64)
        assert rgb.shape == (64, 64, 3) and disp.shape == (64, 64)
        assert rgb.dtype == np.float32 and disp.dtype == np.float32
        assert 0.0 <= rgb.min() and rgb.max() <= 1.0
        assert disp.min() == 0.0 and disp.max() == 1.0

    def test_deterministic(self):
        a = render_scene(11, image_size=64)
        b = render_scene(11, image_size=64)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])

    def test_scenes_differ_and_have_content(self):
        rgbs = [render_scene(s, image_size=64)[0] for s in range(4)]
        # Distinct scenes, non-trivial brightness and variation.
        for i in range(1, 4):
            assert np.abs(rgbs[0] - rgbs[i]).mean() > 0.02
        for r in rgbs:
            assert 0.1 < r.mean() < 0.9 and r.std() > 0.05

    def test_depth_has_structure(self):
        # Disparity must contain both near (ground/objects) and far (wall)
        # regions — not a constant map.
        _, disp = render_scene(5, image_size=64)
        assert disp.std() > 0.1


class TestGenerateCorpus:
    def test_writes_images_and_depth_caches(self, tmp_path):
        generate_corpus(str(tmp_path), n_images=2, image_size=32,
                        depth_size=32, seed=9, prefix="t")
        pngs = sorted(tmp_path.glob("*.png"))
        bins = sorted(tmp_path.glob("*_depth.bin"))
        assert len(pngs) == 2 and len(bins) == 2
        d = np.fromfile(bins[0], np.float32)
        assert d.size == 32 * 32 and np.isfinite(d).all()

    def test_dataset_consumes_ground_truth_depth(self, tmp_path):
        # ImageDataset must pick up the written cache, not the fallback.
        generate_corpus(str(tmp_path), n_images=1, image_size=32,
                        depth_size=32, seed=4, prefix="t")
        from fresnel_tpu.data.dataset import ImageDataset

        ds = ImageDataset(str(tmp_path), image_size=32, write_cache=False)
        cached = np.fromfile(tmp_path / "t_0000_depth.bin",
                             np.float32).reshape(32, 32)
        np.testing.assert_array_equal(ds._samples[0].depth, cached)
