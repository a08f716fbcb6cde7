"""Native C++ runtime tests (build + parity with the Python IO)."""

import numpy as np
import pytest

from fresnel_tpu import native


needs_native = pytest.mark.skipif(
    not native.is_available(), reason="native library not built")


@needs_native
class TestNativeIO:
    def test_gaussian_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        flat = rng.normal(size=(123, 14)).astype(np.float32)
        p = str(tmp_path / "g.bin")
        assert native.save_gaussians(p, flat)
        back = native.load_gaussians(p)
        np.testing.assert_array_equal(back, flat)

    def test_ply_matches_python_writer(self, tmp_path):
        import jax.numpy as jnp
        from fresnel_tpu.core import io as gio
        from fresnel_tpu.core.gaussians import GaussianCloud

        cloud = GaussianCloud.test_cloud(37, seed=5)
        flat = np.asarray(cloud.to_flat(), np.float32)
        p_native = tmp_path / "native.ply"
        p_python = tmp_path / "python.ply"
        assert native.save_ply(str(p_native), flat)
        gio.save_ply(p_python, cloud)
        a = p_native.read_bytes()
        b = p_python.read_bytes()
        assert a == b, "native PLY writer must be byte-identical"

    def test_resize_matches_numpy_reference(self):
        rng = np.random.default_rng(1)
        img = rng.uniform(size=(64, 48, 3)).astype(np.float32)
        out = native.resize_bilinear(img, 32, 24)
        assert out.shape == (32, 24, 3)
        # Self-consistency: identity resize is exact.
        same = native.resize_bilinear(img, 64, 48)
        np.testing.assert_allclose(same, img, atol=1e-6)
        # Downsample preserves mean approximately.
        assert abs(float(out.mean()) - float(img.mean())) < 0.02

    def test_batch_load(self, tmp_path):
        rng = np.random.default_rng(2)
        paths = []
        arrays = []
        for i in range(8):
            a = rng.normal(size=(100,)).astype(np.float32)
            p = tmp_path / f"f{i}.bin"
            a.tofile(p)
            paths.append(str(p))
            arrays.append(a)
        out = native.batch_load(paths, 100)
        np.testing.assert_array_equal(out, np.stack(arrays))

    def test_batch_load_missing_file(self, tmp_path):
        p = tmp_path / "a.bin"
        np.zeros(10, np.float32).tofile(p)
        out = native.batch_load([str(p), str(tmp_path / "missing.bin")], 10)
        assert out is None


@needs_native
class TestPrefetch:
    def test_async_roundtrip(self, tmp_path):
        rng = np.random.default_rng(3)
        arrays, paths = [], []
        for i in range(16):
            a = rng.normal(size=(257,)).astype(np.float32)
            p = tmp_path / f"p{i}.bin"
            a.tofile(p)
            arrays.append(a)
            paths.append(str(p))
        offsets = [i * 257 for i in range(16)]
        job = native.prefetch_submit(paths, [257] * 16, offsets, 16 * 257)
        assert job is not None
        buf = job.wait()
        assert job.error_index() == 0
        np.testing.assert_array_equal(buf.reshape(16, 257),
                                      np.stack(arrays))
        job.close()

    def test_interleaved_regions(self, tmp_path):
        # Regions need not be in path order — the streaming dataset packs
        # [images..., features..., depths...] from interleaved per-sample
        # files.
        a = np.full(4, 1.0, np.float32)
        b = np.full(6, 2.0, np.float32)
        (tmp_path / "a.bin").write_bytes(a.tobytes())
        (tmp_path / "b.bin").write_bytes(b.tobytes())
        job = native.prefetch_submit(
            [str(tmp_path / "b.bin"), str(tmp_path / "a.bin")],
            [6, 4], [4, 0], 10)
        buf = job.wait()
        np.testing.assert_array_equal(buf, np.concatenate([a, b]))
        job.close()

    def test_missing_file_reports_index(self, tmp_path):
        p = tmp_path / "x.bin"
        np.zeros(5, np.float32).tofile(p)
        job = native.prefetch_submit(
            [str(p), str(tmp_path / "nope.bin")], [5, 5], [0, 5], 10)
        assert job.wait() is None
        assert job.error_index() == 2
        job.close()

    def test_out_of_bounds_region_rejected(self, tmp_path):
        p = tmp_path / "x.bin"
        np.zeros(5, np.float32).tofile(p)
        assert native.prefetch_submit([str(p)], [50], [0], 10) is None
        assert native.prefetch_submit([str(p)], [5], [-1], 10) is None

    def test_many_concurrent_jobs(self, tmp_path):
        # Double-buffering keeps >=2 jobs alive at once; make sure buffers
        # don't alias and close() mid-flight is safe.
        datas = []
        for i in range(4):
            d = np.full(64, float(i), np.float32)
            d.tofile(tmp_path / f"j{i}.bin")
            datas.append(d)
        jobs = [native.prefetch_submit([str(tmp_path / f"j{i}.bin")],
                                       [64], [0], 64)
                for i in range(4)]
        for i, job in enumerate(jobs):
            np.testing.assert_array_equal(job.wait(), datas[i])
        for job in jobs:
            job.close()


class TestStreamingDataset:
    def _make_dir(self, tmp_path, n=6, size=32):
        from PIL import Image as PILImage
        rng = np.random.default_rng(0)
        for i in range(n):
            arr = (rng.uniform(size=(size, size, 3)) * 255).astype(np.uint8)
            PILImage.fromarray(arr).save(tmp_path / f"img{i}.png")
        return tmp_path

    def test_matches_imagedataset_batches(self, tmp_path):
        from fresnel_tpu.data.dataset import ImageDataset
        from fresnel_tpu.data.streaming import StreamingImageDataset

        d = self._make_dir(tmp_path)
        kw = dict(image_size=32, feature_dim=384, use_augmentation=False)
        stream = StreamingImageDataset(str(d), **kw)
        mem = ImageDataset(str(d), **kw)
        for bs in (2, 3):
            got = list(stream.batches(bs, np.random.default_rng(7)))
            want = list(mem.batches(bs, np.random.default_rng(7)))
            assert len(got) == len(want) == len(stream) // bs
            for gb, wb in zip(got, want):
                assert set(gb) == {"image", "features", "depth"}
                for k in gb:
                    np.testing.assert_allclose(gb[k], wb[k], atol=1e-6,
                                               err_msg=k)

    def test_sync_fallback_identical(self, tmp_path):
        from fresnel_tpu.data.streaming import StreamingImageDataset

        d = self._make_dir(tmp_path)
        kw = dict(image_size=32, feature_dim=384, use_augmentation=False)
        stream = StreamingImageDataset(str(d), **kw)
        nofetch = StreamingImageDataset(str(d), prefetch=False, **kw)
        got = list(stream.batches(2, np.random.default_rng(1)))
        want = list(nofetch.batches(2, np.random.default_rng(1)))
        for gb, wb in zip(got, want):
            for k in gb:
                np.testing.assert_array_equal(gb[k], wb[k])

    def test_vlm_density_passthrough(self, tmp_path):
        # When every sample has a {name}_vlm_density.npy, streaming batches
        # must carry it exactly like ImageDataset.batches() does.
        from fresnel_tpu.data.dataset import ImageDataset
        from fresnel_tpu.data.streaming import StreamingImageDataset

        d = self._make_dir(tmp_path, n=4)
        rng = np.random.default_rng(5)
        for i in range(4):
            np.save(d / f"img{i}_vlm_density.npy",
                    rng.uniform(0.5, 1.5, (8, 8)).astype(np.float32))
        kw = dict(image_size=32, use_augmentation=False)
        got = next(iter(StreamingImageDataset(str(d), **kw).batches(
            2, np.random.default_rng(0))))
        want = next(iter(ImageDataset(str(d), **kw).batches(
            2, np.random.default_rng(0))))
        assert "vlm_density" in got
        np.testing.assert_array_equal(got["vlm_density"],
                                      want["vlm_density"])

    def test_wrong_size_cache_recomputed(self, tmp_path):
        # A stale cache from different shapes must be detected (the native
        # reader loads fixed byte counts) and rewritten, not silently
        # truncated.
        from fresnel_tpu.data.streaming import StreamingImageDataset

        d = self._make_dir(tmp_path, n=2)
        bad = np.zeros(17, np.float32)
        bad.tofile(d / "img0_depth.bin")
        stream = StreamingImageDataset(str(d), image_size=32,
                                       use_augmentation=False)
        assert (d / "img0_depth.bin").stat().st_size == 256 * 256 * 4
        batch = next(iter(stream.batches(2, np.random.default_rng(0))))
        assert batch["depth"].shape == (2, 256, 256)
        assert np.isfinite(batch["depth"]).all()

    def test_augmentation_uses_rng(self, tmp_path):
        from fresnel_tpu.data.streaming import StreamingImageDataset

        d = self._make_dir(tmp_path)
        stream = StreamingImageDataset(str(d), image_size=32,
                                       use_augmentation=True)
        b1 = next(iter(stream.batches(2, np.random.default_rng(3))))
        b2 = next(iter(stream.batches(2, np.random.default_rng(3))))
        b3 = next(iter(stream.batches(2, np.random.default_rng(4))))
        np.testing.assert_array_equal(b1["image"], b2["image"])
        assert not np.array_equal(b1["image"], b3["image"])
