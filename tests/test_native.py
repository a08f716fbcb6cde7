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
