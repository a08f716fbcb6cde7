"""Renderer tests: red-pixel check, dense-vs-tiled golden agreement,
differentiability, batching (SURVEY.md §4 rebuild test plan)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fresnel_tpu.core.gaussians import GaussianCloud
from fresnel_tpu.core.camera import Camera
from fresnel_tpu.render.dense import render_dense
from fresnel_tpu.render.tile import render_tiled, TileRendererConfig


def single_red_gaussian():
    return GaussianCloud(
        positions=jnp.array([[0.0, 0.0, 0.0]], jnp.float32),
        scales=jnp.full((1, 3), 0.3, jnp.float32),
        rotations=jnp.array([[1.0, 0.0, 0.0, 0.0]], jnp.float32),
        colors=jnp.array([[1.0, 0.0, 0.0]], jnp.float32),
        opacities=jnp.array([0.95], jnp.float32),
    )


def render_args(cloud, cam):
    return (cloud.positions, cloud.scales, cloud.rotations,
            cloud.colors, cloud.opacities, cam)


class TestRedPixel:
    """A single red Gaussian at the origin renders a red center pixel
    (reference: tests/test_gaussian_renderer.cpp:148-203)."""

    @pytest.mark.parametrize("renderer", [render_dense, render_tiled])
    def test_center_red(self, renderer):
        cam = Camera.default_training(64)
        img = renderer(*render_args(single_red_gaussian(), cam))
        assert img.shape == (3, 64, 64)
        center = img[:, 32, 32]
        assert float(center[0]) > 0.5, f"center not red: {center}"
        assert float(center[1]) < 0.1
        assert float(center[2]) < 0.1
        # Corner is background (black).
        corner = img[:, 0, 0]
        assert float(jnp.max(corner)) < 0.05


class TestGoldenAgreement:
    def test_tiled_matches_dense(self):
        cloud = GaussianCloud.test_cloud(300, seed=11, spread=0.6, z_offset=-2.5)
        cam = Camera.default_training(96)
        ref = render_dense(*render_args(cloud, cam))
        out = render_tiled(*render_args(cloud, cam))
        err = float(jnp.max(jnp.abs(ref - out)))
        # hard_cutoff clips the <1.1% tail outside 3 sigma; allow small diff.
        assert err < 0.02, f"max abs diff {err}"

    def test_tiled_no_cutoff_matches_dense_tighter(self):
        cloud = GaussianCloud.test_cloud(120, seed=13, spread=0.5, z_offset=-2.5)
        cam = Camera.default_training(64)
        ref = render_dense(*render_args(cloud, cam))
        cfg = TileRendererConfig(hard_cutoff=False, max_per_tile=128)
        out = render_tiled(*render_args(cloud, cam), config=cfg)
        # Without the bbox cutoff the only differences are binning margin
        # effects on far-away low-alpha tails.
        assert float(jnp.max(jnp.abs(ref - out))) < 2e-2

    def test_depth_output(self):
        cloud = single_red_gaussian()
        cam = Camera.default_training(64)
        img, depth = render_tiled(*render_args(cloud, cam), return_depth=True)
        assert depth.shape == (64, 64)
        # Center depth should be near camera distance 2 weighted by alpha.
        assert 0.5 < float(depth[32, 32]) <= 2.5

    def test_transmittance_output_matches_bg_identity(self):
        # The plumbed-out T must equal the alpha identity
        # render(bg=1) - render(bg=0), the double-render it replaces
        # (parallel/render.py round-1 #10).
        cloud = GaussianCloud.test_cloud(80, seed=5, spread=0.4, z_offset=-2.0)
        cam = Camera.default_training(64)
        img0, T = render_tiled(*render_args(cloud, cam),
                               return_transmittance=True)
        img1 = render_tiled(*render_args(cloud, cam),
                            background=(1.0, 1.0, 1.0))
        assert T.shape == (64, 64)
        assert float(jnp.max(jnp.abs((img1 - img0) - T[None]))) < 1e-5
        img, depth, T2 = render_tiled(*render_args(cloud, cam),
                                      return_depth=True,
                                      return_transmittance=True)
        assert float(jnp.max(jnp.abs(T2 - T))) == 0.0


class TestDifferentiability:
    def test_grad_flows_to_all_params(self):
        cloud = GaussianCloud.test_cloud(50, seed=21, spread=0.4, z_offset=-2.0)
        cam = Camera.default_training(48)
        target = jnp.zeros((3, 48, 48))

        def loss_fn(pos, sc, rot, col, op):
            img = render_tiled(pos, sc, rot, col, op, cam)
            return jnp.mean((img - target) ** 2)

        grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
            cloud.positions, cloud.scales, cloud.rotations,
            cloud.colors, cloud.opacities)
        for g, name in zip(grads, ["pos", "scale", "rot", "color", "op"]):
            assert not bool(jnp.any(jnp.isnan(g))), f"NaN grad in {name}"
        # Color gradient must be nonzero for a visible scene.
        assert float(jnp.max(jnp.abs(grads[3]))) > 0

    def test_grad_matches_finite_difference(self):
        """Finite-difference check on opacity (smooth parameter)."""
        cloud = single_red_gaussian()
        cam = Camera.default_training(32)

        def loss_fn(op):
            img = render_tiled(cloud.positions, cloud.scales, cloud.rotations,
                               cloud.colors, op, cam)
            return jnp.sum(img)

        op = cloud.opacities
        g = jax.grad(loss_fn)(op)
        eps = 1e-3
        fd = (loss_fn(op + eps) - loss_fn(op - eps)) / (2 * eps)
        np.testing.assert_allclose(float(g[0]), float(fd), rtol=5e-3)

    def test_empty_scene_keeps_gradient(self):
        """All Gaussians behind the camera: background render, zero (not NaN)
        grads — the reference needed a grad_anchor hack for this
        (differentiable_renderer.py:327-331); masking gives it for free."""
        cloud = GaussianCloud.test_cloud(10, z_offset=+5.0)  # behind camera
        cam = Camera.default_training(32)

        def loss_fn(pos):
            img = render_tiled(pos, cloud.scales, cloud.rotations,
                               cloud.colors, cloud.opacities, cam)
            return jnp.mean(img)

        img = render_tiled(*render_args(cloud, cam))
        assert float(jnp.max(img)) == 0.0
        g = jax.grad(loss_fn)(cloud.positions)
        assert not bool(jnp.any(jnp.isnan(g)))


class TestBatching:
    def test_vmap_over_clouds(self):
        b = 3
        clouds = [GaussianCloud.test_cloud(40, seed=s) for s in range(b)]
        pos = jnp.stack([c.positions for c in clouds])
        sc = jnp.stack([c.scales for c in clouds])
        rot = jnp.stack([c.rotations for c in clouds])
        col = jnp.stack([c.colors for c in clouds])
        op = jnp.stack([c.opacities for c in clouds])
        cam = Camera.default_training(32)
        imgs = jax.vmap(
            lambda p, s, r, c, o: render_tiled(p, s, r, c, o, cam)
        )(pos, sc, rot, col, op)
        assert imgs.shape == (b, 3, 32, 32)
        single = render_tiled(pos[0], sc[0], rot[0], col[0], op[0], cam)
        np.testing.assert_allclose(imgs[0], single, atol=1e-5)


class TestPhaseBlending:
    def test_phase_blending_changes_output(self):
        cloud = GaussianCloud.test_cloud(30, seed=31, spread=0.2, z_offset=-2.0)
        cam = Camera.default_training(32)
        rng = np.random.default_rng(0)
        phases = jnp.asarray(rng.uniform(size=30).astype(np.float32))
        cfg_on = TileRendererConfig(use_phase_blending=True, max_per_tile=64)
        cfg_off = TileRendererConfig(use_phase_blending=False, max_per_tile=64)
        img_on = render_tiled(*render_args(cloud, cam), phases=phases, config=cfg_on)
        img_off = render_tiled(*render_args(cloud, cam), phases=phases, config=cfg_off)
        assert float(jnp.max(jnp.abs(img_on - img_off))) > 1e-4

    def test_aligned_phases_match_plain(self):
        """All-equal phases: after the first hit, interference factor is 1 at
        aligned phases; cos(0)=1 keeps alpha unchanged, so output matches the
        plain renderer."""
        cloud = GaussianCloud.test_cloud(20, seed=33, spread=0.2, z_offset=-2.0)
        cam = Camera.default_training(32)
        phases = jnp.zeros(20, jnp.float32)
        cfg_on = TileRendererConfig(use_phase_blending=True, max_per_tile=64)
        img_on = render_tiled(*render_args(cloud, cam), phases=phases, config=cfg_on)
        img_off = render_tiled(*render_args(cloud, cam))
        np.testing.assert_allclose(img_on, img_off, atol=1e-5)


class TestSearchBinning:
    """The scatter-free rank-table/binary-search binning must be
    interchangeable with the window-pair scatter binning (same tables,
    same image, same gradients) — it is auto-selected beyond ~64k
    Gaussians for its output-proportional cost (T-011)."""

    def _sorted_projection(self, cloud, cam):
        import dataclasses

        from fresnel_tpu.render.projection import (
            depth_sort_indices, project_gaussians)

        proj = project_gaussians(cloud.positions, cloud.scales,
                                 cloud.rotations, cam, max_radius=32.0)
        proj = dataclasses.replace(
            proj, visible=proj.visible & (cloud.opacities > 0.0))
        order = depth_sort_indices(proj)
        return (proj.means2d[order], proj.radii[order], proj.visible[order])

    @pytest.mark.parametrize("n", [77, 300, 5000])
    def test_tables_identical(self, n):
        from fresnel_tpu.render.tile import (
            _bin_gaussians, _bin_gaussians_search)

        cam = Camera.default_training(128)
        cloud = GaussianCloud.test_cloud(n, seed=n, spread=0.6,
                                         z_offset=-2.0, scale=0.05)
        m2, rad, vis = self._sorted_projection(cloud, cam)
        ti1, tv1 = _bin_gaussians(m2, rad, vis, 8, 8, 16, 64)
        ti2, tv2 = _bin_gaussians_search(m2, rad, vis, 8, 8, 16, 64)
        assert bool(jnp.all(tv1 == tv2))
        assert bool(jnp.all(jnp.where(tv1, ti1, -1)
                            == jnp.where(tv2, ti2, -1)))

    def test_image_and_grads_identical(self):
        cam = Camera.default_training(128)
        cloud = GaussianCloud.test_cloud(4000, seed=3, spread=0.6,
                                         z_offset=-2.0, scale=0.05)

        def render(mode):
            cfg = TileRendererConfig(backend="xla", binning=mode)
            return render_tiled(cloud.positions, cloud.scales,
                                cloud.rotations, cloud.colors,
                                cloud.opacities, cam, config=cfg)

        np.testing.assert_array_equal(np.asarray(render("pairs")),
                                      np.asarray(render("search")))

        def grads(mode):
            cfg = TileRendererConfig(backend="xla", binning=mode)

            def f(p, o):
                return jnp.sum(render_tiled(p, cloud.scales, cloud.rotations,
                                            cloud.colors, o, cam,
                                            config=cfg) ** 2)

            return jax.grad(f, argnums=(0, 1))(cloud.positions,
                                               cloud.opacities)

        for a, b in zip(grads("pairs"), grads("search")):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("groups", [2, 4, 8])
    def test_grouped_scan_identical(self, groups):
        # Tile-row-group scanning (the memory bound that reaches the
        # reference's 5M cap) must be bit-identical to the one-shot table.
        from fresnel_tpu.render.tile import _bin_gaussians_search

        cam = Camera.default_training(128)
        cloud = GaussianCloud.test_cloud(5000, seed=9, spread=0.6,
                                         z_offset=-2.0, scale=0.05)
        m2, rad, vis = self._sorted_projection(cloud, cam)
        ti1, tv1 = _bin_gaussians_search(m2, rad, vis, 8, 8, 16, 64)
        tig, tvg = _bin_gaussians_search(m2, rad, vis, 8, 8, 16, 64,
                                         groups=groups)
        np.testing.assert_array_equal(np.asarray(tv1), np.asarray(tvg))
        np.testing.assert_array_equal(
            np.asarray(jnp.where(tv1, ti1, -1)),
            np.asarray(jnp.where(tvg, tig, -1)))

    @pytest.mark.parametrize("groups", [1, 4])
    def test_pallas_table_identical(self, groups):
        # The fused Pallas rank-table build (render/pallas_binning.py) must
        # be bit-identical to the XLA mask path (interpret mode on CPU).
        from fresnel_tpu.render.tile import _bin_gaussians_search

        cam = Camera.default_training(128)
        cloud = GaussianCloud.test_cloud(5000, seed=13, spread=0.6,
                                         z_offset=-2.0, scale=0.05)
        m2, rad, vis = self._sorted_projection(cloud, cam)
        ti1, tv1 = _bin_gaussians_search(m2, rad, vis, 8, 8, 16, 64,
                                         table="xla")
        tip, tvp = _bin_gaussians_search(m2, rad, vis, 8, 8, 16, 64,
                                         table="pallas",
                                         pallas_interpret=True,
                                         groups=groups)
        np.testing.assert_array_equal(np.asarray(tv1), np.asarray(tvp))
        np.testing.assert_array_equal(
            np.asarray(jnp.where(tv1, ti1, -1)),
            np.asarray(jnp.where(tvp, tip, -1)))

    @pytest.mark.parametrize("n", [300, 5000])
    def test_chunked_tables_identical(self, n):
        # The opt-in table-free chunked path (T-022: slower on TPU, kept as
        # a verified reference implementation) must stay bit-identical.
        from fresnel_tpu.render.tile import (
            _bin_gaussians_chunked, _bin_gaussians_search)

        cam = Camera.default_training(128)
        cloud = GaussianCloud.test_cloud(n, seed=n + 1, spread=0.6,
                                         z_offset=-2.0, scale=0.05)
        m2, rad, vis = self._sorted_projection(cloud, cam)
        ti1, tv1 = _bin_gaussians_search(m2, rad, vis, 8, 8, 16, 64)
        ti2, tv2 = _bin_gaussians_chunked(m2, rad, vis, 8, 8, 16, 64)
        np.testing.assert_array_equal(np.asarray(tv1), np.asarray(tv2))
        np.testing.assert_array_equal(
            np.asarray(jnp.where(tv1, ti1, -1)),
            np.asarray(jnp.where(tv2, ti2, -1)))

    def test_stream_tables_identical(self):
        # The Pallas single-pass streaming compaction (binning="stream",
        # pallas_stream_binning.py) must be bit-identical to the search
        # tables.  Interpret mode with shrunk chunk/span constants (the
        # tuned TPU constants unroll a trace too large to interpret).
        from fresnel_tpu.render.pallas_stream_binning import (
            bin_gaussians_stream)
        from fresnel_tpu.render.tile import _bin_gaussians_search

        cam = Camera.default_training(128)
        for n, M in [(900, 64), (3000, 256)]:
            cloud = GaussianCloud.test_cloud(n, seed=n + 5, spread=0.6,
                                             z_offset=-2.0, scale=0.05)
            m2, rad, vis = self._sorted_projection(cloud, cam)
            ti1, tv1 = _bin_gaussians_search(m2, rad, vis, 8, 8, 16, M)
            ti2, tv2 = bin_gaussians_stream(
                m2, rad, vis, 8, 8, 16, M, interpret=True,
                chunk=128, cpc=2, tile_block=8, win=16)
            np.testing.assert_array_equal(np.asarray(tv1), np.asarray(tv2))
            np.testing.assert_array_equal(
                np.asarray(jnp.where(tv1, ti1, -1)),
                np.asarray(jnp.where(tv2, ti2, -1)))

    @pytest.mark.parametrize("n", [900, 5000])
    def test_rows_tables_identical(self, n):
        # Two-stage row-segment binning must match the rank-table search
        # bit-for-bit whenever no tile row overflows row_capacity.
        from fresnel_tpu.render.tile import (
            _bin_gaussians_rows, _bin_gaussians_search)

        cam = Camera.default_training(128)
        cloud = GaussianCloud.test_cloud(n, seed=n + 3, spread=0.6,
                                         z_offset=-2.0, scale=0.05)
        m2, rad, vis = self._sorted_projection(cloud, cam)
        ti1, tv1 = _bin_gaussians_search(m2, rad, vis, 8, 8, 16, 64)
        ti2, tv2 = _bin_gaussians_rows(m2, rad, vis, 8, 8, 16, 64,
                                       row_capacity=8192)
        np.testing.assert_array_equal(np.asarray(tv1), np.asarray(tv2))
        np.testing.assert_array_equal(
            np.asarray(jnp.where(tv1, ti1, -1)),
            np.asarray(jnp.where(tv2, ti2, -1)))

    def test_rows_nonsquare_grid(self):
        # 8x6 tile grid + a small row capacity still matches search when
        # rows fit; exercises the nty != ntx reshapes.
        from fresnel_tpu.render.tile import (
            _bin_gaussians_rows, _bin_gaussians_search)

        view = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(-2.0)
        cam = Camera.create(fx=102.4, fy=102.4, cx=64.0, cy=48.0,
                            width=128, height=96, view=view)
        cloud = GaussianCloud.test_cloud(3000, seed=12, spread=0.6,
                                         z_offset=-2.0, scale=0.05)
        m2, rad, vis = self._sorted_projection(cloud, cam)
        ti1, tv1 = _bin_gaussians_search(m2, rad, vis, 8, 6, 16, 64)
        ti2, tv2 = _bin_gaussians_rows(m2, rad, vis, 8, 6, 16, 64,
                                       row_capacity=4096)
        np.testing.assert_array_equal(np.asarray(tv1), np.asarray(tv2))
        np.testing.assert_array_equal(
            np.asarray(jnp.where(tv1, ti1, -1)),
            np.asarray(jnp.where(tv2, ti2, -1)))

    def test_grouped_scan_nondivisible_rows(self):
        # 6 tile rows with 4 groups forces row padding (nty2=8, nty_g=2).
        from fresnel_tpu.render.tile import _bin_gaussians_search

        view = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(-2.0)
        cam = Camera.create(fx=102.4, fy=102.4, cx=64.0, cy=48.0,
                            width=128, height=96, view=view)
        cloud = GaussianCloud.test_cloud(3000, seed=11, spread=0.6,
                                         z_offset=-2.0, scale=0.05)
        m2, rad, vis = self._sorted_projection(cloud, cam)
        ti1, tv1 = _bin_gaussians_search(m2, rad, vis, 8, 6, 16, 64)
        tig, tvg = _bin_gaussians_search(m2, rad, vis, 8, 6, 16, 64,
                                         groups=4)
        assert tig.shape == ti1.shape == (48, 64)
        np.testing.assert_array_equal(np.asarray(tv1), np.asarray(tvg))
        np.testing.assert_array_equal(
            np.asarray(jnp.where(tv1, ti1, -1)),
            np.asarray(jnp.where(tvg, tig, -1)))


class TestCountingSort:
    """16-bit-quantized MXU counting sort (depth_sort="counting"): a
    measured-slower-but-correct alternative to lax.sort (T-012).  Must be a
    stable permutation with invisible Gaussians last and keys nondecreasing."""

    def test_permutation_stability_order(self):
        from fresnel_tpu.render.projection import _counting_depth_sort

        rng = np.random.default_rng(0)
        n = 10_001
        d = jnp.asarray(rng.uniform(1.0, 5.0, size=n).astype(np.float32))
        vis = jnp.asarray(rng.uniform(size=n) > 0.3)
        idx = np.asarray(_counting_depth_sort(d, vis))
        assert np.array_equal(np.sort(idx), np.arange(n))

        # Reproduce the implementation's quantized keys exactly (f32 math).
        big = jnp.float32(3.4e38)
        dmin = jnp.min(jnp.where(vis, d, big))
        dmax = jnp.max(jnp.where(vis, d, -big))
        scale = 65534.0 / jnp.maximum(dmax - dmin, 1e-12)
        q = jnp.clip((d - dmin) * scale, 0.0, 65534.0).astype(jnp.int32)
        keys = np.asarray(jnp.where(vis, q, 0xFFFF))

        ks = keys[idx]
        assert (np.diff(ks.astype(np.int64)) >= 0).all()
        same = ks[1:] == ks[:-1]
        assert (np.diff(idx)[same] > 0).all()  # stable
        nv = int(np.asarray(vis).sum())
        assert np.asarray(vis)[idx][:nv].all()  # invisible last

    def test_render_close_to_exact_sort(self):
        cam = Camera.default_training(128)
        cloud = GaussianCloud.test_cloud(5000, seed=1, spread=0.6,
                                         z_offset=-2.0, scale=0.03)

        def render(method):
            cfg = TileRendererConfig(backend="xla", depth_sort=method)
            return np.asarray(render_tiled(
                cloud.positions, cloud.scales, cloud.rotations, cloud.colors,
                cloud.opacities, cam, config=cfg))

        a, b = render("exact"), render("counting")
        # Only quantization ties can reorder; the composite difference is
        # bounded by tie swaps among near-equal depths.
        assert float(np.abs(a - b).max()) < 0.02


class TestPackedSort:
    """Single-uint32 (12-bit depth | 20-bit index) sort (depth_sort="packed",
    T-013): stable permutation, invisible last, order matches the quantized
    keys; renders must stay close to the exact sort."""

    def test_permutation_stability_order(self):
        from fresnel_tpu.render.projection import _packed_depth_sort

        rng = np.random.default_rng(4)
        n = 9_973
        d = jnp.asarray(rng.uniform(1.0, 5.0, size=n).astype(np.float32))
        vis = jnp.asarray(rng.uniform(size=n) > 0.3)
        idx = np.asarray(_packed_depth_sort(d, vis))
        assert np.array_equal(np.sort(idx), np.arange(n))

        big = jnp.float32(3.4e38)
        dmin = jnp.min(jnp.where(vis, d, big))
        dmax = jnp.max(jnp.where(vis, d, -big))
        scale = 4094.0 / jnp.maximum(dmax - dmin, 1e-12)
        q = jnp.clip((d - dmin) * scale, 0.0, 4094.0).astype(jnp.int64)
        keys = np.asarray(jnp.where(vis, q, 4095))

        ks = keys[idx]
        assert (np.diff(ks) >= 0).all()
        same = ks[1:] == ks[:-1]
        assert (np.diff(idx)[same] > 0).all()  # index tie-break = stable
        nv = int(np.asarray(vis).sum())
        assert np.asarray(vis)[idx][:nv].all()  # invisible last

    def test_rejects_beyond_index_capacity(self):
        from fresnel_tpu.render.projection import _packed_depth_sort

        d = jnp.zeros((1 << 20) + 1, jnp.float32)
        with np.testing.assert_raises(ValueError):
            _packed_depth_sort(d, d > -1)

    def test_render_close_to_exact_sort(self):
        cam = Camera.default_training(128)
        cloud = GaussianCloud.test_cloud(5000, seed=2, spread=0.6,
                                         z_offset=-2.0, scale=0.03)

        def render(method):
            cfg = TileRendererConfig(backend="xla", depth_sort=method)
            return np.asarray(render_tiled(
                cloud.positions, cloud.scales, cloud.rotations, cloud.colors,
                cloud.opacities, cam, config=cfg))

        a, b = render("exact"), render("packed")
        # 12-bit keys allow slightly larger tie swaps than the 16-bit
        # counting sort; differences stay visually invisible (sub-1% of a
        # pixel at worst, ppm on average).
        assert float(np.abs(a - b).max()) < 0.08
        assert float(np.abs(a - b).mean()) < 1e-4


class TestOverflowTelemetry:
    """Capacity telemetry (VERDICT r2 weak #6): render_tiled's
    return_overflow reports exactly what the static per-tile cap drops."""

    def _cloud(self, n, seed=11):
        from fresnel_tpu.core.gaussians import GaussianCloud
        return GaussianCloud.test_cloud(n, seed=seed, spread=0.4,
                                        z_offset=-2.0, scale=0.05)

    def test_totals_match_bruteforce(self):
        import dataclasses
        from fresnel_tpu.core.camera import Camera
        from fresnel_tpu.render.projection import (depth_sort_indices,
                                                   project_gaussians)
        from fresnel_tpu.render.tile import _tile_totals

        cam = Camera.default_training(128)
        cloud = self._cloud(800)
        proj = project_gaussians(cloud.positions, cloud.scales,
                                 cloud.rotations, cam, max_radius=32.0)
        vis = proj.visible & (cloud.opacities > 0.0)
        totals = np.asarray(_tile_totals(proj.means2d, proj.radii, vis,
                                         8, 8, 16))
        # Brute force over the same integer interval test.
        u, v = np.asarray(proj.means2d).T
        r = np.asarray(proj.radii)
        visn = np.asarray(vis)
        ref = np.zeros((8, 8), np.int64)
        for ty in range(8):
            for tx in range(8):
                hx = (tx >= np.floor((u - r) / 16)) & (tx <= np.floor((u + r) / 16))
                hy = (ty >= np.floor((v - r) / 16)) & (ty <= np.floor((v + r) / 16))
                ref[ty, tx] = np.sum(hx & hy & visn)
        np.testing.assert_array_equal(totals.reshape(8, 8), ref)

    def test_no_overflow_when_capacity_suffices(self):
        from fresnel_tpu.core.camera import Camera
        cam = Camera.default_training(128)
        cloud = self._cloud(200)
        cfg = TileRendererConfig(backend="xla")
        img, ovf = render_tiled(cloud.positions, cloud.scales,
                                cloud.rotations, cloud.colors,
                                cloud.opacities, cam, config=cfg,
                                return_overflow=True)
        ovf = np.asarray(ovf)
        assert ovf[0] == 0 and ovf[2] == 0          # nothing dropped
        assert ovf[1] > 0                           # pairs were counted
        assert ovf[3] <= 200

    def test_overflow_counted_when_cap_tiny(self):
        from fresnel_tpu.core.camera import Camera
        cam = Camera.default_training(128)
        cloud = self._cloud(3000)
        cfg = TileRendererConfig(backend="xla", max_per_tile=32, chunk=32)
        img, ovf = render_tiled(cloud.positions, cloud.scales,
                                cloud.rotations, cloud.colors,
                                cloud.opacities, cam, config=cfg,
                                return_overflow=True)
        ovf = np.asarray(ovf)
        assert ovf[0] > 0 and ovf[2] > 0
        assert ovf[3] > 32
        # dropped = sum over tiles of max(total - cap, 0) <= total pairs
        assert ovf[0] < ovf[1]

    def test_order_with_depth_and_transmittance(self):
        from fresnel_tpu.core.camera import Camera
        cam = Camera.default_training(64)
        cloud = self._cloud(100)
        cfg = TileRendererConfig(backend="xla")
        out = render_tiled(cloud.positions, cloud.scales, cloud.rotations,
                           cloud.colors, cloud.opacities, cam, config=cfg,
                           return_depth=True, return_transmittance=True,
                           return_overflow=True)
        img, dep, tr, ovf = out
        assert img.shape == (3, 64, 64) and dep.shape == (64, 64)
        assert tr.shape == (64, 64) and ovf.shape == (4,)

    def test_render_with_stats_reports_overflow(self):
        from fresnel_tpu.core.camera import Camera
        from fresnel_tpu.utils.profiling import render_with_stats

        cam = Camera.default_training(64)
        cloud = self._cloud(500)
        cfg = TileRendererConfig(backend="xla", max_per_tile=32, chunk=32)
        img, stats = render_with_stats(
            cloud.positions, cloud.scales, cloud.rotations, cloud.colors,
            cloud.opacities, cam, config=cfg)
        assert stats.total_pairs > 0
        assert stats.max_tile_hits >= 1
        assert "overflow" in str(stats)
