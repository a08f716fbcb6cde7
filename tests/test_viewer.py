"""HTML viewer: packing contract, SAAG categories, and — since no browser
exists in this environment — a numpy transcription of the client-side JS
projection chain checked against the framework's own EWA projection
(render/projection.py).  A sign/convention bug in the viewer's camera basis
or Jacobian shows up here as a mismatch in means2d / Sigma2D."""

import base64
import re

import numpy as np
import pytest

from fresnel_tpu.core.camera import Camera
from fresnel_tpu.core.gaussians import GaussianCloud
from fresnel_tpu.viewer.html_viewer import (
    CATEGORY_NAMES, export_html, saag_categories)

F = 15  # packed floats per gaussian


def _unpack(html_path):
    html = html_path.read_text()
    b64 = re.search(r'loadCloud\("([^"]*)"', html).group(1)
    arr = np.frombuffer(base64.b64decode(b64), "<f4")
    return arr.reshape(-1, F)


def _js_project(g_row, az, el, dist, W, H):
    """Transcription of the viewer's per-splat JS math (html_viewer.py
    _TEMPLATE draw()) into numpy: returns (sx, sy, Sigma2D_minus_soften)."""
    px3 = g_row[0:3]
    s3 = g_row[3:6]
    w, x, y, z = g_row[6:10]
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])
    M = R * s3[None, :]

    ce, se, ca, sa = np.cos(el), np.sin(el), np.cos(az), np.sin(az)
    cam = np.array([dist * ce * sa, dist * se, dist * ce * ca])
    f = -cam / np.linalg.norm(cam)
    r = np.array([-f[2], 0.0, f[0]])
    r = r / (np.linalg.norm(r) or 1.0)
    u = np.cross(r, f)
    focal = min(W, H) * 0.8

    p = px3 - cam
    d = p @ f
    vx, vy = p @ r, p @ u
    sx = focal * vx / d + W / 2
    sy = -focal * vy / d + H / 2

    a = r @ M
    b = u @ M
    c = f @ M
    j0, j2 = focal / d, focal / (d * d)
    B0 = a * j0 - vx * j2 * c
    # The renderer's J[1,2] sign quirk (reference parity — see
    # html_viewer.py template comment): vy*j2 term negated vs true geometry.
    B1 = -b * j0 - vy * j2 * c
    S = np.array([[B0 @ B0, B0 @ B1], [B0 @ B1, B1 @ B1]])
    return sx, sy, S


class TestJSProjectionParity:
    @pytest.mark.parametrize("az,el", [(0.0, 0.0), (0.7, 0.0), (0.0, 0.4),
                                       (2.2, -0.5)])
    def test_matches_framework_ewa(self, tmp_path, az, el):
        from fresnel_tpu.render.projection import compute_2d_covariance

        cloud = GaussianCloud.test_cloud(64, seed=7, spread=0.5)
        out = tmp_path / "v.html"
        export_html(cloud, str(out), max_gaussians=64)
        packed = _unpack(out)

        size, dist = 512, 2.0
        cam = Camera.from_pose(el, az, size, distance=dist)
        cov2d, means2d, depths = compute_2d_covariance(
            np.asarray(packed[:, 0:3]), np.asarray(packed[:, 3:6]),
            np.asarray(packed[:, 6:10]), cam)
        cov2d, means2d = np.asarray(cov2d), np.asarray(means2d)

        for i in range(0, 64, 7):
            sx, sy, S = _js_project(packed[i], az, el, dist, size, size)
            np.testing.assert_allclose(
                [sx, sy], means2d[i], rtol=1e-4, atol=5e-3)
            np.testing.assert_allclose(S, cov2d[i], rtol=1e-3, atol=1e-4)


class TestPackingContract:
    def test_packs_full_parameterization(self, tmp_path):
        cloud = GaussianCloud.test_cloud(100, seed=3)
        out = tmp_path / "v.html"
        n = export_html(cloud, str(out), max_gaussians=100)
        packed = _unpack(out)
        assert packed.shape == (n, F)
        # Quaternions are unit (wxyz), scales positive, colors in [0,1].
        qn = np.linalg.norm(packed[:, 6:10], axis=1)
        np.testing.assert_allclose(qn, 1.0, atol=1e-3)
        assert (packed[:, 3:6] > 0).all()
        assert (packed[:, 10:13] >= 0).all() and (packed[:, 10:13] <= 1).all()
        # No categories passed -> all base, toggles disabled.
        assert (packed[:, 14] == 0).all()
        assert "HAS_CATS = false" in out.read_text()

    def test_categories_survive_cap_and_enable_toggles(self, tmp_path):
        cloud = GaussianCloud.test_cloud(200, seed=4)
        cats = (np.arange(200) % 5).astype(np.uint8)
        out = tmp_path / "v.html"
        export_html(cloud, str(out), max_gaussians=50, categories=cats)
        packed = _unpack(out)
        html = out.read_text()
        assert "HAS_CATS = true" in html
        for name in CATEGORY_NAMES:
            assert name in html
        # Category follows its gaussian through the opacity cap.
        op = np.asarray(cloud.opacities)
        live = op > 1e-3
        kept = np.argsort(-op[live])[:50]
        np.testing.assert_array_equal(
            packed[:, 14].astype(np.uint8), cats[live][kept])

    def test_category_length_mismatch_raises(self, tmp_path):
        cloud = GaussianCloud.test_cloud(10, seed=5)
        with pytest.raises(ValueError):
            export_html(cloud, str(tmp_path / "v.html"),
                        categories=np.zeros(4, np.uint8))


class TestSAAGCategories:
    def test_layout_matches_to_surface_gaussians(self):
        """Category array length must equal the actual SAAG cloud size for
        every enable combination (block layout geometry/saag.py:290-292)."""
        import itertools

        import jax.numpy as jnp

        from fresnel_tpu.geometry.saag import (
            AdaptiveDensityParams, SilhouetteWrapParams,
            SurfaceGaussianParams, VolumetricShellParams,
            pointcloud_from_depth, to_surface_gaussians)

        depth = jnp.linspace(0, 1, 16 * 16).reshape(16, 16)
        pc = pointcloud_from_depth(depth)
        n_base = pc.positions.shape[0]
        for shell_on, walls_on, wrap_on, dens_on in itertools.product(
                [True, False], repeat=4):
            wp = SilhouetteWrapParams(enabled=wrap_on)
            shp = VolumetricShellParams(enabled=shell_on,
                                        connect_walls=walls_on)
            dp = AdaptiveDensityParams(enabled=dens_on)
            cloud = to_surface_gaussians(
                pc, depth, params=SurfaceGaussianParams(),
                wrap_params=wp, shell_params=shp, density_params=dp)
            cats = saag_categories(n_base, wp, shp, dp)
            assert len(cats) == cloud.positions.shape[0], (
                shell_on, walls_on, wrap_on, dens_on)


class TestReprocessServer:
    """e2e for the live reprocess bridge (viewer/serve.py): the HTML
    analogue of the reference viewer's in-app reprocess loop
    (viewer.cpp:300-452) and full-quality export (453-531).  Drives the
    real HTTP server over a socket — only the depth estimator is replaced
    by a synthetic ramp (no pretrained weights in this environment)."""

    @pytest.fixture(scope="class")
    def server(self):
        import json
        import threading
        import urllib.request

        from fresnel_tpu.viewer.serve import ReprocessSession, make_server

        rng = np.random.default_rng(3)
        img = rng.uniform(0.2, 0.9, (32, 32, 3)).astype(np.float32)
        yy, xx = np.mgrid[0:32, 0:32]
        depth = ((xx + yy) / 62.0).astype(np.float32)
        session = ReprocessSession(img, depth, grid=32)
        httpd = make_server(session, port=0)
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        base = f"http://127.0.0.1:{httpd.server_address[1]}"

        class Client:
            def get(self, path):
                with urllib.request.urlopen(base + path, timeout=120) as r:
                    return r.status, r.headers.get("Content-Type"), r.read()

            def post_json(self, path, obj):
                req = urllib.request.Request(
                    base + path, data=json.dumps(obj).encode(),
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(req, timeout=300) as r:
                    return json.loads(r.read())

        yield Client()
        httpd.shutdown()
        httpd.server_close()

    def test_page_has_reprocess_panel(self, server):
        status, ctype, body = server.get("/")
        html = body.decode()
        assert status == 200 and "text/html" in ctype
        assert "loadCloud(" in html
        assert 'id="rp_normal_strength"' in html
        assert 'id="rp_shell_thickness"' in html
        assert "/reprocess" in html

    def test_reprocess_changes_cloud(self, server):
        """Changing normal_strength + shell params over HTTP produces a
        DIFFERENT regenerated cloud — the VERDICT r2 done-condition."""
        base = server.post_json("/reprocess", {})
        assert base["n"] > 0 and "data_b64" not in base.get("error", "")
        changed = server.post_json(
            "/reprocess", {"normal_strength": 0.2, "shell_thickness": 0.9,
                           "shell_back_opacity": 0.1})
        assert changed["n"] > 0
        assert changed["data_b64"] != base["data_b64"]
        a = np.frombuffer(base64.b64decode(base["data_b64"]),
                          "<f4").reshape(-1, F)
        b = np.frombuffer(base64.b64decode(changed["data_b64"]),
                          "<f4").reshape(-1, F)
        # normal_strength reorients base discs: quaternions must move.
        assert not np.allclose(a[:, 6:10][: min(len(a), len(b))],
                               b[:, 6:10][: min(len(a), len(b))], atol=1e-4)

    def test_reprocess_subsample_changes_count(self, server):
        n1 = server.post_json("/reprocess", {"subsample": 1})["n"]
        n4 = server.post_json("/reprocess", {"subsample": 4})["n"]
        assert n4 < n1

    def test_reprocess_bad_params_reports_error(self, server):
        out = server.post_json("/reprocess", {"subsample": "not-a-number"})
        assert "error" in out

    def test_render_png_export(self, server):
        status, ctype, body = server.get("/render?az=0.5&el=0.2&dist=2.5&size=64")
        assert status == 200 and ctype == "image/png"
        assert body[:8] == b"\x89PNG\r\n\x1a\n"

    def test_export_ply_roundtrip(self, server, tmp_path):
        from fresnel_tpu.core import io as gio

        status, _, body = server.get("/export.ply")
        assert status == 200
        p = tmp_path / "cloud.ply"
        p.write_bytes(body)
        cloud = gio.load_ply(str(p))
        assert cloud.positions.shape[0] > 0
