"""`fresnel` command-line interface.

Subcommands (the TPU equivalents of the reference's binaries/scripts):
  smoke   — device enumeration + compute roundtrip (reference: src/main.cpp)
  infer   — single image -> 3D Gaussian cloud (.ply/.bin)
            (reference: viewer load_image pipeline, SURVEY.md §3.2)
  render  — render a cloud file to PNG from a chosen pose
  orbit   — export an orbit of views (viewer substitute)
  train   — delegates to fresnel_tpu.train.train_gaussian_decoder
  eval    — novel-view evaluation of a checkpoint over a data dir
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path


def cmd_smoke(args) -> int:
    import jax
    import jax.numpy as jnp

    print("devices:")
    for d in jax.devices():
        print(f"  {d.platform}:{d.id} {d.device_kind}")
    x = jnp.arange(1024, dtype=jnp.float32)
    y = jax.jit(lambda v: v * 2.0)(x)
    ok = bool(jnp.all(y == x * 2.0))
    print(f"compute roundtrip (1024 elements x2): {'OK' if ok else 'FAILED'}")
    big = jax.jit(lambda v: v * 2.0)(jnp.ones((1_000_000,), jnp.float32))
    ok2 = bool(jnp.all(big == 2.0))
    print(f"large dispatch (1M elements): {'OK' if ok2 else 'FAILED'}")
    return 0 if ok and ok2 else 1


def _load_image(path: str, size: int = 512):
    import numpy as np
    import jax.numpy as jnp
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((size, size), Image.BILINEAR)
    return jnp.asarray(np.asarray(img, np.float32) / 255.0)


def _add_saag_quality_flags(p) -> None:
    """The reference viewer's ~40-field QualitySettings panel (reference:
    src/viewer/viewer.hpp:139-181) as CLI flags, grouped by the SAAG param
    structs (reference: src/core/pointcloud.hpp:18-80).  Defaults mirror
    the dataclass defaults in fresnel_tpu/geometry/saag.py."""
    g = p.add_argument_group("SAAG quality (with --saag)")
    g.add_argument("--depth_exponent", type=float, default=1.0,
                   help="depth**exponent preprocessing (viewer.cpp:331)")
    g.add_argument("--saag_base_size", type=float, default=0.008)
    g.add_argument("--saag_aspect_ratio", type=float, default=5.0)
    g.add_argument("--saag_edge_threshold", type=float, default=0.15)
    g.add_argument("--saag_edge_shrink", type=float, default=0.3)
    g.add_argument("--saag_min_confidence", type=float, default=0.1)
    g.add_argument("--saag_gradient_scale", type=float, default=50.0)
    g.add_argument("--saag_normal_strength", type=float, default=1.0)
    g.add_argument("--no_wrap", action="store_true",
                   help="disable silhouette wrap Gaussians")
    g.add_argument("--wrap_layers", type=int, default=3)
    g.add_argument("--wrap_layer_spacing", type=float, default=0.5)
    g.add_argument("--wrap_opacity_falloff", type=float, default=0.7)
    g.add_argument("--wrap_max_angle", type=float, default=75.0)
    g.add_argument("--wrap_aspect", type=float, default=2.0)
    g.add_argument("--wrap_edge_threshold", type=float, default=0.15)
    g.add_argument("--no_shell", action="store_true",
                   help="disable the volumetric back shell")
    g.add_argument("--shell_thickness", type=float, default=0.3)
    g.add_argument("--shell_back_opacity", type=float, default=0.6)
    g.add_argument("--shell_back_darken", type=float, default=0.8)
    g.add_argument("--no_shell_walls", action="store_true")
    g.add_argument("--shell_wall_segments", type=int, default=3)
    g.add_argument("--shell_wall_opacity", type=float, default=0.5)
    g.add_argument("--shell_edge_threshold", type=float, default=0.1)
    g.add_argument("--no_density", action="store_true",
                   help="disable adaptive edge densification")
    g.add_argument("--density_gradient_threshold", type=float, default=0.08)
    g.add_argument("--density_extra_count", type=int, default=4)
    g.add_argument("--density_position_jitter", type=float, default=0.6)
    g.add_argument("--density_size_variance", type=float, default=0.3)
    g.add_argument("--density_opacity_scale", type=float, default=0.7)


def _saag_params_from_args(args):
    from fresnel_tpu.geometry import (
        AdaptiveDensityParams, SilhouetteWrapParams, SurfaceGaussianParams,
        VolumetricShellParams)

    return (
        SurfaceGaussianParams(
            base_size=args.saag_base_size,
            aspect_ratio=args.saag_aspect_ratio,
            edge_threshold=args.saag_edge_threshold,
            edge_shrink=args.saag_edge_shrink,
            min_confidence=args.saag_min_confidence,
            gradient_scale=args.saag_gradient_scale,
            normal_strength=args.saag_normal_strength),
        SilhouetteWrapParams(
            enabled=not args.no_wrap,
            edge_threshold=args.wrap_edge_threshold,
            wrap_layers=args.wrap_layers,
            layer_spacing=args.wrap_layer_spacing,
            opacity_falloff=args.wrap_opacity_falloff,
            max_wrap_angle=args.wrap_max_angle,
            wrap_aspect=args.wrap_aspect),
        VolumetricShellParams(
            enabled=not args.no_shell,
            thickness=args.shell_thickness,
            back_opacity=args.shell_back_opacity,
            back_darken=args.shell_back_darken,
            connect_walls=not args.no_shell_walls,
            wall_segments=args.shell_wall_segments,
            wall_opacity=args.shell_wall_opacity,
            edge_threshold=args.shell_edge_threshold),
        AdaptiveDensityParams(
            enabled=not args.no_density,
            gradient_threshold=args.density_gradient_threshold,
            extra_count=args.density_extra_count,
            position_jitter=args.density_position_jitter,
            size_variance=args.density_size_variance,
            opacity_scale=args.density_opacity_scale),
    )


def cmd_infer(args) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fresnel_tpu.core import io as gio
    from fresnel_tpu.core.gaussians import GaussianCloud
    from fresnel_tpu.models.encoders import (
        create_depth_estimator, create_feature_extractor)

    t0 = time.perf_counter()
    image = _load_image(args.image)
    estimator = create_depth_estimator(args.depth_estimator)
    print(f"depth estimator: {estimator.kind}"
          + (f" ({estimator.weights_path})" if estimator.weights_path
             else " (procedural fallback — no weights found)"))

    if args.saag or args.checkpoint is None and args.no_model:
        depth = estimator(image, 256)
        from fresnel_tpu.geometry import (
            pointcloud_from_depth, to_surface_gaussians)

        if getattr(args, "depth_exponent", 1.0) != 1.0:
            # Reference preprocessing: depth**exponent before unprojection
            # (reference: src/viewer/viewer.cpp:331).
            depth = jnp.power(jnp.clip(depth, 0.0, 1.0), args.depth_exponent)
        sp, wp, shp, dp = _saag_params_from_args(args)
        pc = pointcloud_from_depth(
            jax.image.resize(depth, (256, 256), "linear"),
            color=jax.image.resize(image, (256, 256, 3), "linear"),
            depth_scale=args.depth_scale).normalize(3.0)
        cloud = to_surface_gaussians(
            pc, depth, params=sp, wrap_params=wp, shell_params=shp,
            density_params=dp, opacity=args.opacity)
        from fresnel_tpu.viewer.html_viewer import saag_categories
        categories = saag_categories(256 * 256, wp, shp, dp)
    else:
        extractor = create_feature_extractor(args.feature_extractor,
                                             grid=37, dim=384)
        print(f"feature extractor: {extractor.kind}"
              + (f" ({extractor.weights_path})" if extractor.weights_path
                 else " (procedural fallback — no weights found)"))
        fused = None
        if args.fused_encoder:
            # Opt-in only: on-chip the vmapped dual trunk measured SLOWER
            # than the two sequential programs (B=1 @512²: trunks
            # 6.55→7.21 ms, full 10.56→11.01 ms — T-049); kept for
            # batch-inference regimes where weight-stacking can win.
            from fresnel_tpu.models.encoders import create_fused_encoder
            fused = create_fused_encoder(extractor, estimator)
        if fused is not None:
            print("fused dual-trunk: features + depth in one jitted program")
            f, depth = fused(image, 256)
            feats = f[None]
        else:
            depth = estimator(image, 256)
            feats = extractor(image)[None]
        from fresnel_tpu.models.decoders import DirectPatchDecoder

        model = DirectPatchDecoder(gaussians_per_patch=args.gaussians_per_patch)
        if args.checkpoint:
            import flax.serialization as ser
            from fresnel_tpu.train.config import TrainingConfig
            from fresnel_tpu.train.harness import Trainer
            from fresnel_tpu.train.config import (
                HFGSConfig, HFTSConfig, PhysicsConfig)

            meta_path = Path(args.checkpoint + ".json")
            if meta_path.exists():
                meta = json.loads(meta_path.read_text())
                cfg = TrainingConfig(**meta["config"])
                trainer = Trainer(cfg, PhysicsConfig(**meta["physics_config"]),
                                  HFGSConfig(**meta["hfgs_config"]),
                                  HFTSConfig(**meta["hfts_config"]))
                img256 = jax.image.resize(
                    jnp.asarray(image), (256, 256, 3), "linear")
                img_nchw = np.asarray(
                    jnp.transpose(img256, (2, 0, 1)))[None]
                batch = {"features": np.asarray(feats),
                         "depth": np.asarray(depth)[None],
                         "image": img_nchw}
                state, _ = trainer.load_checkpoint(args.checkpoint, batch)
                model = trainer.model
                params = state["params"]["model"]
                if getattr(cfg, "train_encoder", False):
                    # e2e checkpoints carry their own encoder — its
                    # features, not the extractor's, are the model input.
                    feats = trainer.encode(state["params"], img_nchw)
                    print("feature extractor: jointly-trained encoder "
                          "(from checkpoint)")
            else:
                print("checkpoint meta json missing; cannot reconstruct model",
                      file=sys.stderr)
                return 1
        else:
            params = model.init(jax.random.PRNGKey(0), feats, depth[None])
            print("note: no checkpoint given — using randomly initialized "
                  "decoder (pass --saag for the geometric pipeline)")
        out = model.apply(params, feats, depth[None])
        cloud = GaussianCloud(
            positions=out["positions"][0], scales=out["scales"][0],
            rotations=out["rotations"][0], colors=out["colors"][0],
            opacities=out["opacities"][0])
        categories = None

    jax.block_until_ready(cloud.positions)
    dt = (time.perf_counter() - t0) * 1000

    # Host-side compaction: drop masked (zero-opacity) entries from the
    # static-shape pipeline before export.
    op = np.asarray(cloud.opacities)
    live = op > 1e-4
    if live.sum() < live.size:
        cloud = GaussianCloud(
            positions=jnp.asarray(np.asarray(cloud.positions)[live]),
            scales=jnp.asarray(np.asarray(cloud.scales)[live]),
            rotations=jnp.asarray(np.asarray(cloud.rotations)[live]),
            colors=jnp.asarray(np.asarray(cloud.colors)[live]),
            opacities=jnp.asarray(op[live]))
        if categories is not None:
            categories = categories[live]

    out_path = Path(args.output)
    if out_path.suffix == ".ply":
        gio.save_ply(out_path, cloud)
    else:
        gio.save_binary(out_path, cloud)
    print(f"{cloud.num_gaussians} gaussians -> {out_path}  ({dt:.0f} ms "
          f"incl. compile)")
    if getattr(args, "html", None):
        from fresnel_tpu.viewer.html_viewer import export_html
        n = export_html(cloud, args.html, max_gaussians=args.max_gaussians,
                        categories=categories)
        print(f"viewer with {n} gaussians -> {args.html}"
              + (" (SAAG category toggles live)"
                 if categories is not None else ""))
    return 0


def _load_cloud(path: str):
    from fresnel_tpu.core import io as gio

    if path.endswith(".ply"):
        return gio.load_ply(path)
    return gio.load_binary(path)


def _save_png(img, path: str):
    import numpy as np
    from PIL import Image

    arr = (np.asarray(img).transpose(1, 2, 0) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def cmd_refine(args) -> int:
    """Per-scene test-time optimization: image -> FITTED 3DGS cloud.

    The reference's pipeline is feedforward-only and its multiview
    optimizer is a stub TODO (reference: scripts/inference/
    cvs_multiview.py:358-399); this exposes the repo's per-scene fit
    machinery (train/fit_teacher.py — SSIM ~0.985 on corpus scenes,
    T-023) as a reconstruction mode: `--steps` Adam iterations through
    the differentiable tiled rasterizer refine decoder-space Gaussians
    against the input image.  ~100x the quality path of `infer` at
    ~steps x render cost."""
    import json as _json

    import jax.numpy as jnp
    import numpy as np

    from fresnel_tpu.core import io as gio
    from fresnel_tpu.core.gaussians import GaussianCloud
    from fresnel_tpu.models.decoders import head_transform
    from fresnel_tpu.models.encoders import create_depth_estimator
    from fresnel_tpu.train.fit_teacher import fit_scene

    t0 = time.perf_counter()
    image = _load_image(args.image, size=args.size)
    estimator = create_depth_estimator(args.depth_estimator)
    print(f"depth estimator: {estimator.kind}"
          + (f" ({estimator.weights_path})" if estimator.weights_path
             else " (procedural fallback — no weights found)"))
    depth = np.asarray(estimator(image, 256), np.float32)

    target = np.asarray(
        jnp.transpose(jnp.asarray(image), (2, 0, 1)), np.float32)
    if target.shape[-1] != args.size:
        import jax
        target = np.asarray(jax.image.resize(
            jnp.asarray(target), (3, args.size, args.size), "linear"))

    # No head biases: init_raw encodes the surface init (T-023) directly
    # in raw space; biases would double-apply and shrink scales to dust.
    hk: dict = {}
    teacher, metrics = fit_scene(
        target, depth, steps=args.steps, lr=args.lr,
        K=args.gaussians_per_patch, res=args.size, head_kwargs=hk,
        max_per_tile=args.max_per_tile,
        depth_offset_init=args.depth_offset_init)

    out = head_transform(
        jnp.asarray(teacher["raw"])[None], jnp.asarray(depth)[None],
        jnp.asarray(teacher["depth_offset"]), **hk)
    cloud = GaussianCloud(
        positions=out["positions"][0], scales=out["scales"][0],
        rotations=out["rotations"][0], colors=out["colors"][0],
        opacities=out["opacities"][0])

    out_path = Path(args.output)
    if out_path.suffix == ".ply":
        gio.save_ply(out_path, cloud)
    else:
        gio.save_binary(out_path, cloud)
    dt = (time.perf_counter() - t0) * 1000
    print(f"{cloud.num_gaussians} gaussians -> {out_path}  ({dt:.0f} ms "
          f"incl. compile)")
    print(_json.dumps({"ssim": round(metrics["ssim"], 4),
                       "psnr": round(metrics["psnr"], 2),
                       "steps": args.steps}))
    return 0


def cmd_render(args) -> int:
    import numpy as np
    from fresnel_tpu.core.camera import Camera
    from fresnel_tpu.render.tile import TileRendererConfig, render_tiled

    cloud = _load_cloud(args.cloud)
    cam = Camera.from_pose(np.radians(args.elevation), np.radians(args.azimuth),
                           args.size, distance=args.distance)
    img = render_tiled(cloud.positions, cloud.scales, cloud.rotations,
                       cloud.colors, cloud.opacities, cam,
                       config=TileRendererConfig(max_per_tile=args.max_per_tile))
    _save_png(img, args.output)
    print(f"rendered {cloud.num_gaussians} gaussians -> {args.output}")
    return 0


def cmd_orbit(args) -> int:
    import numpy as np
    from fresnel_tpu.evaluation.novel_view_eval import render_views

    cloud = _load_cloud(args.cloud)
    gaussians = {
        "positions": cloud.positions, "scales": cloud.scales,
        "rotations": cloud.rotations, "colors": cloud.colors,
        "opacities": cloud.opacities}
    azimuths = np.linspace(0, 360, args.views, endpoint=False)
    views = render_views(gaussians, render_size=args.size,
                         azimuths_deg=azimuths, elevation_deg=args.elevation,
                         distance=args.distance)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for az, v in zip(azimuths, views):
        _save_png(v, str(out_dir / f"view_az{int(az):03d}.png"))
    print(f"wrote {args.views} views to {out_dir}")
    return 0


def cmd_view(args) -> int:
    if args.serve:
        from fresnel_tpu.viewer.serve import serve_image

        serve_image(args.cloud, port=args.port,
                    depth_estimator=args.depth_estimator)
        return 0

    from fresnel_tpu.viewer.html_viewer import export_html

    if args.output is None:
        print("output .html required in static export mode", file=sys.stderr)
        return 1
    cloud = _load_cloud(args.cloud)
    n = export_html(cloud, args.output, args.max_gaussians, args.distance)
    print(f"viewer with {n} gaussians -> {args.output}")
    return 0


def cmd_train(args, extra) -> int:
    from fresnel_tpu.train.train_gaussian_decoder import main as train_main

    train_main(extra)
    return 0


def cmd_eval(args) -> int:
    import numpy as np
    import jax.numpy as jnp
    from fresnel_tpu.data.dataset import SyntheticGaussianDataset, ImageDataset
    from fresnel_tpu.evaluation.novel_view_eval import evaluate_novel_views
    from fresnel_tpu.train.config import (
        HFGSConfig, HFTSConfig, PhysicsConfig, TrainingConfig)
    from fresnel_tpu.train.harness import Trainer

    meta = json.loads(Path(args.checkpoint + ".json").read_text())
    cfg = TrainingConfig(**meta["config"])
    trainer = Trainer(cfg, PhysicsConfig(**meta["physics_config"]),
                      HFGSConfig(**meta["hfgs_config"]),
                      HFTSConfig(**meta["hfts_config"]))
    if args.synthetic:
        ds = SyntheticGaussianDataset(n_samples=args.max_images or 4,
                                      image_size=cfg.image_size)
    else:
        ds = ImageDataset(args.data_dir or cfg.data_dir,
                          image_size=cfg.image_size,
                          use_augmentation=False,
                          max_images=args.max_images)
    rng = np.random.default_rng(0)
    batch = next(iter(ds.batches(1, rng, shuffle=False)))
    state, _ = trainer.load_checkpoint(args.checkpoint, batch)

    samples = []
    for batch in ds.batches(1, rng, shuffle=False):
        if getattr(cfg, "train_encoder", False):
            feats = trainer.encode(state["params"], batch["image"])
        else:
            feats = jnp.asarray(batch["features"])
        depth = jnp.asarray(batch["depth"])
        out = trainer.model.apply(state["params"]["model"], feats, depth)
        sample = {
            "gaussians": {k: v[0] for k, v in out.items()
                          if k in ("positions", "scales", "rotations",
                                   "colors", "opacities")},
            "target": batch["image"][0],
        }
        if "views" in batch:
            # corpus_v2 GT orbit views -> per-view SSIM/PSNR in the eval
            sample["views"] = batch["views"][0]
        samples.append(sample)
        if args.max_images and len(samples) >= args.max_images:
            break
    # The eval cap defaults to the CHECKPOINT's training cap — a decoder
    # must be scored under the compositing it was trained with.
    mpt = args.max_per_tile or cfg.max_per_tile
    results = evaluate_novel_views(samples, render_size=args.size,
                                   output_json=args.output_json,
                                   max_per_tile=mpt)
    print(json.dumps(results, indent=2))

    if getattr(args, "save_grid", None):
        # Qualitative grid: rows = scenes, columns = [render | target].
        from fresnel_tpu.evaluation.visual_eval import VisualEvaluator

        ev = VisualEvaluator(render_size=args.size, max_per_tile=mpt)
        rows = []
        for s in samples[:8]:
            img = np.asarray(ev.render(s["gaussians"]))
            tgt = np.asarray(jnp.asarray(s["target"]))
            if tgt.shape[-1] != args.size:
                import jax
                tgt = np.asarray(jax.image.resize(
                    jnp.asarray(tgt), (3, args.size, args.size), "linear"))
            rows.append(np.concatenate([img, tgt], axis=2))
        grid = np.clip(np.concatenate(rows, axis=1), 0, 1)
        _save_png(jnp.asarray(grid), args.save_grid)
        print(f"qualitative grid -> {args.save_grid}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="fresnel")
    sub = parser.add_subparsers(dest="command", required=True)

    sub.add_parser("smoke", help="device + compute smoke test")

    p = sub.add_parser("infer", help="image -> 3D Gaussian cloud")
    p.add_argument("image")
    p.add_argument("output", help=".ply or .bin")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--saag", action="store_true",
                   help="use the geometric SAAG pipeline (no learned model)")
    p.add_argument("--no_model", action="store_true")
    p.add_argument("--gaussians_per_patch", type=int, default=4)
    p.add_argument("--depth_scale", type=float, default=2.0)
    p.add_argument("--opacity", type=float, default=0.8)
    p.add_argument("--depth_estimator", default="auto",
                   choices=["auto", "depth_anything", "gradient", "center"],
                   help="'auto' uses real Depth-Anything weights when found "
                        "(FRESNEL_TPU_MODELS or ./models), else gradient")
    p.add_argument("--fused_encoder", action="store_true",
                   help="run DINOv2+depth as one vmapped dual-trunk "
                        "program (needs both real backbones; measured "
                        "slower at B=1 — see T-049)")
    p.add_argument("--feature_extractor", default="auto",
                   choices=["auto", "dinov2", "patch"],
                   help="'auto' uses real DINOv2 weights when found")
    p.add_argument("--html", default=None, metavar="OUT.html",
                   help="also export the interactive HTML viewer (with live "
                        "SAAG category toggles on the --saag path)")
    p.add_argument("--max_gaussians", type=int, default=30000,
                   help="viewer preview cap (highest-opacity kept)")
    _add_saag_quality_flags(p)

    p = sub.add_parser(
        "refine", help="image -> per-scene OPTIMIZED 3D Gaussian cloud "
                       "(test-time optimization, ~0.98 SSIM)")
    p.add_argument("image")
    p.add_argument("output", help="OUT.ply or OUT.bin")
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--gaussians_per_patch", type=int, default=4)
    p.add_argument("--max_per_tile", type=int, default=1024)
    p.add_argument("--depth_estimator", default="auto")
    p.add_argument("--depth_offset_init", type=float, default=-0.13,
                   help="depth_offset start value; the reference-parity "
                        "-2.0 stalls short fits (Adam scalar travel, "
                        "T-027) — -0.13 is the content-at-view-distance "
                        "consensus")

    p = sub.add_parser("render", help="render a cloud file to PNG")
    p.add_argument("cloud")
    p.add_argument("output")
    p.add_argument("--azimuth", type=float, default=0.0)
    p.add_argument("--elevation", type=float, default=0.0)
    p.add_argument("--distance", type=float, default=2.0)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--max_per_tile", type=int, default=512,
                   help="per-tile compositing capacity; 512 here (vs the "
                        "256 training/eval default) because standalone "
                        "cloud rendering has no gradients and SAAG clouds "
                        "are much larger than decoder outputs")

    p = sub.add_parser("orbit", help="export an orbit of views")
    p.add_argument("cloud")
    p.add_argument("output_dir")
    p.add_argument("--views", type=int, default=8)
    p.add_argument("--elevation", type=float, default=0.0)
    p.add_argument("--distance", type=float, default=2.0)
    p.add_argument("--size", type=int, default=256)

    p = sub.add_parser("view", help="export an interactive HTML splat viewer")
    p.add_argument("cloud", help="a .ply/.bin cloud (static export) or, with "
                                 "--serve, the source IMAGE to reprocess")
    p.add_argument("output", nargs="?", default=None,
                   help="output .html (static export mode only)")
    p.add_argument("--max_gaussians", type=int, default=30000)
    p.add_argument("--distance", type=float, default=2.0)
    p.add_argument("--serve", action="store_true",
                   help="live mode: serve the viewer over HTTP with an "
                        "in-page reprocess panel (re-runs SAAG with new "
                        "params server-side — the reference viewer's "
                        "reprocess_image loop, viewer.cpp:300-452)")
    p.add_argument("--port", type=int, default=8008)
    p.add_argument("--depth_estimator", default="auto")

    p = sub.add_parser("train", help="train a decoder (flags pass through)")

    p = sub.add_parser("eval", help="novel-view evaluation of a checkpoint")
    p.add_argument("checkpoint")
    p.add_argument("--data_dir", default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--output_json", default=None)
    p.add_argument("--save_grid", default=None, metavar="OUT.png",
                   help="save a qualitative grid (render | target rows) "
                        "for the first scenes")
    p.add_argument("--max_per_tile", type=int, default=None,
                   help="eval-render capacity (default: the checkpoint's "
                        "training cap — score under the compositing the "
                        "decoder was trained with)")
    return parser


def main(argv=None) -> int:
    from fresnel_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    parser = build_parser()
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "train":
        args = parser.parse_args(["train"])
        return cmd_train(args, argv[1:])
    args = parser.parse_args(argv)
    return {
        "smoke": cmd_smoke,
        "infer": cmd_infer,
        "refine": cmd_refine,
        "render": cmd_render,
        "orbit": cmd_orbit,
        "eval": cmd_eval,
        "view": cmd_view,
    }[args.command](args)


if __name__ == "__main__":
    sys.exit(main())
