"""CVS end-to-end: image -> CVS views -> optimize_3dgs -> score vs GT.

The reference never produced this number — its optimize_3dgs is a stub
TODO (reference: scripts/inference/cvs_multiview.py:358-399).  Here the
full loop runs: one-step CVS view synthesis on a corpus_v2 scene, a real
multi-view Gaussian fit to those views, and TRUE scoring of the fitted
cloud's renders against the scene's raytraced GT orbit views.

Run:  python -u experiments/eval_cvs_e2e.py --ckpt checkpoints_cvs_gt/cvs_final.msgpack \
          --scenes data/corpus_v2/scene_0000.png [more...] --out_json results/eval_cvs_e2e.json
"""

import argparse
import json
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--scenes", nargs="+",
                    default=["data/corpus_v2/scene_0000.png"])
    ap.add_argument("--num_steps", type=int, default=1)
    ap.add_argument("--fit_steps", type=int, default=300)
    ap.add_argument("--n_gaussians", type=int, default=2000)
    ap.add_argument("--out_json", default="results/eval_cvs_e2e.json")
    ap.add_argument("--grid", default=None, help="optional PNG grid path")
    args = ap.parse_args()

    from fresnel_tpu.utils.compile_cache import enable_compilation_cache
    from fresnel_tpu.utils.tpu_lock import tpu_lock

    enable_compilation_cache()

    import flax.serialization as ser
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from fresnel_tpu.core.camera import Camera
    from fresnel_tpu.evaluation.visual_eval import compute_psnr, compute_ssim
    from fresnel_tpu.inference.cvs_multiview import (camera_path,
                                                     optimize_3dgs)
    from fresnel_tpu.models.encoders import create_feature_extractor
    from fresnel_tpu.render.tile import TileRendererConfig, render_tiled
    from fresnel_tpu.train.train_cvs import CVSTrainConfig, CVSTrainer

    meta = json.loads(Path(args.ckpt + ".json").read_text())
    cfg = CVSTrainConfig(**meta["config"])
    trainer = CVSTrainer(cfg)
    S = cfg.image_size
    extractor = create_feature_extractor(dim=384)

    state = None
    results = {"scenes": []}
    with tpu_lock():
        for scene in args.scenes:
            p = Path(scene)
            with np.load(p.with_name(p.stem + "_views.npz")) as z:
                gt = z["images"].astype(np.float32) / 255.0   # (8, S, S, 3)
                az_deg = z["azimuths_deg"].astype(np.float32)
            img = Image.open(p).convert("RGB").resize((S, S))
            image = jnp.asarray(np.asarray(img, np.float32) / 255.0)
            feats = extractor(image)[None]
            input_chw = np.transpose(np.asarray(image), (2, 0, 1))[None]

            if state is None:
                batch = {
                    "input_image": input_chw,
                    "features": np.asarray(feats),
                    "R_rel": np.eye(3, dtype=np.float32)[None],
                    "t_rel": np.zeros((1, 3), np.float32),
                    "target_image": input_chw,
                }
                template = trainer.init_state(batch)
                state = ser.from_bytes(template,
                                       Path(args.ckpt).read_bytes())

            poses = [(0.0, float(np.radians(a))) for a in az_deg]
            base_cam = Camera.from_pose(0.0, 0.0, S)
            R0 = np.asarray(base_cam.view[:3, :3])
            t0 = np.asarray(base_cam.view[:3, 3])
            rng = jax.random.PRNGKey(0)
            views = []
            for el, az in poses:
                cam = Camera.from_pose(el, az, S)
                R = np.asarray(cam.view[:3, :3])
                t = np.asarray(cam.view[:3, 3])
                R_rel = jnp.asarray((R @ R0.T)[None])
                t_rel = jnp.asarray((t - (R @ R0.T) @ t0)[None])
                rng, nrng = jax.random.split(rng)
                gen = trainer.generate(
                    state, feats, R_rel, t_rel, nrng,
                    num_steps=args.num_steps,
                    input_image=jnp.asarray(input_chw)
                    if cfg.concat_input_view else None)
                views.append(np.clip(np.asarray(gen[0]), 0, 1))

            cloud = optimize_3dgs(np.stack(views), poses, S,
                                  n_gaussians=args.n_gaussians,
                                  steps=args.fit_steps)

            rcfg = TileRendererConfig(max_per_tile=256)
            row = {"scene": p.stem, "per_view": []}
            for (el, az), a_deg, gt_hwc, cv in zip(poses, az_deg, gt, views):
                cam = Camera.from_pose(el, az, S)
                ren = np.asarray(render_tiled(
                    cloud.positions, cloud.scales, cloud.rotations,
                    cloud.colors, cloud.opacities, cam, config=rcfg))
                gt_chw = gt_hwc.transpose(2, 0, 1)
                row["per_view"].append({
                    "az": float(a_deg),
                    "fit_ssim": round(float(compute_ssim(ren, gt_chw)), 4),
                    "fit_psnr": round(float(compute_psnr(ren, gt_chw)), 2),
                    "cvs_ssim": round(float(compute_ssim(cv, gt_chw)), 4),
                    "cvs_psnr": round(float(compute_psnr(cv, gt_chw)), 2),
                })
            for k in ("fit_ssim", "fit_psnr", "cvs_ssim", "cvs_psnr"):
                row[k] = round(float(np.mean(
                    [v[k] for v in row["per_view"]])), 4)
            results["scenes"].append(row)
            print(json.dumps(row, indent=1), flush=True)

    for k in ("fit_ssim", "fit_psnr", "cvs_ssim", "cvs_psnr"):
        results[k] = round(float(np.mean(
            [r[k] for r in results["scenes"]])), 4)
    Path(args.out_json).write_text(json.dumps(results, indent=2))
    print(json.dumps({k: results[k] for k in
                      ("fit_ssim", "fit_psnr", "cvs_ssim", "cvs_psnr")}))


if __name__ == "__main__":
    main()
