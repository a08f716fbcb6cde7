"""CVS trainer: consistency training for one-step novel-view synthesis.

TPU rebuild of the reference trainer (reference: scripts/training/train_cvs.py,
models/consistency_view_synthesis.py:844-961):
  * ConsistencyLoss: L1 reconstruction + random-conv perceptual (the
    reference's perceptual_net is an UNTRAINED conv stack — parity kept) +
    EMA self-consistency (f(x_t) ≈ f_ema(x_{t-1}) via one Euler step);
  * EMA via optax.incremental_update;
  * progressive consistency-weight ramp (quality-aware schedule,
    reference: models/quality_aware_losses.py:107-151);
  * GaussianBootstrapDataset equivalent: orbit renders of random Gaussian
    clouds through the tiled rasterizer (the reference bootstraps from
    decoder outputs — garbage-in-garbage-out per experiment 001; synthetic
    clouds give clean geometry-consistent pairs).

Run:  python -m fresnel_tpu.train.train_cvs --synthetic --epochs 2 --image_size 64
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from pathlib import Path
from typing import Dict, Iterator, Optional

import numpy as np


class GaussianBootstrapDataset:
    """Synthetic multi-view pairs: (input view, features, relative pose,
    target view) rendered from random Gaussian clouds."""

    def __init__(self, n_scenes: int = 8, views_per_scene: int = 4,
                 image_size: int = 64, n_gaussians: int = 120, seed: int = 0,
                 feature_dim: int = 384):
        import jax.numpy as jnp
        from fresnel_tpu.core.camera import Camera
        from fresnel_tpu.core.gaussians import GaussianCloud
        from fresnel_tpu.models.encoders import create_feature_extractor
        from fresnel_tpu.render.tile import render_tiled

        self.image_size = image_size
        rng = np.random.default_rng(seed)
        extractor = create_feature_extractor(dim=feature_dim)
        self._samples = []
        for s in range(n_scenes):
            cloud = GaussianCloud.test_cloud(
                n_gaussians, seed=seed * 997 + s, spread=0.45, z_offset=0.0,
                scale=0.1)
            poses = [(0.0, 0.0)] + [
                (rng.uniform(-0.4, 0.6), rng.uniform(0, 2 * np.pi))
                for _ in range(views_per_scene - 1)]
            views, depths, mats = [], [], []
            for el, az in poses:
                cam = Camera.from_pose(el, az, image_size, distance=2.0)
                img, dep = render_tiled(cloud.positions, cloud.scales,
                                        cloud.rotations, cloud.colors,
                                        cloud.opacities, cam,
                                        return_depth=True)
                views.append(np.asarray(img))
                depths.append(np.asarray(dep))
                R = np.asarray(cam.view[:3, :3])
                t = np.asarray(cam.view[:3, 3])
                mats.append((R, t))
            feats = np.asarray(extractor(
                jnp.asarray(np.transpose(views[0], (1, 2, 0)))))
            for i in range(1, views_per_scene):
                R_rel = mats[i][0] @ mats[0][0].T
                t_rel = mats[i][1] - R_rel @ mats[0][1]
                self._samples.append({
                    "input_image": views[0],
                    "features": feats,
                    "R_rel": R_rel.astype(np.float32),
                    "t_rel": t_rel.astype(np.float32),
                    "target_image": views[i],
                    "target_depth": depths[i],
                })

    def __len__(self):
        return len(self._samples)

    def batches(self, batch_size: int, rng: np.random.Generator,
                shuffle: bool = True) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self._samples))
        if shuffle:
            rng.shuffle(order)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            idx = order[i : i + batch_size]
            keys = self._samples[0].keys()
            yield {k: np.stack([self._samples[j][k] for j in idx])
                   for k in keys}


class TeacherMultiviewDataset:
    """Photo-like multiview pairs from the quality campaign's teacher fits.

    The synthetic corpus (data/synthetic_corpus.py) is 2.5-D — frontal
    image + exact depth, not renderable from other angles — but its
    per-scene TEACHER fits (train/fit_teacher.py, SSIM ~0.985 Gaussian
    clouds in decoder head space) are true 3-D proxies.  Rendering each
    teacher cloud from orbit poses yields geometry-consistent, photo-like
    view pairs at full resolution — the closest a no-egress environment
    gets to the reference's real multi-view training data
    (reference: scripts/training/train_cvs.py dataset loading).

    Sample contract matches GaussianBootstrapDataset: input_image,
    features (DINOv2 grid of the input view), R_rel, t_rel, target_image,
    target_depth.
    """

    def __init__(self, data_dir: str = "data/corpus_v1",
                 image_size: int = 256, views_per_scene: int = 4,
                 max_scenes: Optional[int] = None, seed: int = 0,
                 el_range=(-0.15, 0.3), az_range=(-0.4, 0.4),
                 feature_dim: int = 384, cache: Optional[str] = None):
        import jax
        import jax.numpy as jnp

        # Disk cache: segmented runs (execution-cache RAM leak, T-026)
        # restart the process per segment; rebuilding ~10 min of orbit
        # renders each time would dominate.
        if cache and Path(cache).exists():
            with np.load(cache) as z:
                keys = ("input_image", "features", "R_rel", "t_rel",
                        "target_image", "target_depth")
                # Materialize each archive member ONCE — indexing the
                # NpzFile re-extracts the whole array per access, which
                # turns this loop into thousands of full-file reads.
                arrs = {k: z[k] for k in keys}
            n = arrs["input_image"].shape[0]
            self._samples = [
                {k: arrs[k][i] for k in keys} for i in range(n)]
            self.image_size = image_size
            return
        from fresnel_tpu.core.camera import Camera
        from fresnel_tpu.models.decoders import head_transform
        from fresnel_tpu.models.encoders import create_feature_extractor
        from fresnel_tpu.render.tile import TileRendererConfig, render_tiled
        from fresnel_tpu.train.fit_teacher import teacher_path

        self.image_size = image_size
        rng = np.random.default_rng(seed)
        extractor = create_feature_extractor(dim=feature_dim)
        rcfg = TileRendererConfig(max_per_tile=1024)

        @jax.jit
        def render_pose(cloud, el, az):
            cam = Camera.from_pose(el, az, image_size, distance=2.0)
            return render_tiled(cloud["positions"], cloud["scales"],
                                cloud["rotations"], cloud["colors"],
                                cloud["opacities"], cam, config=rcfg,
                                return_depth=True)

        pngs = sorted(Path(data_dir).glob("*.png"))
        scenes = [p for p in pngs if teacher_path(p).exists()]
        if max_scenes:
            scenes = scenes[:max_scenes]
        if not scenes:
            raise FileNotFoundError(
                f"no *_teacher.npz sidecars under {data_dir} — run "
                "python -m fresnel_tpu.train.fit_teacher first")

        self._samples = []
        for p in scenes:
            with np.load(teacher_path(p)) as t:
                raw, do = t["raw"], float(t["depth_offset"])
            dpath = p.with_name(p.stem + "_depth.bin")
            d = np.fromfile(dpath, np.float32)
            side = int(round(len(d) ** 0.5))
            depth = jnp.asarray(d.reshape(side, side))
            out = head_transform(jnp.asarray(raw)[None], depth[None],
                                 jnp.asarray(do))
            cloud = {k: out[k][0] for k in
                     ("positions", "scales", "rotations", "colors",
                      "opacities")}

            poses = [(0.0, 0.0)] + [
                (rng.uniform(*el_range), rng.uniform(*az_range))
                for _ in range(views_per_scene - 1)]
            views, depths, mats = [], [], []
            for el, az in poses:
                img, dep = render_pose(cloud, jnp.float32(el),
                                       jnp.float32(az))
                cam = Camera.from_pose(el, az, image_size, distance=2.0)
                views.append(np.asarray(img))
                depths.append(np.asarray(dep))
                mats.append((np.asarray(cam.view[:3, :3]),
                             np.asarray(cam.view[:3, 3])))
            feats = np.asarray(extractor(
                jnp.asarray(np.transpose(views[0], (1, 2, 0)))))
            for i in range(1, views_per_scene):
                R_rel = mats[i][0] @ mats[0][0].T
                t_rel = mats[i][1] - R_rel @ mats[0][1]
                self._samples.append({
                    "input_image": views[0],
                    "features": feats,
                    "R_rel": R_rel.astype(np.float32),
                    "t_rel": t_rel.astype(np.float32),
                    "target_image": views[i],
                    "target_depth": depths[i],
                })

        if cache:
            keys = self._samples[0].keys()
            np.savez(cache, **{k: np.stack([s[k] for s in self._samples])
                               for k in keys})

    def __len__(self):
        return len(self._samples)

    batches = GaussianBootstrapDataset.batches


class GTMultiviewDataset:
    """Exact-GT multiview pairs from corpus_v2's raytraced orbit views.

    corpus_v2 ships {scene}_views.npz sidecars: 8 raytraced views on the
    el=0, distance-2 orbit — the SAME camera convention as
    evaluation/novel_view_eval.py:render_views — so pairs carry exact
    relative poses and true 3-D targets.  This removes the teacher proxy's
    own fit error (~0.015 SSIM, T-023) from the training signal that
    TeacherMultiviewDataset tolerates; T-037 showed conditioning quality is
    CVS's binding constraint, so cleaner pairs are the next lever.

    Sample contract matches GaussianBootstrapDataset (input_image CHW,
    features (37,37,C) of the input view, R_rel/t_rel, target_image CHW).
    target_depth is all-zeros: corpus_v2 has no per-view GT depth; the
    quality-aware mask (Laplacian-based) degrades to uniform on it.
    """

    def __init__(self, data_dir: str = "data/corpus_v2",
                 image_size: int = 256, views_per_scene: int = 4,
                 max_scenes: Optional[int] = None, seed: int = 0,
                 feature_dim: int = 384, cache: Optional[str] = None):
        import jax.numpy as jnp

        if cache and Path(cache).exists():
            with np.load(cache) as z:
                keys = ("input_image", "features", "R_rel", "t_rel",
                        "target_image", "target_depth")
                arrs = {k: z[k] for k in keys}
            n = arrs["input_image"].shape[0]
            self._samples = [{k: arrs[k][i] for k in keys}
                             for i in range(n)]
            self.image_size = image_size
            return

        from fresnel_tpu.core.camera import Camera
        from fresnel_tpu.data.dataset import cache_paths
        from fresnel_tpu.models.encoders import create_feature_extractor

        self.image_size = image_size
        rng = np.random.default_rng(seed)
        extractor = None

        scenes = [p for p in sorted(Path(data_dir).glob("*.png"))
                  if p.with_name(p.stem + "_views.npz").exists()]
        if max_scenes:
            scenes = scenes[:max_scenes]
        if not scenes:
            raise FileNotFoundError(
                f"no *_views.npz sidecars under {data_dir} — generate "
                "corpus_v2 (cloud/make_corpus.sh) first")

        def _resize_hwc(img: np.ndarray, s: int) -> np.ndarray:
            import jax
            return np.asarray(jax.image.resize(
                jnp.asarray(img), (s, s, 3), method="linear"))

        zdepth = np.zeros((image_size, image_size), np.float32)
        self._samples = []
        for p in scenes:
            with np.load(p.with_name(p.stem + "_views.npz")) as z:
                views = z["images"].astype(np.float32) / 255.0  # (V,S,S,3)
                az_deg = z["azimuths_deg"].astype(np.float32)
            if views.shape[1] != image_size:
                views = np.stack([_resize_hwc(v, image_size)
                                  for v in views])
            frontal = int(np.argmin(np.abs(az_deg)))
            inp_hwc = views[frontal]

            feat_path = cache_paths(p, image_size, feature_dim)[1]
            if feat_path.exists():
                g = 37
                feats = np.fromfile(feat_path, np.float32).reshape(
                    g, g, feature_dim)
            else:
                if extractor is None:
                    extractor = create_feature_extractor(dim=feature_dim)
                feats = np.asarray(extractor(jnp.asarray(inp_hwc)))

            cams = [Camera.from_pose(0.0, float(np.radians(a)), image_size,
                                     distance=2.0) for a in az_deg]
            mats = [(np.asarray(c.view[:3, :3]), np.asarray(c.view[:3, 3]))
                    for c in cams]
            others = [i for i in range(len(az_deg)) if i != frontal]
            picks = rng.choice(len(others), size=min(views_per_scene - 1,
                                                     len(others)),
                               replace=False)
            for j in (others[k] for k in picks):
                R_rel = mats[j][0] @ mats[frontal][0].T
                t_rel = mats[j][1] - R_rel @ mats[frontal][1]
                self._samples.append({
                    "input_image": inp_hwc.transpose(2, 0, 1),
                    "features": feats,
                    "R_rel": R_rel.astype(np.float32),
                    "t_rel": t_rel.astype(np.float32),
                    "target_image": views[j].transpose(2, 0, 1),
                    "target_depth": zdepth,
                })

        if cache:
            keys = self._samples[0].keys()
            np.savez(cache, **{k: np.stack([s[k] for s in self._samples])
                               for k in keys})

    def __len__(self):
        return len(self._samples)

    batches = GaussianBootstrapDataset.batches


@dataclasses.dataclass
class CVSTrainConfig:
    output_dir: str = "checkpoints_cvs"
    epochs: int = 50
    batch_size: int = 2
    lr: float = 1e-4
    image_size: int = 64
    base_channels: int = 64
    lambda_consistency: float = 1.0
    lambda_reconstruction: float = 1.0
    lambda_perceptual: float = 0.5
    consistency_ramp_epochs: int = 10   # progressive consistency weight ramp
    use_quality_aware: bool = False     # depth-Laplacian quality masking
    use_amp: bool = False               # bf16 U-Net compute (fp32 master)
    concat_input_view: bool = False     # input view as extra U-Net channels
    ema_decay: float = 0.9999
    save_interval: int = 10
    seed: int = 0


class CVSTrainer:
    def __init__(self, cfg: CVSTrainConfig):
        from fresnel_tpu.models.cvs import CVSConfig, ConsistencyViewSynthesizer
        import flax.linen as nn
        import optax

        import jax.numpy as jnp

        self.cfg = cfg
        # use_amp -> bf16 computation dtype threaded through the U-Net
        # (flax casts params+activations per layer; master params stay fp32
        # and the output head is always fp32 — see models/cvs.py).
        self.model_config = CVSConfig(
            image_size=cfg.image_size, base_channels=cfg.base_channels,
            ema_decay=cfg.ema_decay,
            concat_input_view=cfg.concat_input_view,
            dtype=jnp.bfloat16 if cfg.use_amp else None)
        self.model = ConsistencyViewSynthesizer(self.model_config)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(1.0), optax.adamw(cfg.lr))
        self._perceptual = None
        self._step_fn = None
        self.history: Dict[str, list] = {}

    def _perceptual_net(self):
        """Untrained conv feature stack (reference parity)."""
        import flax.linen as nn

        class Perceptual(nn.Module):
            @nn.compact
            def __call__(self, x):          # (B, 3, H, W)
                x = x.transpose(0, 2, 3, 1)
                x = nn.relu(nn.Conv(64, (3, 3), padding="SAME")(x))
                x = nn.relu(nn.Conv(64, (3, 3), padding="SAME")(x))
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                x = nn.relu(nn.Conv(128, (3, 3), padding="SAME")(x))
                x = nn.relu(nn.Conv(128, (3, 3), padding="SAME")(x))
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                x = nn.relu(nn.Conv(256, (3, 3), padding="SAME")(x))
                return x

        return Perceptual()

    def init_state(self, batch):
        import jax
        import jax.numpy as jnp

        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed)
        B = 1
        S = cfg.image_size
        ii = jnp.asarray(batch["input_image"][:1])
        ft = jnp.asarray(batch["features"][:1])
        Rr = jnp.asarray(batch["R_rel"][:1])
        tr = jnp.asarray(batch["t_rel"][:1])
        ti = jnp.asarray(batch["target_image"][:1])
        params = self.model.init(
            rng, ii, ft, Rr, tr, target_image=ti,
            timestep=jnp.zeros((B,), jnp.int32),
            noise=jnp.zeros((B, 3, S, S)))
        perc = self._perceptual_net()
        perc_params = perc.init(jax.random.PRNGKey(1),
                                jnp.zeros((1, 3, S, S)))
        self._perc_apply = perc.apply
        opt_state = self.optimizer.init(params)
        return {"params": params, "ema_params": params,
                "opt_state": opt_state, "perc_params": perc_params,
                "step": jnp.zeros((), jnp.int32)}

    def _build_step(self):
        import jax
        import jax.numpy as jnp
        import optax

        cfg = self.cfg
        model = self.model
        optimizer = self.optimizer
        perc_apply = self._perc_apply
        nt = self.model_config.num_timesteps

        def loss_fn(params, ema_params, perc_params, batch, rng,
                    consistency_weight):
            B = batch["input_image"].shape[0]
            r1, r2 = jax.random.split(rng)
            timestep = jax.random.randint(r1, (B,), 0, nt)
            noise = jax.random.normal(
                r2, batch["target_image"].shape, jnp.float32)
            # Under use_amp the U-Net computes in bf16 via its dtype attr
            # (set at model construction); loss math here stays float32.
            out = model.apply(
                params, batch["input_image"], batch["features"],
                batch["R_rel"], batch["t_rel"],
                target_image=batch["target_image"],
                timestep=timestep, noise=noise, deterministic=False)

            ld = {}
            if cfg.use_quality_aware and "target_depth" in batch:
                from fresnel_tpu.losses.quality_aware import quality_mask
                qm = quality_mask(batch["target_depth"])
                l1 = jnp.mean(jnp.abs(out["x0_pred"] - out["target"])
                              * qm[:, None])
            else:
                l1 = jnp.mean(jnp.abs(out["x0_pred"] - out["target"]))
            ld["l1"] = l1 * cfg.lambda_reconstruction
            pf = perc_apply(perc_params, out["x0_pred"])
            tf = perc_apply(perc_params, out["target"])
            ld["perceptual"] = jnp.mean(jnp.abs(pf - tf)) * cfg.lambda_perceptual

            # Consistency: EMA prediction at the adjacent (earlier) timestep.
            sch = model.apply(params, method=model.schedule)
            t_prev = jnp.maximum(timestep - 1, 0)
            a_t = sch["sqrt_alphas_cumprod"][timestep][:, None, None, None]
            a_p = sch["sqrt_alphas_cumprod"][t_prev][:, None, None, None]
            x_t_prev = jnp.clip(
                a_p * out["x0_pred"]
                + (1 - a_p) / (1 - a_t + 1e-8) * (out["noisy"] - a_t * out["x0_pred"]),
                -1.0, 1.0)
            # EMA x0 prediction at t_prev, on x_t_prev DIRECTLY — the
            # reference calls ema_model.unet(x_t_prev, t_prev) with no
            # re-noising (consistency_view_synthesis.py:929-933).  The
            # earlier routing through the training path's add_noise scaled
            # x_t_prev by sqrt_alphas_cumprod[t_prev] (≈0 at high t),
            # pulling high-t predictions toward the unconditional mean.
            x0_ema = jax.lax.stop_gradient(model.apply(
                ema_params, batch["input_image"], batch["features"],
                batch["R_rel"], batch["t_rel"], x_t_prev, t_prev,
                method=model.predict_x0))
            ld["consistency"] = (jnp.mean((out["x0_pred"] - x0_ema) ** 2)
                                 * cfg.lambda_consistency * consistency_weight)

            total = ld["l1"] + ld["perceptual"] + ld["consistency"]
            ld["total"] = total
            return total, ld

        def step(state, batch, rng, consistency_weight):
            (loss, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state["params"], state["ema_params"], state["perc_params"],
                batch, rng, consistency_weight)
            grads_finite = jax.tree.reduce(
                jnp.logical_and,
                jax.tree.map(lambda g: jnp.all(jnp.isfinite(g)), grads),
                jnp.bool_(True))
            finite = jnp.isfinite(loss) & grads_finite
            grads = jax.tree.map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
            updates, new_opt = optimizer.update(
                grads, state["opt_state"], state["params"])
            new_params = optax.apply_updates(state["params"], updates)
            new_params = jax.tree.map(
                lambda n, o: jnp.where(finite, n, o),
                new_params, state["params"])
            new_ema = optax.incremental_update(
                new_params, state["ema_params"], 1.0 - cfg.ema_decay)
            return ({"params": new_params, "ema_params": new_ema,
                     "opt_state": new_opt, "perc_params": state["perc_params"],
                     "step": state["step"] + 1}, ld)

        # No buffer donation: triggered an INVALID_ARGUMENT on the current
        # libtpu with this program's aliasing pattern.
        return jax.jit(step)

    def fit(self, dataset, epochs: Optional[int] = None, state=None,
            log_fn=print, start_epoch: int = 0,
            stop_epoch: Optional[int] = None):
        """start_epoch continues the consistency-ramp schedule mid-run —
        long trainings must be split into resumed segments because the
        axon tunnel's execution cache leaks ~input-size host RAM/step."""
        import jax
        import jax.numpy as jnp

        cfg = self.cfg
        epochs = epochs or cfg.epochs
        nprng = np.random.default_rng(cfg.seed + start_epoch)
        rng = jax.random.PRNGKey(cfg.seed + 1 + start_epoch)
        first = next(iter(dataset.batches(cfg.batch_size, nprng)))
        if state is None:
            state = self.init_state(first)
        if self._step_fn is None:
            self._step_fn = self._build_step()

        out_dir = Path(cfg.output_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        last_epoch = epochs if stop_epoch is None else min(stop_epoch, epochs)
        for epoch in range(start_epoch, last_epoch):
            # Progressive consistency-weight ramp (staircase schedule when
            # quality-aware training is on, reference parity).
            if cfg.use_quality_aware:
                from fresnel_tpu.losses.quality_aware import (
                    consistency_weight_schedule)
                cw = consistency_weight_schedule(epoch, epochs)
            else:
                cw = min(1.0, (epoch + 1) / max(cfg.consistency_ramp_epochs, 1))
            t0 = time.perf_counter()
            losses: Dict[str, list] = {}
            for batch in dataset.batches(cfg.batch_size, nprng):
                jb = jax.tree.map(jnp.asarray, batch)
                rng, srng = jax.random.split(rng)
                state, ld = self._step_fn(state, jb, srng, jnp.float32(cw))
                for k, v in ld.items():
                    losses.setdefault(k, []).append(v)
            means = {k: float(jnp.mean(jnp.stack(v)))
                     for k, v in losses.items()}
            for k, v in means.items():
                self.history.setdefault(k, []).append(v)
            log_fn(f"epoch {epoch + 1}/{epochs} cw={cw:.2f} "
                   f"total={means['total']:.4f} l1={means['l1']:.4f} "
                   f"cons={means['consistency']:.4f} "
                   f"({time.perf_counter() - t0:.1f}s)")
            if (epoch + 1) % cfg.save_interval == 0:
                self.save_checkpoint(out_dir / "cvs.msgpack", state, epoch)
        if last_epoch >= epochs:
            self.save_checkpoint(out_dir / "cvs_final.msgpack", state,
                                 epochs - 1)
        else:      # segment boundary: guarantee a resume point
            self.save_checkpoint(out_dir / "cvs.msgpack", state,
                                 last_epoch - 1)
        (out_dir / "loss_history.json").write_text(json.dumps(self.history))
        return state

    def save_checkpoint(self, path, state, epoch):
        import flax.serialization as ser

        Path(path).write_bytes(ser.to_bytes(state))
        Path(str(path) + ".json").write_text(json.dumps(
            {"epoch": epoch, "config": dataclasses.asdict(self.cfg)}))

    def generate(self, state, features, R_rel, t_rel, rng, num_steps=1,
                 input_image=None):
        import jax
        import jax.numpy as jnp

        B = features.shape[0]
        S = self.cfg.image_size
        noise = jax.random.normal(rng, (B, 3, S, S))
        return self.model.apply(
            state["ema_params"], features, R_rel, t_rel, noise,
            num_steps, method=self.model.generate, input_image=input_image)


def main(argv=None):
    from fresnel_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser(description="CVS consistency training (TPU)")
    p.add_argument("--output_dir", default="checkpoints_cvs")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--base_channels", type=int, default=64)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--data_dir", default=None,
                   help="corpus dir with *_teacher.npz sidecars -> train "
                        "on TeacherMultiviewDataset orbit pairs instead "
                        "of the synthetic bootstrap clouds")
    p.add_argument("--gt_multiview", action="store_true",
                   help="train on corpus_v2's raytraced exact-GT orbit "
                        "pairs ({scene}_views.npz) instead of teacher-fit "
                        "renders — true 3-D targets, exact poses")
    p.add_argument("--views_per_scene", type=int, default=4)
    p.add_argument("--max_scenes", type=int, default=None)
    p.add_argument("--dataset_cache", default=None,
                   help="npz path to save/load the built multiview pairs "
                        "(segmented runs rebuild the process)")
    p.add_argument("--use_quality_aware", action="store_true")
    p.add_argument("--use_amp", action="store_true",
                   help="bf16 U-Net compute (fp32 master weights)")
    p.add_argument("--concat_input_view", action="store_true",
                   help="feed the input view as 3 extra U-Net input "
                        "channels (stronger conditioning than the "
                        "reference's cross-attention-only design; T-034)")
    p.add_argument("--n_scenes", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint to continue from (epoch schedule "
                        "resumes after the saved epoch)")
    p.add_argument("--stop_epoch", type=int, default=None,
                   help="run only up to this epoch (exclusive) — "
                        "segmented long runs (T-026 RAM leak)")
    args = p.parse_args(argv)

    cfg = CVSTrainConfig(
        output_dir=args.output_dir, epochs=args.epochs,
        batch_size=args.batch_size, lr=args.lr, image_size=args.image_size,
        base_channels=args.base_channels,
        use_quality_aware=args.use_quality_aware, use_amp=args.use_amp,
        concat_input_view=args.concat_input_view, seed=args.seed)
    if args.gt_multiview:
        dataset = GTMultiviewDataset(
            args.data_dir or "data/corpus_v2", image_size=cfg.image_size,
            views_per_scene=args.views_per_scene,
            max_scenes=args.max_scenes, seed=cfg.seed,
            cache=args.dataset_cache)
    elif args.data_dir:
        dataset = TeacherMultiviewDataset(
            args.data_dir, image_size=cfg.image_size,
            views_per_scene=args.views_per_scene,
            max_scenes=args.max_scenes, seed=cfg.seed,
            cache=args.dataset_cache)
    else:
        dataset = GaussianBootstrapDataset(
            n_scenes=args.n_scenes, image_size=cfg.image_size, seed=cfg.seed)
    print(f"dataset: {len(dataset)} view pairs")

    trainer = CVSTrainer(cfg)
    state, start_epoch = None, 0
    if args.resume:
        import flax.serialization as ser

        nprng = np.random.default_rng(cfg.seed)
        first = next(iter(dataset.batches(cfg.batch_size, nprng)))
        template = trainer.init_state(first)
        state = ser.from_bytes(template, Path(args.resume).read_bytes())
        meta = json.loads(Path(args.resume + ".json").read_text())
        start_epoch = meta.get("epoch", -1) + 1
        print(f"resumed from {args.resume} (continuing at {start_epoch})")
    trainer.fit(dataset, state=state, start_epoch=start_epoch,
                stop_epoch=args.stop_epoch)
    print("cvs training complete")


if __name__ == "__main__":
    main()
