"""Training harness: jitted train step, HFTS scheduling, checkpoints.

The TPU rebuild of the reference's training loop (reference:
scripts/training/train_gaussian_decoder.py:1031-1290, 2012-2058).  The
reference's per-sample and per-Gaussian Python hot loops (SURVEY.md §3.1)
collapse into ONE jit-compiled step: decoder forward -> (optional stochastic-K
subsample) -> vmapped tile rasterization -> fused loss -> AdamW update, with
the gradient all-reduce over a data mesh when more than one device is used.

Parity features:
  * AdamW + cosine LR schedule, global-norm grad clip 1.0;
  * NaN guard: non-finite loss skips the update (jnp.where, no host sync);
  * HFTS: multi-resolution training, progressive K (one compile per K),
    opacity-importance stochastic-K via Gumbel top-k (without replacement);
  * multi-pose augmentation with traced orbit cameras and frontal_prob;
  * learnable HFGS wavelengths live in the optimized pytree — and ARE
    checkpointed (the reference documented losing them,
    experiments/005-phase-retrieval/results.md:108);
  * periodic + best checkpoints, loss-history JSON.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fresnel_tpu.core.camera import Camera
from fresnel_tpu.losses.aggregate import compute_losses
from fresnel_tpu.losses.physics import init_learnable_wavelengths
from fresnel_tpu.losses.ssim import ssim
from fresnel_tpu.models.blocks import tensegrity_loss
from fresnel_tpu.physics.fresnel_zones import FresnelZones
from fresnel_tpu.render.factory import select_training_renderer
from fresnel_tpu.train.config import (
    HFGSConfig, HFTSConfig, PhysicsConfig, TrainingConfig)


def build_decoder(config: TrainingConfig, physics_config: PhysicsConfig):
    """Experiment -> decoder module (reference experiment numbering:
    1=SAAGRefinement, 2=DirectPatch, 3=FeatureGuidedSAAG, 4=Fibonacci,
    5=NCA)."""
    common = dict(
        feature_dim=config.feature_dim,
        gaussians_per_patch=config.gaussians_per_patch,
    )
    head_bias = dict(
        scale_bias=getattr(config, "scale_bias", 0.0),
        opacity_bias=getattr(config, "opacity_bias", 0.0),
    )
    if config.experiment == 2:
        if physics_config.use_wave_rendering and not config.use_phase_output:
            from fresnel_tpu.models.decoders import PhysicsDirectPatchDecoder
            return PhysicsDirectPatchDecoder(
                wavelength=physics_config.wavelength,
                learnable_wavelength=physics_config.learnable_wavelength,
                focal_depth=physics_config.focal_depth,
                use_diffraction_placement=physics_config.use_diffraction_placement,
                **head_bias, **common)
        from fresnel_tpu.models.decoders import DirectPatchDecoder
        return DirectPatchDecoder(
            use_fresnel_zones=config.use_fresnel_zones,
            num_fresnel_zones=config.num_fresnel_zones,
            use_edge_aware=config.use_edge_aware,
            use_phase_output=config.use_phase_output,
            edge_scale_factor=config.edge_scale_factor,
            edge_opacity_boost=config.edge_opacity_boost,
            use_pose_encoding=config.use_pose_encoding,
            use_depth_fusion=config.use_depth_fusion,
            depth_feature_dim=config.depth_feature_dim,
            depth_z_scale=getattr(config, "depth_z_scale", -2.0),
            z_offset_scale=getattr(config, "z_offset_scale", 0.0),
            feature_upsample=getattr(config, "feature_upsample", 1),
            **head_bias, **common)
    if config.experiment == 4:
        from fresnel_tpu.models.fibonacci import FibonacciPatchDecoder
        return FibonacciPatchDecoder(
            feature_dim=config.feature_dim,
            n_points=config.n_spiral_points,
            use_fresnel_zones=config.use_fresnel_zones,
            num_fresnel_zones=config.num_fresnel_zones,
            use_phase_output=config.use_phase_output,
            use_pose_encoding=config.use_pose_encoding,
            **head_bias,
        )
    if config.experiment == 5:
        from fresnel_tpu.models.nca import NCAGaussianDecoder
        return NCAGaussianDecoder(
            feature_dim=config.feature_dim,
            n_points=config.n_spiral_points,
            n_steps=config.nca_steps,
            k_neighbors=config.nca_neighbors,
            step_size=config.nca_step_size,
        )
    if config.experiment == 1:
        from fresnel_tpu.models.saag_refine import SAAGRefinementNet
        return SAAGRefinementNet(feature_dim=config.feature_dim)
    if config.experiment == 3:
        from fresnel_tpu.models.saag_refine import FeatureGuidedSAAG
        return FeatureGuidedSAAG(feature_dim=config.feature_dim)
    raise ValueError(f"unknown experiment {config.experiment}")


SAAG_SUBSAMPLE = 8  # depth subsample for in-loop SAAG priors (exp 1/3)


def saag_prior_from_depth(depth: jax.Array, subsample: int = SAAG_SUBSAMPLE):
    """(B, H, W) depth -> batched base-only SAAG cloud dict (B, N, ...).

    Used as the geometric prior for experiments 1/3.  The reference trains
    those experiments against a RANDOM dummy SAAG
    (train_gaussian_decoder.py:1104-1151); we feed the real SAAG computed
    from the batch depth — the architecturally intended input.
    """
    from fresnel_tpu.geometry.saag import (
        AdaptiveDensityParams, SilhouetteWrapParams, SurfaceGaussianParams,
        VolumetricShellParams, pointcloud_from_depth, to_surface_gaussians)

    def one(d):
        pc = pointcloud_from_depth(d, depth_scale=2.0,
                                   subsample=subsample).normalize(3.0)
        g = to_surface_gaussians(
            pc, d, params=SurfaceGaussianParams(base_size=0.05),
            wrap_params=SilhouetteWrapParams(enabled=False),
            shell_params=VolumetricShellParams(enabled=False),
            density_params=AdaptiveDensityParams(enabled=False))
        return g

    g = jax.vmap(one)(depth)
    return {"saag_positions": g.positions, "saag_scales": g.scales,
            "saag_rotations": g.rotations, "saag_colors": g.colors,
            "saag_opacities": g.opacities}


def save_loss_plots(history: Dict[str, list], path) -> bool:
    """4-panel loss plots (reference parity:
    train_gaussian_decoder.py:1317-1396).  No-op without matplotlib."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return False
    keys = [k for k in ("total", "rgb", "ssim", "depth") if k in history]
    if not keys:
        return False
    fig, axes = plt.subplots(2, 2, figsize=(10, 7))
    for ax, k in zip(axes.ravel(), keys):
        ax.plot(history[k])
        ax.set_title(k)
        ax.set_xlabel("epoch")
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=90)
    plt.close(fig)
    return True


def gumbel_topk_indices(rng: jax.Array, weights: jax.Array, k: int) -> jax.Array:
    """Sample k indices without replacement, probability ∝ weights
    (Gumbel-top-k trick) — the static-shape replacement for
    torch.multinomial(replacement=False)."""
    logp = jnp.log(jnp.maximum(weights, 1e-12))
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(rng, weights.shape, minval=1e-9, maxval=1.0)))
    return jax.lax.top_k(logp + gumbel, k)[1]


@dataclasses.dataclass
class Trainer:
    config: TrainingConfig
    physics_config: PhysicsConfig = dataclasses.field(default_factory=PhysicsConfig)
    hfgs_config: HFGSConfig = dataclasses.field(default_factory=HFGSConfig)
    hfts_config: HFTSConfig = dataclasses.field(default_factory=HFTSConfig)
    lpips: Optional[Tuple[Callable, Any]] = None   # (apply_fn, params)

    def __post_init__(self):
        cfg = self.config
        self.model = build_decoder(cfg, self.physics_config)
        self.encoder = None
        if getattr(cfg, "train_encoder", False):
            from fresnel_tpu.models.image_encoder import ImageEncoder
            self.encoder = ImageEncoder(
                feature_dim=cfg.feature_dim, grid=cfg.feature_size,
                width=cfg.encoder_width,
                attn_pool=getattr(cfg, "encoder_attn_pool", 1))
        self.renderer = select_training_renderer(
            cfg, self.physics_config, self.hfgs_config)
        self.train_res = self.hfts_config.get_effective_train_resolution(
            cfg.image_size)
        self.camera = Camera.default_training(self.train_res)
        self.fresnel_zones = (FresnelZones(num_zones=cfg.num_fresnel_zones)
                              if cfg.boundary_weight > 0 else None)
        self._steps: Dict[Any, Callable] = {}
        self.history: Dict[str, list] = {}

        # Optimizer: AdamW + cosine decay + global-norm clip.
        total_steps = max(cfg.epochs, 1) * 100  # refined by fit() when known
        self._make_optimizer(total_steps)

    def _make_optimizer(self, total_steps: int):
        cfg = self.config
        schedule = (cfg.lr if getattr(cfg, "lr_schedule", "cosine")
                    == "constant"
                    else optax.cosine_decay_schedule(cfg.lr,
                                                     max(total_steps, 1)))
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(schedule, weight_decay=cfg.weight_decay),
        )

    # ------------------------------------------------------------------
    def init_state(self, sample_batch: Dict[str, np.ndarray],
                   rng: Optional[jax.Array] = None) -> Dict[str, Any]:
        rng = jax.random.PRNGKey(self.config.seed) if rng is None else rng
        depth = jnp.asarray(sample_batch["depth"][:1])
        el = az = jnp.zeros((1,))
        enc_params = None
        if self.encoder is not None:
            rng, rng_enc = jax.random.split(rng)
            img = sample_batch.get("image")
            if img is None:      # infer-time template without an image
                img = np.zeros((1, 3, self.config.image_size,
                                self.config.image_size), np.float32)
            img = jnp.asarray(img[:1])
            enc_params = self.encoder.init(rng_enc, img)
            feats = self.encoder.apply(enc_params, img)
        else:
            feats = jnp.asarray(sample_batch["features"][:1])
        if self.config.experiment == 1:
            saag = saag_prior_from_depth(depth)
            model_params = self.model.init(rng, feats, **saag)
        elif self.config.experiment == 3:
            model_params = self.model.init(rng, feats)
        else:
            kwargs = {}
            if (self.config.use_pose_encoding
                    or self.config.multi_pose_augmentation):
                kwargs = dict(elevation=el, azimuth=az)
            model_params = self.model.init(rng, feats, depth, **kwargs)
        params = {"model": model_params}
        if enc_params is not None:
            params["encoder"] = enc_params
        if self.hfgs_config.learnable_wavelengths:
            params["wavelengths_raw"] = init_learnable_wavelengths()
        if (self.fresnel_zones is not None
                and getattr(self.config, "learnable_boundary_emphasis",
                            False)):
            # Reference parity: fresnel_zones.py:94 declares this parameter
            # (ones-init, one per zone boundary) — here it actually trains
            # through the boundary loss (see FresnelZones.boundary_mask).
            params["boundary_emphasis"] = jnp.ones(
                self.config.num_fresnel_zones + 1, jnp.float32)
        opt_state = self.optimizer.init(params)
        return {"params": params, "opt_state": opt_state,
                "step": jnp.zeros((), jnp.int32)}

    # ------------------------------------------------------------------
    def _build_step(self, K: int, stochastic_k: Optional[int]) -> Callable:
        cfg = self.config
        model = self.model
        renderer = self.renderer
        camera = self.camera
        res = self.train_res
        pcfg, hcfg = self.physics_config, self.hfgs_config
        zones = self.fresnel_zones
        multi_pose = cfg.multi_pose_augmentation
        el_lo, el_hi = np.radians(cfg.pose_range_elevation)
        az_lo, az_hi = np.radians(cfg.pose_range_azimuth)

        lpips_fn, lpips_params = (self.lpips if self.lpips is not None
                                  else (None, None))

        # Raw-head distillation (fit_teacher.py sidecars): DirectPatch
        # (exp 2, grid head space) and Fibonacci (exp 4, spiral head
        # space) — the physics variant's head differs.
        distill_on = (cfg.distill_weight > 0
                      and cfg.experiment in (2, 4)
                      and not (pcfg is not None and pcfg.use_wave_rendering
                               and not cfg.use_phase_output))

        # Capacity telemetry (VERDICT r2 weak #6): the tiled renderer's
        # static max_per_tile cap silently drops gradients at overflow; the
        # reference's per-pixel loop has no cap, so the dropped fraction is
        # the exact size of the deviation.  Tracked per step, logged per
        # epoch.  Only the tile renderer bins (wave/fourier/dense do not).
        track_overflow = getattr(renderer, "supports_overflow", False)

        def render_one(p, s, r, c, o, ph, cam):
            if track_overflow:
                img, dep, ovf = renderer(p, s, r, c, o, cam, phases=ph,
                                         return_depth=True,
                                         return_overflow=True)
            else:
                img, dep = renderer(p, s, r, c, o, cam, phases=ph,
                                    return_depth=True)
                ovf = jnp.zeros((4,), jnp.int32)
            return img, dep, ovf

        encoder = self.encoder

        def loss_fn(params, batch, rng):
            depth = batch["depth"]
            target = batch["image"]
            if encoder is not None:
                # End-to-end: features come from the trainable encoder on
                # the batch image (bf16 under --use_amp like the decoder);
                # gradients flow through the whole image->Gaussians program.
                from fresnel_tpu.utils.precision import amp_apply
                feats = amp_apply(encoder.apply, params["encoder"], target,
                                  use_amp=cfg.use_amp)
            else:
                feats = batch["features"]
            B = feats.shape[0]
            if target.shape[-1] != res:
                target = jax.image.resize(target, (B, 3, res, res), "linear")
            target_depth = jax.image.resize(depth, (B, res, res), "linear")

            rng_pose, rng_drop, rng_k = jax.random.split(rng, 3)
            if multi_pose:
                r1, r2, r3 = jax.random.split(rng_pose, 3)
                el = jax.random.uniform(r1, (B,), minval=el_lo, maxval=el_hi)
                az = jax.random.uniform(r2, (B,), minval=az_lo, maxval=az_hi)
                frontal = jax.random.uniform(r3, (B,)) < cfg.frontal_prob
                el = jnp.where(frontal, 0.0, el)
                az = jnp.where(frontal, 0.0, az)
            else:
                el = az = jnp.zeros((B,))

            # bf16 mixed precision: decoder matmuls run on the MXU in
            # bfloat16 (params/inputs cast inside the differentiated fn, so
            # grads come back float32 against the float32 master params);
            # SAAG geometry, rendering, and losses stay float32.
            from fresnel_tpu.utils.precision import amp_apply

            def apply_amp(p, *a, **kw):
                return amp_apply(model.apply, p, *a, use_amp=cfg.use_amp, **kw)

            rngs = {"dropout": rng_drop}
            if cfg.experiment == 1:
                saag = saag_prior_from_depth(depth)
                out = apply_amp(params["model"], feats, **saag,
                                deterministic=False, rngs=rngs)
            elif cfg.experiment == 3:
                saag = saag_prior_from_depth(depth)
                mods = apply_amp(params["model"], feats)
                # Reference training applies the patch-mean modulations
                # globally (train_gaussian_decoder.py:1140-1151).
                size_m = jnp.mean(mods["base_size_mult"], axis=(1, 2))
                op_m = jnp.mean(mods["opacity_mult"], axis=(1, 2))
                out = {
                    "positions": saag["saag_positions"],
                    "scales": saag["saag_scales"] * size_m[:, None, None],
                    "rotations": saag["saag_rotations"],
                    "colors": saag["saag_colors"],
                    "opacities": jnp.clip(
                        saag["saag_opacities"] * op_m[:, None], 0.0, 1.0),
                }
            else:
                kwargs: Dict[str, Any] = dict(num_gaussians=K)
                if multi_pose or cfg.use_pose_encoding:
                    kwargs.update(elevation=el, azimuth=az)
                if cfg.experiment == 5:
                    rngs["nca"] = jax.random.fold_in(rng_drop, 1)
                if distill_on:
                    kwargs["return_raw"] = True
                out = apply_amp(params["model"], feats, depth,
                                deterministic=False, rngs=rngs, **kwargs)

            phases = out.get("phases")
            pos, sc, rot = out["positions"], out["scales"], out["rotations"]
            col, op = out["colors"], out["opacities"]

            if stochastic_k is not None and stochastic_k < pos.shape[1]:
                importance = jax.lax.stop_gradient(jnp.mean(op, axis=0)) + 1e-6
                idx = gumbel_topk_indices(
                    rng_k, importance / jnp.sum(importance), stochastic_k)
                pos, sc, rot = pos[:, idx], sc[:, idx], rot[:, idx]
                col, op = col[:, idx], op[:, idx]
                if phases is not None:
                    phases = phases[:, idx]

            if multi_pose:
                cams = jax.vmap(
                    lambda e, a: Camera.from_pose(e, a, res))(el, az)
                render_v = jax.vmap(render_one)
                if phases is None:
                    imgs, rdepth, ovf = jax.vmap(
                        lambda p, s, r, c, o, cam: render_one(
                            p, s, r, c, o, None, cam))(pos, sc, rot, col, op, cams)
                else:
                    imgs, rdepth, ovf = render_v(pos, sc, rot, col, op, phases, cams)
            else:
                if phases is None:
                    imgs, rdepth, ovf = jax.vmap(
                        lambda p, s, r, c, o: render_one(
                            p, s, r, c, o, None, camera))(pos, sc, rot, col, op)
                else:
                    imgs, rdepth, ovf = jax.vmap(
                        lambda p, s, r, c, o, ph: render_one(
                            p, s, r, c, o, ph, camera))(pos, sc, rot, col, op, phases)

            if track_overflow:
                # (B, 4) int32 [dropped, total_pairs, overflow_tiles, max].
                n_tiles = (-(-res // 16)) ** 2
                ovf_sum = jnp.sum(ovf, axis=0).astype(jnp.float32)

            wl_raw = params.get("wavelengths_raw")
            total, ld = compute_losses(
                imgs, target,
                rendered_depth=rdepth, target_depth=target_depth,
                residuals=out.get("residuals"),
                config=cfg,
                lpips_fn=lpips_fn, lpips_params=lpips_params,
                vlm_density=batch.get("vlm_density"),
                physics_config=pcfg, hfgs_config=hcfg,
                learnable_wavelengths_raw=wl_raw,
                fresnel_zones=zones,
                boundary_emphasis=params.get("boundary_emphasis"))

            if track_overflow:
                ld["overflow_dropped_frac"] = (
                    ovf_sum[0] / jnp.maximum(ovf_sum[1], 1.0))
                ld["overflow_tiles_frac"] = (
                    ovf_sum[2] / (ovf.shape[0] * n_tiles))
                ld["overflow_max_tile_hits"] = jnp.max(ovf[:, 3]).astype(
                    jnp.float32)

            if cfg.view_weight > 0 and "view_gt" in batch:
                # View-aware supervision (corpus_v2 GT orbit views): render
                # the SAME canonical cloud from one randomly sampled
                # non-frontal GT azimuth per sample and score it against
                # the raytraced ground truth.  The reference's exp-011
                # could only supervise side views indirectly (no GT);
                # corpus_v2 makes this a direct render loss.  The random
                # view is selected per sample on HOST (_device_batch) so
                # only (B, 3, S, S) crosses the tunnel — shipping the full
                # (B, V, 3, S, S) stack was ~50 MB/step at B=8.
                gt = batch["view_gt"]                         # (B, 3, S, S)
                if gt.shape[-1] != res:
                    gt = jax.image.resize(gt, (B, 3, res, res), "linear")
                az_v = jnp.radians(batch["view_az_deg"])      # (B,)
                cams_v = jax.vmap(
                    lambda a: Camera.from_pose(0.0, a, res))(az_v)
                imgs_v, _, ovf_v = jax.vmap(
                    lambda p, s, r, c, o, cam: render_one(
                        p, s, r, c, o, None, cam))(pos, sc, rot, col, op,
                                                   cams_v)
                v_l1 = jnp.mean(jnp.abs(imgs_v - gt))
                v_ssim = 1.0 - ssim(jnp.clip(imgs_v, 0.0, 1.0), gt,
                                    data_range=1.0)
                v_loss = v_l1 + cfg.ssim_weight * v_ssim
                ld["view"] = v_loss
                total = total + cfg.view_weight * v_loss
                ld["total"] = total
                if track_overflow:
                    ovf_v_sum = jnp.sum(ovf_v, axis=0).astype(jnp.float32)
                    ld["view_overflow_dropped_frac"] = (
                        ovf_v_sum[0] / jnp.maximum(ovf_v_sum[1], 1.0))

            if distill_on and "teacher_raw" in batch:
                # Teacher raws were fit with zero head biases; shift the
                # targets so biased heads still match in raw space.
                # K slice on axis -2 covers both teacher layouts:
                # exp 2 (B, g, g, Kt, 16) and exp 4 (B, N, Kt, 16).
                t_raw = batch["teacher_raw"][..., :K, :]
                adj = (jnp.zeros((16,), jnp.float32)
                       .at[3:6].add(-cfg.scale_bias)
                       .at[15].add(-cfg.opacity_bias))
                # Teachers are 16-wide (no phase head); with
                # use_phase_output the decoder raw is (..., 19) — the phase
                # channels have no teacher, so distill only the first 16.
                diff = out["raw"][..., :16] - (t_raw + adj)
                # Grouped weights balance the raw channel magnitudes:
                # xy offsets (world/0.25), log-ish scales, 6D rot, color
                # logits (up to +-6.9 saturated), opacity logit.
                gw = jnp.asarray([1.0] * 3 + [0.5] * 3 + [0.3] * 6
                                 + [0.25] * 3 + [0.5], jnp.float32)
                huber = jnp.where(jnp.abs(diff) < 1.0,
                                  0.5 * diff * diff,
                                  jnp.abs(diff) - 0.5)
                d_raw = jnp.mean(huber * gw)
                do_model = params["model"]["params"]["depth_offset"]
                d_do = jnp.mean((do_model - batch["teacher_do"]) ** 2)
                d_total = d_raw + d_do
                scale = batch.get("distill_scale", jnp.float32(1.0))
                ld["distill"] = d_total
                total = total + cfg.distill_weight * scale * d_total
                ld["total"] = total

            if cfg.use_tensegrity_loss:
                # Bound the O(N^2) kNN to a fixed 512-point subsample.
                n = pos.shape[1]
                sub = pos[:, :: max(1, n // 512)][:, :512]
                t_l = tensegrity_loss(sub)
                ld["tensegrity"] = t_l
                total = total + cfg.tensegrity_weight * t_l
                ld["total"] = total
            return total, ld

        optimizer = self.optimizer

        def train_step(state, batch, rng):
            (loss, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state["params"], batch, rng)
            # Guard BOTH loss and gradients: a single inf/NaN grad leaf with
            # a finite loss still poisons every parameter through
            # clip_by_global_norm (inf norm -> 0 * inf = NaN updates).
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
            # NaN guard: keep old params/opt_state on non-finite loss.
            new_params = jax.tree.map(
                lambda new, old: jnp.where(finite, new, old),
                new_params, state["params"])
            new_opt = jax.tree.map(
                lambda new, old: jnp.where(finite, new, old),
                new_opt, state["opt_state"])
            return ({"params": new_params, "opt_state": new_opt,
                     "step": state["step"] + 1}, ld)

        return jax.jit(train_step, donate_argnums=(0,))

    def get_step(self, K: int, stochastic_k: Optional[int]) -> Callable:
        key = (K, stochastic_k)
        if key not in self._steps:
            self._steps[key] = self._build_step(K, stochastic_k)
        return self._steps[key]

    # ------------------------------------------------------------------
    def _device_batch(self, batch: Dict[str, np.ndarray],
                      nprng: np.random.Generator) -> Dict[str, jax.Array]:
        """Host-side batch prep before the device transfer.

        The corpus_v2 GT-views stack is (B, V, 3, S, S) ≈ 50 MB/step at
        B=8 — pathological over the tunneled TPU link.  It never goes to
        the device: when the view loss is on, ONE random non-frontal view
        per sample is selected here (numpy) and shipped as (B, 3, S, S)
        `view_gt` + its azimuth `view_az_deg`; otherwise views are simply
        dropped."""
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k not in ("views", "view_azimuths_deg")}
        if self.config.view_weight > 0 and "views" in batch:
            v = batch["views"]                      # (B, V, 3, S, S)
            B, V = v.shape[:2]
            vidx = nprng.integers(1, V, size=B)     # skip frontal (idx 0)
            jb["view_gt"] = jnp.asarray(v[np.arange(B), vidx])
            jb["view_az_deg"] = jnp.asarray(
                np.asarray(batch["view_azimuths_deg"], np.float32)[vidx])
        return jb

    # ------------------------------------------------------------------
    def fit(self, dataset, epochs: Optional[int] = None,
            state: Optional[Dict] = None, log_fn: Callable = print,
            mesh=None, start_epoch: int = 0,
            stop_epoch: Optional[int] = None) -> Dict:
        """start_epoch/stop_epoch run a SEGMENT of the full schedule: HFTS
        progressive K, the distill decay, the cosine lr span, and
        checkpoint numbering all follow the full `epochs`, while only
        [start_epoch, stop_epoch) executes (needed because the axon
        tunnel's execution cache leaks ~input-size host RAM per step, so
        long runs must be split into resumed segments)."""
        cfg = self.config
        epochs = cfg.epochs if epochs is None else epochs
        nprng = np.random.default_rng(cfg.seed)
        rng = jax.random.PRNGKey(cfg.seed + 1)

        steps_per_epoch = max(1, len(dataset) // cfg.batch_size)
        self._make_optimizer(epochs * steps_per_epoch)

        first = next(iter(dataset.batches(cfg.batch_size, nprng)))
        if cfg.distill_weight > 0 and "teacher_raw" not in first:
            raise ValueError(
                "distill_weight > 0 but the dataset has no teacher "
                "sidecars — generate them first: python -m "
                "fresnel_tpu.train.fit_teacher --data_dir <data_dir>")
        # SAAG prior point count follows the ACTUAL depth-cache side, not a
        # hardcoded 256 (a differently sized cache would silently mis-size
        # stochastic-K for experiments 1/3).
        self._depth_side = int(first["depth"].shape[-1])
        if state is None:
            state = self.init_state(first)
            if getattr(cfg, "depth_offset_init", None) is not None:
                state["params"]["model"]["params"]["depth_offset"] = (
                    jnp.asarray(float(cfg.depth_offset_init), jnp.float32))
                log_fn(f"depth_offset initialized at "
                       f"{cfg.depth_offset_init:.3f}")
            elif cfg.distill_weight > 0 and "teacher_do" in first:
                # Adam moves a scalar ~lr per step, so the global
                # depth_offset (init -2.0) cannot traverse to the teacher
                # consensus (~-0.13) within a run — and a wrong offset
                # shifts the whole cloud's depth range, which alone
                # produces mush renders regardless of the (fast-converging)
                # raw regression.  Start the scalar at the regression
                # target's mean instead.
                do0 = float(np.mean(first["teacher_do"]))
                state["params"]["model"]["params"]["depth_offset"] = (
                    jnp.asarray(do0, jnp.float32))
                log_fn(f"distill: depth_offset initialized at teacher "
                       f"mean {do0:.3f}")
            if mesh is not None:
                from fresnel_tpu.parallel.mesh import replicate
                state = replicate(state, mesh)

        out_dir = Path(cfg.output_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        best_loss = float("inf")

        last_epoch = epochs if stop_epoch is None else min(stop_epoch, epochs)
        for epoch in range(start_epoch, last_epoch):
            K = self.hfts_config.get_gaussians_per_patch(
                epoch, epochs, cfg.gaussians_per_patch)
            n_total = self._total_gaussians(K)
            sk = self.hfts_config.get_stochastic_k(n_total)
            sk = None if sk >= n_total else sk
            step_fn = self.get_step(K, sk)

            t0 = time.perf_counter()
            epoch_losses: Dict[str, list] = {}
            for batch in dataset.batches(cfg.batch_size, nprng):
                jb = self._device_batch(batch, nprng)
                if cfg.distill_weight > 0:
                    dec = cfg.distill_decay_epochs
                    jb["distill_scale"] = jnp.float32(
                        1.0 if dec <= 0 else max(0.0, 1.0 - epoch / dec))
                if mesh is not None:
                    from fresnel_tpu.parallel.mesh import shard_batch
                    jb = shard_batch(jb, mesh)
                rng, step_rng = jax.random.split(rng)
                state, ld = step_fn(state, jb, step_rng)
                for k, v in ld.items():
                    epoch_losses.setdefault(k, []).append(v)

            # One host sync per epoch.
            means = {k: float(jnp.mean(jnp.stack(v)))
                     for k, v in epoch_losses.items()}
            dt = time.perf_counter() - t0
            for k, v in means.items():
                self.history.setdefault(k, []).append(v)
            ovf_str = ""
            if "overflow_dropped_frac" in means:
                ovf_str = (f" ovf={means['overflow_dropped_frac']:.3f}"
                           f"/{means['overflow_tiles_frac']:.3f}"
                           f" max={means['overflow_max_tile_hits']:.0f}")
            log_fn(f"epoch {epoch + 1}/{epochs} K={K} sk={sk} "
                   f"loss={means.get('total', float('nan')):.4f} "
                   f"({dt:.1f}s, {steps_per_epoch / max(dt, 1e-9):.2f} it/s)"
                   + ovf_str)

            if (epoch + 1) % cfg.save_interval == 0:
                self.save_checkpoint(out_dir / f"checkpoint_epoch{epoch + 1}.msgpack",
                                     state, epoch)
            if means.get("total", float("inf")) < best_loss:
                best_loss = means["total"]
                self.save_checkpoint(out_dir / "best_model.msgpack", state, epoch)

        if last_epoch >= epochs:
            self.save_checkpoint(out_dir / "final_model.msgpack", state,
                                 epochs - 1)
        else:   # segment boundary: guarantee a resume point
            self.save_checkpoint(
                out_dir / f"checkpoint_epoch{last_epoch}.msgpack", state,
                last_epoch - 1)
        with open(out_dir / "loss_history.json", "w") as f:
            json.dump(self.history, f, indent=2)
        save_loss_plots(self.history, out_dir / "loss_plots.png")
        return state

    def _total_gaussians(self, K: int) -> int:
        if self.config.experiment in (4, 5):
            return self.config.n_spiral_points
        if self.config.experiment in (1, 3):
            side = getattr(self, "_depth_side", 256)
            return (side // SAAG_SUBSAMPLE) ** 2  # SAAG prior point count
        return self.config.feature_size ** 2 * K

    # ------------------------------------------------------------------
    def encode(self, params: Dict, images) -> jax.Array:
        """Run the jointly-trained encoder (train_encoder checkpoints) on
        (B, 3, H, W) images in [0, 1] -> (B, 37, 37, C) features — the
        eval/infer replacement for cached extractor features."""
        if self.encoder is None:
            raise ValueError("this Trainer/checkpoint has no trained "
                             "encoder (config.train_encoder is False)")
        return self.encoder.apply(params["encoder"], jnp.asarray(images))

    # ------------------------------------------------------------------
    def save_checkpoint(self, path, state, epoch: int):
        import flax.serialization as ser

        payload = {
            "params": state["params"],
            "opt_state": state["opt_state"],
            "step": state["step"],
        }
        Path(path).write_bytes(ser.to_bytes(payload))
        meta = {
            "epoch": epoch,
            "config": dataclasses.asdict(self.config),
            "physics_config": dataclasses.asdict(self.physics_config),
            "hfgs_config": dataclasses.asdict(self.hfgs_config),
            "hfts_config": dataclasses.asdict(self.hfts_config),
        }
        Path(str(path) + ".json").write_text(json.dumps(meta, indent=2))

    def load_checkpoint(self, path, sample_batch) -> Tuple[Dict, int]:
        import flax.serialization as ser

        template = self.init_state(sample_batch)
        meta_path = Path(str(path) + ".json")
        meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
        if meta.get("thin"):
            # bf16 params-only export (train/thin_ckpt.py): cast params
            # back to template dtypes, fresh optimizer state (Adam
            # re-estimates moments in a few steps), step from sidecar.
            from fresnel_tpu.train.thin_ckpt import load_thin_params
            params = load_thin_params(path, template["params"])
            state = {"params": params,
                     "opt_state": template["opt_state"],
                     "step": jnp.asarray(meta.get("step", 0),
                                         jnp.asarray(template["step"]).dtype)}
            print(f"thin resume from {path}: params restored, optimizer "
                  f"state freshly initialized", flush=True)
            return state, meta.get("epoch", 0)
        payload = ser.from_bytes(
            {"params": template["params"],
             "opt_state": template["opt_state"],
             "step": template["step"]},
            Path(path).read_bytes())
        epoch = 0
        if meta_path.exists():
            epoch = meta.get("epoch", 0)
        elif os.environ.get("FRESNEL_ALLOW_MISSING_SIDECAR"):
            # Explicit opt-out for checkpoints that genuinely have no
            # epoch provenance (e.g. hand-exported weights).
            print(f"WARNING: no config sidecar at {meta_path}; resuming "
                  f"at epoch 0 (LR schedule restarts)", flush=True)
        else:
            # A missing sidecar would otherwise restart schedules at
            # epoch 0 with converged weights — a silently wrong resume
            # that unattended queue runs would never notice (a round-3
            # queue did exactly this).  Fail loudly instead.
            raise FileNotFoundError(
                f"no config sidecar at {meta_path} — resuming without it "
                f"restarts the LR schedule at epoch 0 with converged "
                f"weights.  Rebuild it (python -m "
                f"fresnel_tpu.train.reconstruct_sidecar) or set "
                f"FRESNEL_ALLOW_MISSING_SIDECAR=1 to resume at epoch 0 "
                f"anyway.")
        state = {"params": payload["params"],
                 "opt_state": payload["opt_state"],
                 "step": payload["step"]}
        return state, epoch
