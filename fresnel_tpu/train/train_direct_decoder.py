"""Fresnel v2 distillation trainer: DirectSLatDecoder from TRELLIS outputs.

TPU rebuild of the reference trainer (reference:
scripts/training/train_direct_decoder.py): bidirectional Chamfer
GaussianMatchingLoss + occupancy BCE (weight 2.0) + optional render loss
through the tiled rasterizer, AdamW + cosine, NaN-guarded jitted step.
Training modes mirror the reference: structure_supervised (teacher coords fed
to the decoder) and end_to_end (structure predictor coords).

Run:  python -m fresnel_tpu.train.train_direct_decoder --synthetic --epochs 2
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np


@dataclasses.dataclass
class V2Config:
    data_dir: str = "trellis_data"
    output_dir: str = "checkpoints_v2"
    epochs: int = 50
    batch_size: int = 2
    lr: float = 1e-4
    weight_decay: float = 1e-5
    decoder_type: str = "transformer"      # transformer | mlp
    feature_dim: int = 1024
    hidden_dim: int = 512
    num_layers: int = 6
    num_heads: int = 8
    num_gaussians_per_voxel: int = 8
    max_coords: int = 4096
    max_gaussians: int = 16384
    occupancy_weight: float = 2.0
    use_render_loss: bool = False
    render_size: int = 128
    training_mode: str = "structure_supervised"  # | end_to_end
    use_checkpoint: bool = False
    # bf16 mixed precision — TPU-native equivalent of the reference's
    # torch.cuda.amp autocast + GradScaler in this trainer (reference:
    # scripts/training/train_direct_decoder.py).  bf16 keeps fp32's
    # exponent, so no loss scaling is needed; params/opt stay fp32.
    use_amp: bool = False
    max_match_points: int = 4096
    save_interval: int = 10
    seed: int = 0


def build_model(cfg: V2Config):
    if cfg.decoder_type == "transformer":
        import jax.numpy as jnp

        from fresnel_tpu.models.slat import DirectSLatDecoder
        return DirectSLatDecoder(
            feature_dim=cfg.feature_dim, hidden_dim=cfg.hidden_dim,
            num_layers=cfg.num_layers, num_heads=cfg.num_heads,
            num_gaussians_per_voxel=cfg.num_gaussians_per_voxel,
            use_checkpoint=cfg.use_checkpoint,
            dtype=jnp.bfloat16 if cfg.use_amp else None)
    from fresnel_tpu.models.slat import MLPSLatDecoder
    return MLPSLatDecoder(
        feature_dim=cfg.feature_dim, hidden_dim=cfg.hidden_dim,
        num_gaussians_per_voxel=cfg.num_gaussians_per_voxel)


class V2Trainer:
    def __init__(self, cfg: V2Config):
        import jax
        import optax

        self.cfg = cfg
        self.model = build_model(cfg)
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(cfg.lr, weight_decay=cfg.weight_decay))
        self._step = None
        self.history: Dict[str, list] = {}

    def init_state(self, batch):
        import jax
        import jax.numpy as jnp

        rng = jax.random.PRNGKey(self.cfg.seed)
        params = self.model.init(
            rng, jnp.asarray(batch["features"][:1]),
            jnp.asarray(batch["coords"][:1]),
            coord_mask=jnp.asarray(batch["coord_mask"][:1]))
        opt_state = self.optimizer.init(params)
        return {"params": params, "opt_state": opt_state,
                "step": jnp.zeros((), jnp.int32)}

    def _build_step(self):
        import jax
        import jax.numpy as jnp
        import optax

        from fresnel_tpu.losses.matching import (
            gaussian_matching_loss, occupancy_bce_loss, MatchingWeights)

        cfg = self.cfg
        model = self.model
        optimizer = self.optimizer

        def loss_fn(params, batch, rng):
            # Under --use_amp the transformer computes in bf16 via its dtype
            # attribute (set in build_model); Chamfer matching / BCE /
            # render losses and the heads stay float32.
            out = model.apply(
                params, batch["features"], batch["coords"],
                coord_mask=batch["coord_mask"], deterministic=False,
                rngs={"dropout": rng})
            gpv = cfg.num_gaussians_per_voxel
            pred_mask = jnp.repeat(batch["coord_mask"], gpv, axis=1)
            ld = gaussian_matching_loss(
                out["gaussians"], batch["gaussians"],
                pred_mask=pred_mask, target_mask=batch["gaussian_mask"],
                max_match_points=cfg.max_match_points)
            total = ld["total"]
            if "occupancy_logits" in out:
                occ_l = occupancy_bce_loss(
                    out["occupancy_logits"], batch["occupancy"],
                    mask=batch["coord_mask"])
                ld["occupancy"] = occ_l
                total = total + cfg.occupancy_weight * occ_l
            if cfg.use_render_loss:
                from fresnel_tpu.core.camera import Camera
                from fresnel_tpu.losses.ssim import ssim
                from fresnel_tpu.render.tile import (
                    TileRendererConfig, render_tiled)

                cam = Camera.default_training(cfg.render_size)
                rcfg = TileRendererConfig(max_per_tile=256)

                def render(g, mask):
                    op = jnp.where(mask, g[:, 13], 0.0)
                    return render_tiled(g[:, 0:3], g[:, 3:6], g[:, 6:10],
                                        g[:, 10:13], op, cam, config=rcfg)

                pred_img = jax.vmap(render)(out["gaussians"], pred_mask)
                tgt_img = jax.vmap(render)(batch["gaussians"],
                                           batch["gaussian_mask"])
                rgb = jnp.mean(jnp.abs(pred_img - tgt_img))
                ssim_l = 1.0 - ssim(pred_img, tgt_img)
                ld["render_rgb"] = rgb
                ld["render_ssim"] = ssim_l
                total = total + rgb + 0.5 * ssim_l
            ld["total"] = total
            return total, ld

        def step(state, batch, rng):
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
            new_params = jax.tree.map(
                lambda new, old: jnp.where(finite, new, old),
                new_params, state["params"])
            return ({"params": new_params, "opt_state": new_opt,
                     "step": state["step"] + 1}, ld)

        return jax.jit(step, donate_argnums=(0,))

    def fit(self, dataset, epochs: Optional[int] = None, state=None,
            log_fn=print):
        import jax
        import jax.numpy as jnp

        cfg = self.cfg
        epochs = epochs or cfg.epochs
        nprng = np.random.default_rng(cfg.seed)
        rng = jax.random.PRNGKey(cfg.seed + 1)
        if self._step is None:
            self._step = self._build_step()

        first = next(iter(dataset.batches(cfg.batch_size, nprng)))
        if state is None:
            state = self.init_state(first)

        out_dir = Path(cfg.output_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        best = float("inf")
        for epoch in range(epochs):
            t0 = time.perf_counter()
            losses: Dict[str, list] = {}
            for batch in dataset.batches(cfg.batch_size, nprng):
                jb = jax.tree.map(jnp.asarray, batch)
                rng, srng = jax.random.split(rng)
                state, ld = self._step(state, jb, srng)
                for k, v in ld.items():
                    losses.setdefault(k, []).append(v)
            means = {k: float(jnp.mean(jnp.stack(v)))
                     for k, v in losses.items()}
            for k, v in means.items():
                self.history.setdefault(k, []).append(v)
            log_fn(f"epoch {epoch + 1}/{epochs} "
                   f"total={means['total']:.4f} "
                   f"pos={means.get('position', 0):.4f} "
                   f"cov={means.get('coverage', 0):.4f} "
                   f"occ={means.get('occupancy', 0):.4f} "
                   f"({time.perf_counter() - t0:.1f}s)")
            if (epoch + 1) % cfg.save_interval == 0 or means["total"] < best:
                best = min(best, means["total"])
                self.save_checkpoint(out_dir / "best_v2.msgpack", state, epoch)
        self.save_checkpoint(out_dir / "final_v2.msgpack", state, epochs - 1)
        (out_dir / "loss_history.json").write_text(json.dumps(self.history))
        return state

    def save_checkpoint(self, path, state, epoch):
        import flax.serialization as ser

        Path(path).write_bytes(ser.to_bytes(
            {"params": state["params"], "opt_state": state["opt_state"],
             "step": state["step"]}))
        Path(str(path) + ".json").write_text(json.dumps(
            {"epoch": epoch, "config": dataclasses.asdict(self.cfg)}))


def main(argv=None):
    from fresnel_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser(description="Fresnel v2 distillation (TPU)")
    p.add_argument("--data_dir", default="trellis_data")
    p.add_argument("--output_dir", default="checkpoints_v2")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--decoder_type", choices=["transformer", "mlp"],
                   default="transformer")
    p.add_argument("--feature_dim", type=int, default=1024)
    p.add_argument("--hidden_dim", type=int, default=512)
    p.add_argument("--num_layers", type=int, default=6)
    p.add_argument("--num_gaussians_per_voxel", type=int, default=8)
    p.add_argument("--max_coords", type=int, default=4096)
    p.add_argument("--max_gaussians", type=int, default=16384)
    p.add_argument("--occupancy_weight", type=float, default=2.0)
    p.add_argument("--use_render_loss", action="store_true")
    p.add_argument("--training_mode", default="structure_supervised",
                   choices=["structure_supervised", "end_to_end"])
    p.add_argument("--use_checkpoint", action="store_true")
    p.add_argument("--use_amp", action="store_true",
                   help="bf16 mixed precision (reference AMP parity)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_samples", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    cfg = V2Config(
        data_dir=args.data_dir, output_dir=args.output_dir,
        epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        decoder_type=args.decoder_type, feature_dim=args.feature_dim,
        hidden_dim=args.hidden_dim, num_layers=args.num_layers,
        num_gaussians_per_voxel=args.num_gaussians_per_voxel,
        max_coords=args.max_coords, max_gaussians=args.max_gaussians,
        occupancy_weight=args.occupancy_weight,
        use_render_loss=args.use_render_loss,
        training_mode=args.training_mode,
        use_checkpoint=args.use_checkpoint, use_amp=args.use_amp,
        seed=args.seed)

    if args.synthetic:
        from fresnel_tpu.data.trellis import SyntheticTrellisDataset
        cfg.max_coords, cfg.max_gaussians = 512, 1024
        dataset = SyntheticTrellisDataset(
            n_samples=args.synthetic_samples, seed=args.seed,
            feature_dim=cfg.feature_dim)
    else:
        from fresnel_tpu.data.trellis import TrellisDistillationDataset
        dataset = TrellisDistillationDataset(
            cfg.data_dir, max_coords=cfg.max_coords,
            max_gaussians=cfg.max_gaussians)
    print(f"dataset: {len(dataset)} samples")

    V2Trainer(cfg).fit(dataset)
    print("v2 training complete")


if __name__ == "__main__":
    main()
