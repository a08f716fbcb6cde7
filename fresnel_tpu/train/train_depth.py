"""Tiny monocular-depth model training (the reference's depth side quest).

The reference collected NYUv2/folder/synthetic depth datasets
(scripts/utils/depth_dataset.py) to train a small depth model as a
Depth-Anything replacement.  This is that training loop for the TPU: a small
encoder-decoder conv net on (image, depth) pairs with scale-invariant L1 +
gradient-matching losses.  Trained checkpoints plug into the pipeline as the
`auto` depth estimator.

Run:  python -m fresnel_tpu.train.train_depth --synthetic --epochs 10
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from pathlib import Path
from typing import Dict

import numpy as np


@dataclasses.dataclass
class DepthTrainConfig:
    data_dir: str = "depth_data"
    output_dir: str = "checkpoints_depth"
    epochs: int = 50
    batch_size: int = 8
    lr: float = 3e-4
    image_size: int = 128
    base_channels: int = 32
    save_interval: int = 10
    seed: int = 0


def build_depth_net(base: int = 32):
    import flax.linen as nn
    import jax.numpy as jnp
    import jax

    class TinyDepthNet(nn.Module):
        """U-ish encoder-decoder: (B, 3, H, W) image -> (B, H, W) relative
        depth in [0, 1]."""

        base: int = 32

        @nn.compact
        def __call__(self, x):
            x = jnp.transpose(x, (0, 2, 3, 1))        # NHWC
            skips = []
            ch = self.base
            for _ in range(3):
                x = nn.relu(nn.Conv(ch, (3, 3), padding="SAME")(x))
                x = nn.relu(nn.Conv(ch, (3, 3), padding="SAME")(x))
                skips.append(x)
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME")(x)
                ch *= 2
            x = nn.relu(nn.Conv(ch, (3, 3), padding="SAME")(x))
            for _ in range(3):
                ch //= 2
                B, H, W, C = x.shape
                x = jax.image.resize(x, (B, H * 2, W * 2, C), "nearest")
                x = jnp.concatenate([x, skips.pop()], -1)
                x = nn.relu(nn.Conv(ch, (3, 3), padding="SAME")(x))
            x = nn.Conv(1, (3, 3), padding="SAME")(x)[..., 0]
            lo = jnp.min(x, axis=(1, 2), keepdims=True)
            hi = jnp.max(x, axis=(1, 2), keepdims=True)
            return (x - lo) / jnp.maximum(hi - lo, 1e-6)

    return TinyDepthNet(base)


def depth_losses(pred, target):
    """Scale-invariant L1 + gradient matching."""
    import jax.numpy as jnp
    from fresnel_tpu.losses.physics import normalized_depth_l1

    si = normalized_depth_l1(pred, target)
    gx_p = pred[:, :, 1:] - pred[:, :, :-1]
    gy_p = pred[:, 1:, :] - pred[:, :-1, :]
    gx_t = target[:, :, 1:] - target[:, :, :-1]
    gy_t = target[:, 1:, :] - target[:, :-1, :]
    grad = jnp.mean(jnp.abs(gx_p - gx_t)) + jnp.mean(jnp.abs(gy_p - gy_t))
    return si + 0.5 * grad, {"si": si, "grad": grad}


def main(argv=None):
    from fresnel_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser(description="Train a tiny depth model")
    p.add_argument("--data_dir", default="depth_data")
    p.add_argument("--output_dir", default="checkpoints_depth")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--base_channels", type=int, default=32)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--dataset", default="folder",
                   choices=["folder", "nyuv2", "synthetic"],
                   help="'nyuv2' streams NYU Depth V2 from HuggingFace "
                        "(reference utils/depth_dataset.py:110-197; needs "
                        "network)")
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    cfg = DepthTrainConfig(
        data_dir=args.data_dir, output_dir=args.output_dir,
        epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        image_size=args.image_size, base_channels=args.base_channels,
        seed=args.seed)

    import jax
    import jax.numpy as jnp
    import optax
    import flax.serialization as ser

    if args.synthetic or args.dataset == "synthetic":
        from fresnel_tpu.data.depth_dataset import SyntheticDepthDataset
        dataset = SyntheticDepthDataset(n_samples=64,
                                        image_size=cfg.image_size,
                                        seed=cfg.seed)
    elif args.dataset == "nyuv2":
        from fresnel_tpu.data.depth_dataset import NYUDepthV2Dataset
        dataset = NYUDepthV2Dataset(image_size=cfg.image_size,
                                    max_samples=args.max_samples)
    else:
        from fresnel_tpu.data.depth_dataset import FolderDepthDataset
        dataset = FolderDepthDataset(cfg.data_dir, image_size=cfg.image_size)
    print(f"dataset: {len(dataset)} pairs")

    model = build_depth_net(cfg.base_channels)
    nprng = np.random.default_rng(cfg.seed)
    first = next(iter(dataset.batches(cfg.batch_size, nprng)))
    params = model.init(jax.random.PRNGKey(cfg.seed),
                        jnp.asarray(first["image"]))
    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(pp):
            pred = model.apply(pp, batch["image"])
            target = batch["depth"]
            if target.shape[-1] != pred.shape[-1]:
                target = jax.image.resize(target, pred.shape, "linear")
            return depth_losses(pred, target)

        (loss, ld), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss, ld

    out = Path(cfg.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    history: Dict[str, list] = {"total": []}
    for epoch in range(cfg.epochs):
        t0 = time.perf_counter()
        losses = []
        for batch in dataset.batches(cfg.batch_size, nprng):
            jb = jax.tree.map(jnp.asarray, batch)
            params, opt_state, loss, ld = step(params, opt_state, jb)
            losses.append(loss)
        mean = float(jnp.mean(jnp.stack(losses)))
        history["total"].append(mean)
        print(f"epoch {epoch + 1}/{cfg.epochs} loss={mean:.4f} "
              f"({time.perf_counter() - t0:.1f}s)")
    (out / "depth_model.msgpack").write_bytes(ser.to_bytes(params))
    (out / "config.json").write_text(json.dumps(dataclasses.asdict(cfg)))
    (out / "loss_history.json").write_text(json.dumps(history))
    print("depth training complete")


if __name__ == "__main__":
    main()
