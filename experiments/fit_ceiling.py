"""Representation-ceiling probe for the quality campaign (round-2 item #2).

Question: is the decoder or the DATA the limiter on corpus_v1?  Fit a
Gaussian cloud DIRECTLY to each image by gradient descent through the same
tiled rasterizer at the same budget the exp-2 decoder gets (37x37 patches x
K=4 = 5476 Gaussians), and report frontal SSIM/PSNR.  The fit has no
generalization burden — it upper-bounds what ANY decoder emitting N
Gaussians could score with this renderer on this data.

Positions initialize from the ground-truth depth unprojection (the same
information the decoder receives), colors from the image at the projected
pixel, scales at the patch pitch.

Run:  python -u experiments/fit_ceiling.py [--scenes 3] [--steps 800]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=3)
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--n", type=int, default=5476)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--data_dir", default="data/corpus_v1")
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--out", default="/tmp/fit_ceiling.png")
    args = ap.parse_args()

    from fresnel_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from fresnel_tpu.core.camera import Camera
    from fresnel_tpu.data.dataset import ImageDataset
    from fresnel_tpu.losses.ssim import ssim
    from fresnel_tpu.render.tile import TileRendererConfig, render_tiled

    res, n = args.res, args.n
    cam = Camera.default_training(res)
    cfg = TileRendererConfig(max_per_tile=1024)
    ds = ImageDataset(args.data_dir, image_size=res, use_augmentation=False,
                      max_images=args.scenes)
    rng = np.random.default_rng(0)

    side = int(np.ceil(np.sqrt(n)))

    def init_from_depth(image, depth):
        # Unproject a side x side grid of the GT depth with image colors —
        # the same inputs the decoder sees.
        ys = np.linspace(0, depth.shape[0] - 1, side).astype(int)
        xs = np.linspace(0, depth.shape[1] - 1, side).astype(int)
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        d = depth[gy, gx].reshape(-1)[:n]
        # Match the decoder's depth-locked Z: z = -1.5 + d * (-2).
        z = -1.5 + d * -2.0
        # Pixel grid -> NDC [-1, 1] -> world at depth z (pinhole invert).
        u = (gx.reshape(-1)[:n] / depth.shape[1]) * res
        v = (gy.reshape(-1)[:n] / depth.shape[0]) * res
        x = (u - cam.cx) * (-z) / cam.fx
        y = -(v - cam.cy) * (-z) / cam.fy
        img_colors = image[:, gy, gx].reshape(3, -1).T[:n]
        return {
            "positions": jnp.asarray(np.stack([x, y, z], -1), jnp.float32),
            "log_scales": jnp.full((n, 3), np.log(2.0 / side), jnp.float32),
            "rotations": jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32),
                                  (n, 1)),
            "color_logits": jnp.asarray(
                np.log(np.clip(img_colors, 1e-3, 1 - 1e-3)
                       / np.clip(1 - img_colors, 1e-3, 1)), jnp.float32),
            "opacity_logits": jnp.full((n,), 1.5, jnp.float32),
        }

    def render(p):
        return render_tiled(p["positions"], jnp.exp(p["log_scales"]),
                            p["rotations"], jax.nn.sigmoid(p["color_logits"]),
                            jax.nn.sigmoid(p["opacity_logits"]), cam,
                            config=cfg)

    def loss_fn(p, target):
        img = render(p)
        return jnp.mean(jnp.abs(img - target)) + 0.5 * (1 - ssim(
            img[None], target[None]))

    opt = optax.adam(args.lr)

    @jax.jit
    def step(p, o, target):
        l, g = jax.value_and_grad(loss_fn)(p, target)
        up, o = opt.update(g, o, p)
        return optax.apply_updates(p, up), o, l

    panels, ssims, psnrs = [], [], []
    for i, b in enumerate(ds.batches(1, rng, shuffle=False)):
        target = jnp.asarray(b["image"][0])
        params = init_from_depth(np.asarray(b["image"][0]),
                                 np.asarray(b["depth"][0]))
        o = opt.init(params)
        t0 = time.perf_counter()
        for s in range(args.steps):
            params, o, l = step(params, o, target)
        l.block_until_ready()
        img = render(params)
        sv = float(ssim(img[None], target[None]))
        mse = float(jnp.mean((img - target) ** 2))
        pv = -10 * np.log10(max(mse, 1e-10))
        ssims.append(sv)
        psnrs.append(pv)
        print(f"scene {i}: SSIM {sv:.4f} PSNR {pv:.2f} dB "
              f"({time.perf_counter() - t0:.1f}s for {args.steps} steps)")
        panels.append(np.concatenate(
            [np.asarray(target), np.asarray(img)], axis=2))

    print(f"ceiling over {len(ssims)} scenes: "
          f"SSIM {np.mean(ssims):.4f}  PSNR {np.mean(psnrs):.2f} dB "
          f"(N={n}, {args.steps} steps, direct per-scene fit)")
    from PIL import Image
    row = np.concatenate(panels, axis=1).transpose(1, 2, 0)
    Image.fromarray((np.clip(row, 0, 1) * 255).astype(np.uint8)).save(
        args.out)
    print("panel ->", args.out)


if __name__ == "__main__":
    main()
