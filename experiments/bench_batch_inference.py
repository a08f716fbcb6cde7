"""Batched image->3DGS throughput: images/s vs batch size.

The reference pipeline is structurally single-image — every stage is a
subprocess with temp-file IO (reference: src/core/features/
feature_extractor.cpp:98-149, depth/estimator.cpp:213-229), so throughput
equals 1/latency (~0.5 img/s).  Here the whole pipeline is one jitted
program over a batch axis: the ViT runs at batch B on the MXU and the
rasterizer vmaps over scenes, so throughput scales with B until the chip
saturates.

Run:  python -u experiments/bench_batch_inference.py [--batches 1 4 16]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 4, 16])
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fresnel_tpu.core.camera import Camera
    from fresnel_tpu.models.decoders import DirectPatchDecoder
    from fresnel_tpu.models.vit import DINOv2, DepthAnything
    from fresnel_tpu.render.tile import render_tiled

    res = args.res
    dino = DINOv2()
    depth_model = DepthAnything()
    decoder = DirectPatchDecoder(gaussians_per_patch=4)
    camera = Camera.default_training(res)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    dummy = jnp.zeros((1, 518, 518, 3), jnp.float32)
    dino_params = dino.init(k1, dummy)
    depth_params = depth_model.init(k2, dummy)
    dec_params = decoder.init(k3, dino.apply(dino_params, dummy),
                              depth_model.apply(depth_params, dummy))

    def pipeline(images):                       # (B, res, res, 3)
        B = images.shape[0]
        x518 = jax.image.resize(images, (B, 518, 518, 3), "linear")
        feats = dino.apply(dino_params, x518)
        depth = depth_model.apply(depth_params, x518)
        out = decoder.apply(dec_params, feats, depth)
        imgs = jax.vmap(
            lambda p, s, r, c, o: render_tiled(p, s, r, c, o, camera))(
                out["positions"], out["scales"], out["rotations"],
                out["colors"], out["opacities"])
        return out["positions"], imgs

    rng = np.random.default_rng(0)
    for B in args.batches:
        fn = jax.jit(pipeline)
        # Distinct inputs (the TPU runtime caches identical executions).
        batches = [jnp.asarray(
            rng.uniform(size=(B, res, res, 3)).astype(np.float32))
            for _ in range(3)]
        try:
            out = fn(batches[0])
            jax.block_until_ready(out)
            outs = []
            t0 = time.perf_counter()
            for i in range(args.iters):
                outs.append(fn(batches[i % len(batches)]))
            jax.block_until_ready(outs)
            dt = (time.perf_counter() - t0) / args.iters
            print(f"B={B:>3}  {dt * 1000:8.2f} ms/batch  "
                  f"{B / dt:8.1f} img/s", flush=True)
        except Exception as e:  # noqa: BLE001 — report OOMs
            print(f"B={B:>3}  FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
