"""Headline-latency variants: where do the 9.7 ms go, and is the
host->device input transfer (3 MB f32 @512²) a real cost?

The bf16 A/B (aec7f80) showed block compute is NOT the bottleneck over
the tunneled chip — per-call input transfer is the suspect.  Real
deployments receive uint8 images; converting to f32 ON DEVICE cuts the
transfer 4x.  This measures the current f32-input pipeline against a
uint8-input variant of the SAME jit program (cast + /255 fused into the
resize), both cycling 8 distinct inputs (the axon runtime caches
identical executions).

Run:  python -u experiments/bench_headline_variants.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fresnel_tpu.core.camera import Camera
    from fresnel_tpu.models.decoders import DirectPatchDecoder
    from fresnel_tpu.models.vit import DINOv2, DepthAnything
    from fresnel_tpu.render.tile import render_tiled
    from fresnel_tpu.utils.tpu_lock import tpu_lock

    res = 512
    rng = np.random.default_rng(0)
    u8 = [rng.integers(0, 256, (res, res, 3), dtype=np.uint8)
          for _ in range(8)]
    f32 = [jnp.asarray(a.astype(np.float32) / 255.0) for a in u8]
    u8j = [jnp.asarray(a) for a in u8]

    dino = DINOv2(dtype=jnp.bfloat16)
    depth_model = DepthAnything(dtype=jnp.bfloat16)
    decoder = DirectPatchDecoder(gaussians_per_patch=4)
    camera = Camera.default_training(res)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    dummy518 = jnp.zeros((1, 518, 518, 3), jnp.float32)
    dino_params = dino.init(k1, dummy518)
    depth_params = depth_model.init(k2, dummy518)
    feats0 = dino.apply(dino_params, dummy518)
    depth0 = depth_model.apply(depth_params, dummy518)
    dec_params = decoder.init(k3, feats0, depth0)
    params = (dino_params, depth_params, dec_params)

    def pipeline(dino_params, depth_params, dec_params, image_f32):
        x518 = jax.image.resize(image_f32, (518, 518, 3), "linear")[None]
        feats = dino.apply(dino_params, x518)
        depth = depth_model.apply(depth_params, x518)
        out = decoder.apply(dec_params, feats, depth)
        img = render_tiled(
            out["positions"][0], out["scales"][0], out["rotations"][0],
            out["colors"][0], out["opacities"][0], camera)
        return out["positions"], img

    @jax.jit
    def from_f32(dp, pp, cp, image):
        return pipeline(dp, pp, cp, image)

    @jax.jit
    def from_u8(dp, pp, cp, image_u8):
        return pipeline(dp, pp, cp,
                        image_u8.astype(jnp.float32) * (1.0 / 255.0))

    def bench(fn, inputs, iters=24):
        outs = fn(*params, inputs[0])
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        outs = [fn(*params, inputs[i % len(inputs)]) for i in range(iters)]
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) / iters * 1000.0

    with tpu_lock():
        ms_f32 = bench(from_f32, f32)
        ms_u8 = bench(from_u8, u8j)
        # Transfer-only probe: resize of a fresh input, nothing else.
        @jax.jit
        def xfer(image):
            return jnp.sum(jax.image.resize(image, (518, 518, 3), "linear"))
        x0 = xfer(f32[0]); x0.block_until_ready()
        t0 = time.perf_counter()
        outs = [xfer(f32[i % 8]) for i in range(24)]
        jax.block_until_ready(outs)
        ms_xfer = (time.perf_counter() - t0) / 24 * 1000.0

    print(json.dumps({"f32_input_ms": round(ms_f32, 3),
                      "u8_input_ms": round(ms_u8, 3),
                      "f32_transfer_resize_only_ms": round(ms_xfer, 3)}))


if __name__ == "__main__":
    main()
