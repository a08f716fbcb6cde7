"""Decompose the headline latency by CUMULATIVE pipeline prefixes.

bench_headline_split.py timed each stage as its own jit call, but the
per-call dispatch overhead over the axon tunnel swamps the small stages
(parts summed to 2.3x the full pipeline).  Here every variant is ONE jit
with the same input discipline and a tiny output (so output transfer is
constant), so differences between variants are pure marginal device time:

  resize                      -> transfer + resize floor
  + dino                      -> marginal DINOv2 trunk
  + depth (sequential)        -> marginal DepthAnything (trunk + DPT)
  + fused trunk (vmapped)     -> the dual-trunk fusion candidate
  + decoder (+render) = full  -> marginal decoder / render

Also times full_fused = the headline pipeline with the two ViT-S trunks
run as one vmapped B=2 forward over stacked weights
(fresnel_tpu/models/vit.py fused_features_and_depth) — the adoption
candidate for bench.py.
"""

import json
import time

import numpy as np


def timeit(fn, inputs, iters=24):
    import jax

    outs = [fn(x) for x in inputs[:2]]
    for o in outs:
        jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = None
    for i in range(iters):
        o = fn(inputs[i % len(inputs)])
    jax.block_until_ready(o)
    float(np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from fresnel_tpu.core.camera import Camera
    from fresnel_tpu.models.decoders import DirectPatchDecoder
    from fresnel_tpu.models.vit import (
        DINOv2, DepthAnything, fused_features_and_depth, stack_trunk_params)
    from fresnel_tpu.render.tile import render_tiled

    res = 512
    rng = np.random.default_rng(0)
    images = [jnp.asarray(rng.uniform(size=(res, res, 3)).astype(np.float32))
              for _ in range(8)]

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
    stacked = stack_trunk_params(dino_params, depth_params)

    def prefix_resize(image):
        x518 = jax.image.resize(image, (518, 518, 3), "linear")[None]
        return jnp.sum(x518)

    def prefix_dino(image):
        x518 = jax.image.resize(image, (518, 518, 3), "linear")[None]
        feats = dino.apply(dino_params, x518)
        return jnp.sum(feats)

    def prefix_seq(image):
        x518 = jax.image.resize(image, (518, 518, 3), "linear")[None]
        feats = dino.apply(dino_params, x518)
        depth = depth_model.apply(depth_params, x518)
        return jnp.sum(feats) + jnp.sum(depth)

    def prefix_fused(image):
        x518 = jax.image.resize(image, (518, 518, 3), "linear")[None]
        feats, depth = fused_features_and_depth(
            depth_model, stacked, depth_params, x518)
        return jnp.sum(feats) + jnp.sum(depth)

    def prefix_decoder(image):
        x518 = jax.image.resize(image, (518, 518, 3), "linear")[None]
        feats = dino.apply(dino_params, x518)
        depth = depth_model.apply(depth_params, x518)
        out = decoder.apply(dec_params, feats, depth)
        return jnp.sum(out["positions"])

    def full(image):
        x518 = jax.image.resize(image, (518, 518, 3), "linear")[None]
        feats = dino.apply(dino_params, x518)
        depth = depth_model.apply(depth_params, x518)
        out = decoder.apply(dec_params, feats, depth)
        img = render_tiled(
            out["positions"][0], out["scales"][0], out["rotations"][0],
            out["colors"][0], out["opacities"][0], camera)
        return out["positions"], img

    def full_fused(image):
        x518 = jax.image.resize(image, (518, 518, 3), "linear")[None]
        feats, depth = fused_features_and_depth(
            depth_model, stacked, depth_params, x518)
        out = decoder.apply(dec_params, feats, depth)
        img = render_tiled(
            out["positions"][0], out["scales"][0], out["rotations"][0],
            out["colors"][0], out["opacities"][0], camera)
        return out["positions"], img

    t = {}
    for name, fn in [("resize", prefix_resize), ("dino", prefix_dino),
                     ("seq_trunks", prefix_seq), ("fused_trunks", prefix_fused),
                     ("decoder", prefix_decoder), ("full", full),
                     ("full_fused", full_fused)]:
        t[name] = timeit(jax.jit(fn), images)
        print(f"{name}: {t[name]:.3f} ms", flush=True)
    print(json.dumps({k: round(v, 3) for k, v in t.items()}))


if __name__ == "__main__":
    from fresnel_tpu.utils.tpu_lock import tpu_lock
    with tpu_lock(timeout_s=7200.0):
        main()
