"""Split the 9.7 ms headline into per-stage device time.

T-047 established the input transfer costs ~1.4 ms and the rest is
compute + dispatch; this measures WHERE: each stage jitted alone
(dino / depth / decoder / render / resize), timed with the amortized
K-call pattern over distinct inputs (the axon runtime caches repeated
identical executions and its block_until_ready lags one execution —
CLAUDE.md), plus the full fused pipeline for the cross-check.
"""

import json
import time

import numpy as np


def timeit(fn, inputs, iters=24):
    import jax

    outs = [fn(x) for x in inputs[:2]]  # compile + warm
    for o in outs:
        jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = None
    for i in range(iters):
        o = fn(inputs[i % len(inputs)])
    jax.block_until_ready(o)
    # one extra sync call to absorb the axon one-execution lag
    float(np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from fresnel_tpu.core.camera import Camera
    from fresnel_tpu.models.decoders import DirectPatchDecoder
    from fresnel_tpu.models.vit import DINOv2, DepthAnything
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

    x518s = [jax.jit(
        lambda im: jax.image.resize(im, (518, 518, 3), "linear")[None])(im)
        for im in images]
    for x in x518s:
        jax.block_until_ready(x)
    feats_s = [dino.apply(dino_params, x) for x in x518s[:8]]
    depth_s = [depth_model.apply(depth_params, x) for x in x518s[:8]]
    outs = [decoder.apply(dec_params, f, d) for f, d in zip(feats_s, depth_s)]

    stages = {}
    stages["resize"] = timeit(
        jax.jit(lambda im: jax.image.resize(im, (518, 518, 3), "linear")[None]),
        images)
    stages["dino"] = timeit(
        jax.jit(lambda x: dino.apply(dino_params, x)), x518s)
    stages["depth"] = timeit(
        jax.jit(lambda x: depth_model.apply(depth_params, x)), x518s)
    stages["decoder"] = timeit(
        jax.jit(lambda fd: decoder.apply(dec_params, *fd)),
        list(zip(feats_s, depth_s)))
    stages["render"] = timeit(
        jax.jit(lambda o: render_tiled(
            o["positions"][0], o["scales"][0], o["rotations"][0],
            o["colors"][0], o["opacities"][0], camera)), outs)

    @jax.jit
    def full(image):
        x518 = jax.image.resize(image, (518, 518, 3), "linear")[None]
        feats = dino.apply(dino_params, x518)
        depth = depth_model.apply(depth_params, x518)
        out = decoder.apply(dec_params, feats, depth)
        img = render_tiled(
            out["positions"][0], out["scales"][0], out["rotations"][0],
            out["colors"][0], out["opacities"][0], camera)
        return out["positions"], img

    stages["full"] = timeit(full, images)
    stages["sum_of_stages"] = sum(
        v for k, v in stages.items() if k != "full")
    print(json.dumps({k: round(v, 3) for k, v in stages.items()}))


if __name__ == "__main__":
    from fresnel_tpu.utils.tpu_lock import tpu_lock
    with tpu_lock(timeout_s=3600.0):
        main()
