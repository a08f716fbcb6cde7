"""Headline benchmark: single 512² image -> 3D Gaussian splat reconstruction.

Runs the full TPU inference pipeline — patch feature extraction + monocular
depth + DirectPatchDecoder + tiled rasterized verification render — as one
jit-compiled program and reports steady-state latency.

Reference baseline: ~2 s image->3D on an RX 7800 XT (reference: README.md:207;
BASELINE.md).  vs_baseline = baseline_ms / ours_ms (higher is better).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fresnel_tpu.core.camera import Camera
    from fresnel_tpu.models.decoders import DirectPatchDecoder
    from fresnel_tpu.models.encoders import (
        PatchFeatureExtractor, gradient_depth_estimate)
    from fresnel_tpu.render.tile import render_tiled

    res = 512
    rng = np.random.default_rng(0)
    # Distinct inputs per iteration: the TPU runtime caches results for
    # repeated identical executions, which would fake the latency.
    images = [jnp.asarray(rng.uniform(size=(res, res, 3)).astype(np.float32))
              for _ in range(8)]
    image = images[0]

    extractor = PatchFeatureExtractor(grid=37, dim=384)
    model = DirectPatchDecoder(gaussians_per_patch=4)
    camera = Camera.default_training(res)

    feats0 = extractor(image)
    depth0 = gradient_depth_estimate(image, 256)
    params = model.init(jax.random.PRNGKey(0), feats0[None], depth0[None])

    @jax.jit
    def image_to_3dgs(params, image):
        feats = extractor._extract(image)[None]
        depth = gradient_depth_estimate(image, 256)[None]
        out = model.apply(params, feats, depth)
        img = render_tiled(
            out["positions"][0], out["scales"][0], out["rotations"][0],
            out["colors"][0], out["opacities"][0], camera)
        return out["positions"], img

    # Warmup / compile.
    pos, img = image_to_3dgs(params, image)
    jax.block_until_ready((pos, img))

    # Steady-state timing over distinct inputs.
    iters = 24
    outs = []
    t0 = time.perf_counter()
    for i in range(iters):
        outs.append(image_to_3dgs(params, images[i % len(images)]))
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) / iters * 1000.0

    baseline_ms = 2000.0  # reference v1 image->3D latency
    print(json.dumps({
        "metric": "image_to_3dgs_latency_512px",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / ms, 2),
    }))


if __name__ == "__main__":
    main()
