"""Headline benchmark: single 512² image -> 3D Gaussian splat reconstruction.

Runs the full TPU inference pipeline as ONE jit-compiled program:
  DINOv2-S feature extraction (the real ViT-S/14 @518², fresnel_tpu/models/
  vit.py) + Depth-Anything-style monocular depth (ViT-S backbone + DPT head)
  + DirectPatchDecoder + tiled rasterized verification render.

Weights are randomly initialized when no checkpoints are present — latency
is FLOP-identical to trained weights, so the measurement is architecture-
faithful either way.  The reference runs the same two models through ONNX
subprocesses + temp files (reference: src/core/features/feature_extractor.cpp
:67-150, src/core/depth/estimator.cpp:182-255) at ~2 s end-to-end
(reference: README.md:207).

vs_baseline = baseline_ms / ours_ms (higher is better).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}
"""

import json
import time

import numpy as np


def main():
    # Queue discipline (round-3 lesson: a training job overlapping the
    # end-of-round snapshot inflated the official record 3.8x).  Wait for
    # any in-flight cloud/*.sh training segment to release the chip before
    # compiling/timing; bounded so a wedged holder can't block the driver.
    from fresnel_tpu.utils.tpu_lock import tpu_lock
    with tpu_lock(timeout_s=1500.0):
        _run()


def _run():
    import jax
    import jax.numpy as jnp

    from fresnel_tpu.core.camera import Camera
    from fresnel_tpu.models.decoders import DirectPatchDecoder
    from fresnel_tpu.models.vit import DINOv2, DepthAnything
    from fresnel_tpu.render.tile import render_tiled

    res = 512
    rng = np.random.default_rng(0)
    # Distinct inputs per iteration: the TPU runtime caches results for
    # repeated identical executions, which would fake the latency.
    images = [jnp.asarray(rng.uniform(size=(res, res, 3)).astype(np.float32))
              for _ in range(8)]
    image = images[0]

    # bf16 compute (f32 params/softmax/outputs) — the TPU-standard
    # inference configuration, matching the CLI's real-weights path
    # (encoders.py DINOv2FeatureExtractor / DepthAnythingEstimator).
    dino = DINOv2(dtype=jnp.bfloat16)     # ViT-S/14: width 384, depth 12
    depth_model = DepthAnything(dtype=jnp.bfloat16)  # ViT-S + DPT head
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

    @jax.jit
    def image_to_3dgs(dino_params, depth_params, dec_params, image):
        x518 = jax.image.resize(image, (518, 518, 3), "linear")[None]
        feats = dino.apply(dino_params, x518)            # (1, 37, 37, 384)
        depth = depth_model.apply(depth_params, x518)    # (1, 256, 256)
        out = decoder.apply(dec_params, feats, depth)
        img = render_tiled(
            out["positions"][0], out["scales"][0], out["rotations"][0],
            out["colors"][0], out["opacities"][0], camera)
        return out["positions"], img

    params = (dino_params, depth_params, dec_params)

    # Warmup / compile.
    pos, img = image_to_3dgs(*params, image)
    jax.block_until_ready((pos, img))

    # Steady-state timing over distinct inputs.
    iters = 24
    outs = []
    t0 = time.perf_counter()
    for i in range(iters):
        outs.append(image_to_3dgs(*params, images[i % len(images)]))
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
