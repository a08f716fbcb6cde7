"""Image -> features/depth encoders with graceful fallbacks.

The reference bridges to ONNX DINOv2 / Depth-Anything subprocesses and FALLS
BACK to procedural estimators when models are missing (reference:
src/core/depth/estimator.cpp:33-144, 259-268; feature_extractor.cpp:154-163).
Here the whole bridge collapses into jit-compiled functions; the fallbacks
are faithful TPU ports so the end-to-end pipeline always runs:

  * gradient_depth_estimate — Sobel magnitude + blur + center prior
    (reference: estimator.cpp:33-108's GradientDepthEstimator).
  * center_depth_estimate   — radial depth prior
    (reference: estimator.cpp:112-144's CenterDepthEstimator).
  * PatchFeatureExtractor   — deterministic 37x37xD patch features from a
    fixed random projection over local color/gradient statistics: the
    offline stand-in for DINOv2 (the ViT port with real weights lives in
    fresnel_tpu/models/vit.py and is used when weights are present).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from fresnel_tpu.physics.fresnel_zones import sobel_gradients


def _box_blur(img: jax.Array, k: int = 5) -> jax.Array:
    """(..., H, W) box blur via separable reduce-window means."""
    pad = k // 2
    x = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(pad, pad), (pad, pad)],
                mode="edge")
    ones = (1,) * (img.ndim - 2)
    win_h = ones + (k, 1)
    win_w = ones + (1, k)
    x = jax.lax.reduce_window(x, 0.0, jax.lax.add, win_h, (1,) * img.ndim,
                              "VALID") / k
    x = jax.lax.reduce_window(x, 0.0, jax.lax.add, win_w, (1,) * img.ndim,
                              "VALID") / k
    return x


@functools.partial(jax.jit, static_argnames=("out_size",))
def gradient_depth_estimate(image: jax.Array, out_size: int = 256) -> jax.Array:
    """(H, W, 3) image in [0,1] -> (out_size, out_size) depth in [0,1].

    Luminance Sobel magnitude, blurred, inverted (strong edges = closer) and
    blended with a center prior — matching the reference fallback's spirit.
    """
    gray = jnp.einsum("hwc,c->hw", image, jnp.array([0.299, 0.587, 0.114]))
    gray = jax.image.resize(gray, (out_size, out_size), "linear")
    gx, gy = sobel_gradients(gray)
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-8)
    mag = _box_blur(mag, 7)
    mag = mag / jnp.maximum(jnp.max(mag), 1e-6)

    ys = jnp.linspace(-1, 1, out_size)
    xs = jnp.linspace(-1, 1, out_size)
    YY, XX = jnp.meshgrid(ys, xs, indexing="ij")
    center = 1.0 - jnp.sqrt(XX * XX + YY * YY) / jnp.sqrt(2.0)

    depth = 0.6 * mag + 0.4 * center
    lo, hi = jnp.min(depth), jnp.max(depth)
    return (depth - lo) / jnp.maximum(hi - lo, 1e-6)


@functools.partial(jax.jit, static_argnames=("out_size",))
def center_depth_estimate(image: jax.Array, out_size: int = 256) -> jax.Array:
    """Radial center-prior depth (closer at center)."""
    ys = jnp.linspace(-1, 1, out_size)
    xs = jnp.linspace(-1, 1, out_size)
    YY, XX = jnp.meshgrid(ys, xs, indexing="ij")
    r = jnp.sqrt(XX * XX + YY * YY) / jnp.sqrt(2.0)
    return jnp.broadcast_to(1.0 - r, (out_size, out_size))


class PatchFeatureExtractor:
    """Deterministic DINOv2 stand-in: (H, W, 3) -> (grid, grid, dim).

    Per 14x14-equivalent patch: mean/std color, Sobel energy, and a coarse
    5x5 pixel thumbnail, projected to `dim` with a fixed seeded random
    orthogonal-ish matrix.  Entirely jit-compiled; zero downloads.
    """

    kind = "patch"
    weights_path = None

    def __init__(self, grid: int = 37, dim: int = 384, seed: int = 0):
        self.grid = grid
        self.dim = dim
        key = jax.random.PRNGKey(seed)
        # raw stats: 3 mean + 3 std + 1 grad + 75 thumb = 82
        self._raw_dim = 82
        self.proj = jax.random.normal(key, (self._raw_dim, dim)) / jnp.sqrt(
            self._raw_dim)
        self._fn = jax.jit(self._extract)

    def _extract(self, image: jax.Array) -> jax.Array:
        g = self.grid
        size = g * 14  # 518 for the standard 37-grid
        img = jax.image.resize(image, (size, size, 3), "linear")
        patches = img.reshape(g, 14, g, 14, 3).transpose(0, 2, 1, 3, 4)
        mean = jnp.mean(patches, axis=(2, 3))                       # (g,g,3)
        std = jnp.std(patches, axis=(2, 3))
        gray = jnp.einsum("hwc,c->hw", img, jnp.array([0.299, 0.587, 0.114]))
        gx, gy = sobel_gradients(gray)
        mag = jnp.sqrt(gx * gx + gy * gy + 1e-8)
        grad = jnp.mean(mag.reshape(g, 14, g, 14).transpose(0, 2, 1, 3),
                        axis=(2, 3))[..., None]                     # (g,g,1)
        # Per-patch 5x5 thumbnail via ONE 2D resize (a 5D resize compiles
        # pathologically slowly on TPU), then regroup into patches.
        small = jax.image.resize(img, (g * 5, g * 5, 3), "linear")
        thumb = small.reshape(g, 5, g, 5, 3).transpose(0, 2, 1, 3, 4)
        thumb = thumb.reshape(g, g, 75)
        raw = jnp.concatenate([mean, std, grad, thumb], axis=-1)    # (g,g,82)
        raw = (raw - jnp.mean(raw)) / jnp.maximum(jnp.std(raw), 1e-6)
        return raw @ self.proj                                      # (g,g,dim)

    def __call__(self, image: jax.Array) -> jax.Array:
        return self._fn(image)


# ----------------------------------------------------------------------
# Real-model wrappers + weight probing
# ----------------------------------------------------------------------

_DIM_TO_SIZE = {384: "small", 768: "base", 1024: "large"}

_DINOV2_CANDIDATES = {
    "small": ("dinov2_small.pth", "dinov2_small.pt", "dinov2_small.bin",
              "dinov2_small.safetensors", "dinov2.pth",
              "dinov2_vits14_pretrain.pth"),
    "base": ("dinov2_base.pth", "dinov2_base.safetensors",
             "dinov2_vitb14_pretrain.pth"),
    "large": ("dinov2_large.pth", "dinov2_large.safetensors",
              "dinov2_vitl14_pretrain.pth"),
}
_DEPTH_CANDIDATES = ("depth_anything_v2_small.pth",
                     "depth_anything_v2_small.pt",
                     "depth_anything_v2_small.safetensors",
                     "depth_anything_v2_small.bin",
                     "depth_anything.pth", "depth_anything.safetensors")


def _probe_weights(candidates) -> "str | None":
    """Search FRESNEL_TPU_MODELS (env), ./models and ~/models for the first
    existing candidate file — the TPU analogue of the reference's
    models/-directory availability checks (reference:
    src/core/decoder/gaussian_decoder.cpp:43-71)."""
    import os

    roots = [os.environ.get("FRESNEL_TPU_MODELS"), "models",
             os.path.join(os.path.expanduser("~"), "models")]
    for root in roots:
        if not root or not os.path.isdir(root):
            continue
        for name in candidates:
            path = os.path.join(root, name)
            if os.path.exists(path):
                return path
    return None


class DINOv2FeatureExtractor:
    """Real DINOv2 features: (H, W, 3) [0,1] -> (grid, grid, dim).

    Loads a torch checkpoint STRICTLY at construction (fresnel_tpu/models/
    vit.py converters); compiles lazily on first call.  Mirrors the
    reference's ONNX DINOv2 bridge contract (reference:
    scripts/inference/dinov2_inference.py:55-75: bilinear resize to 518²,
    ImageNet normalization, patch tokens out)."""

    kind = "dinov2"

    def __init__(self, weights_path: str, grid: int = 37, dim: int = 384,
                 compute_dtype=None):
        import jax

        from fresnel_tpu.models.vit import (
            DINOv2, VIT_CONFIGS, convert_dinov2_torch, _apply_flat)

        size = _DIM_TO_SIZE.get(dim)
        if size is None:
            raise ValueError(f"no DINOv2 size with width {dim}")
        self.grid = grid
        self.dim = dim
        self.weights_path = weights_path
        self.image_size = grid * 14
        # bf16 compute (f32 params/softmax/outputs) is the TPU-standard
        # inference configuration — full MXU rate; pass jnp.float32 for
        # exact torch-parity comparisons.
        compute_dtype = jnp.bfloat16 if compute_dtype is None else compute_dtype
        self._model = DINOv2(image_size=self.image_size, dtype=compute_dtype,
                             **VIT_CONFIGS[size])
        # eval_shape: build the params tree structure without running the
        # 518² forward; the STRICT apply below fills every leaf from the
        # checkpoint, so no random values can survive.
        params = jax.eval_shape(
            self._model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, self.image_size, self.image_size, 3)))
        flat = convert_dinov2_torch(weights_path, size, self.image_size)
        self.params, _ = _apply_flat(params, flat)
        self._fn = None

    def __call__(self, image: jax.Array) -> jax.Array:
        if self._fn is None:
            model, size = self._model, self.image_size

            @jax.jit
            def run(params, image):
                x = jax.image.resize(image, (size, size, 3), "linear")
                return model.apply(params, x[None])[0]

            self._fn = run
        return self._fn(self.params, image)


class DepthAnythingEstimator:
    """Real Depth-Anything-V2 depth: (H, W, 3) [0,1] -> (out, out) in [0,1].

    Matches the reference bridge's postprocessing (reference:
    scripts/inference/depth_inference.py:59-75): min-max normalize the
    relative depth, then bilinear-resize to the requested output size."""

    kind = "depth_anything"

    def __init__(self, weights_path: str, size: str = "small",
                 compute_dtype=None):
        import jax

        from fresnel_tpu.models.vit import (
            DepthAnything, VIT_CONFIGS, convert_depth_anything_torch,
            _apply_flat)

        self.weights_path = weights_path
        compute_dtype = jnp.bfloat16 if compute_dtype is None else compute_dtype
        self._model = DepthAnything(out_size=518, dtype=compute_dtype,
                                    **VIT_CONFIGS[size])
        params = jax.eval_shape(self._model.init, jax.random.PRNGKey(0),
                                jnp.zeros((1, 518, 518, 3)))
        flat = convert_depth_anything_torch(weights_path, size)
        self.params, _ = _apply_flat(params, flat)
        self._fn = None

    def __call__(self, image: jax.Array, out_size: int = 256) -> jax.Array:
        if self._fn is None:
            model = self._model

            @functools.partial(jax.jit, static_argnames=("out_size",))
            def run(params, image, out_size):
                x = jax.image.resize(image, (518, 518, 3), "linear")
                rel = model.apply(params, x[None])[0]     # (518,518) in [0,1]
                return jax.image.resize(rel, (out_size, out_size), "linear")

            self._fn = run
        return self._fn(self.params, image, out_size)


class FusedDinoDepthEncoder:
    """Both real backbones as ONE jitted program: image -> (features, depth).

    DINOv2 and Depth-Anything share the ViT-S/14 trunk architecture; the
    fused path (fresnel_tpu/models/vit.py fused_features_and_depth) stacks
    the two weight trees and runs a single vmapped B=2 trunk forward —
    same outputs as running DINOv2FeatureExtractor and
    DepthAnythingEstimator separately (parity-tested), at roughly the cost
    of one-and-a-half trunks instead of two.  The reference necessarily
    runs these as two separate ONNX subprocesses (reference:
    src/core/features/feature_extractor.cpp:67-150,
    src/core/depth/estimator.cpp:182-255)."""

    kind = "fused_dinov2_depth_anything"

    def __init__(self, extractor: "DINOv2FeatureExtractor",
                 estimator: "DepthAnythingEstimator"):
        from fresnel_tpu.models.vit import stack_trunk_params

        fm, dm = extractor._model, estimator._model
        if (fm.width, fm.depth, fm.heads, fm.patch_size, fm.image_size,
                fm.dtype) != \
           (dm.width, dm.depth, dm.heads, dm.patch_size, dm.image_size,
                dm.dtype):
            # dtype included: the fused trunk runs at the estimator's
            # dtype, so a mixed-dtype pair would silently compute
            # features at the wrong precision instead of falling back.
            raise ValueError(
                "fused encoder needs matching trunk architectures; got "
                f"feature {fm} vs depth backbone {dm}")
        self.extractor = extractor
        self.estimator = estimator
        self.grid = extractor.grid
        self.weights_path = (extractor.weights_path, estimator.weights_path)
        self._stacked = stack_trunk_params(extractor.params, estimator.params)
        self._fn = None

    def __call__(self, image: jax.Array,
                 out_size: int = 256) -> Tuple[jax.Array, jax.Array]:
        """(H, W, 3) [0,1] -> ((grid, grid, dim) f32, (out, out) depth)."""
        if self._fn is None:
            from fresnel_tpu.models.vit import fused_features_and_depth

            model = self.estimator._model
            size = model.image_size

            @functools.partial(jax.jit, static_argnames=("out_size",))
            def run(stacked, depth_params, image, out_size):
                x = jax.image.resize(image, (size, size, 3), "linear")[None]
                feats, rel = fused_features_and_depth(
                    model, stacked, depth_params, x)
                return feats[0], jax.image.resize(
                    rel[0], (out_size, out_size), "linear")

            self._fn = run
        return self._fn(self._stacked, self.estimator.params, image,
                        out_size)


def create_fused_encoder(extractor, estimator):
    """Return a FusedDinoDepthEncoder when both callables are the real
    weight-loaded models with compatible trunks, else None (callers keep
    the two separate programs)."""
    if getattr(extractor, "kind", None) == "dinov2" and \
            getattr(estimator, "kind", None) == "depth_anything":
        try:
            return FusedDinoDepthEncoder(extractor, estimator)
        except ValueError:
            return None
    return None


class FallbackDepthEstimator:
    """Procedural estimator with the same callable shape as the real one."""

    def __init__(self, kind: str):
        self.kind = kind
        self.weights_path = None
        self._fn = (gradient_depth_estimate if kind == "gradient"
                    else center_depth_estimate)

    def __call__(self, image: jax.Array, out_size: int = 256) -> jax.Array:
        return self._fn(image, out_size)


def create_depth_estimator(kind: str = "auto"):
    """Factory mirroring the reference's create_depth_estimator (reference:
    src/core/depth/estimator.cpp:259-268): 'auto' probes standard weight
    locations (FRESNEL_TPU_MODELS env var, ./models, ~/models) for a
    Depth-Anything checkpoint and returns the real model when found, else
    the gradient fallback.  Returns a callable (image, out_size=256) ->
    depth with `.kind` / `.weights_path` attributes for reporting."""
    if kind in ("auto", "depth_anything"):
        path = _probe_weights(_DEPTH_CANDIDATES)
        if path is not None:
            return DepthAnythingEstimator(path)
        if kind == "depth_anything":
            raise FileNotFoundError(
                "no Depth-Anything weights found (set FRESNEL_TPU_MODELS or "
                f"place one of {_DEPTH_CANDIDATES} under ./models)")
        return FallbackDepthEstimator("gradient")
    if kind == "gradient":
        return FallbackDepthEstimator("gradient")
    if kind == "center":
        return FallbackDepthEstimator("center")
    raise ValueError(f"unknown depth estimator: {kind}")


def create_feature_extractor(kind: str = "auto", grid: int = 37,
                             dim: int = 384):
    """Factory mirroring the reference's create_feature_extractor (reference:
    src/core/features/feature_extractor.cpp:154-163): 'auto' probes the
    standard weight locations for a DINOv2 checkpoint of the requested width
    and returns the real ViT when found, else the deterministic patch
    extractor.  Returned callables expose `.kind` / `.weights_path`."""
    if kind in ("auto", "dinov2"):
        size = _DIM_TO_SIZE.get(dim)
        if size is not None:
            path = _probe_weights(_DINOV2_CANDIDATES[size])
            if path is not None:
                return DINOv2FeatureExtractor(path, grid=grid, dim=dim)
        if kind == "dinov2":
            raise FileNotFoundError(
                f"no DINOv2 weights found for dim={dim} (set "
                "FRESNEL_TPU_MODELS or place a checkpoint under ./models)")
    elif kind not in ("patch", "fallback"):
        raise ValueError(f"unknown feature extractor: {kind}")
    return PatchFeatureExtractor(grid=grid, dim=dim)
