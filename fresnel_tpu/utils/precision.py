"""Mixed-precision (bfloat16) training and inference utilities.

TPU-native replacement for the reference's torch.cuda.amp autocast +
GradScaler usage (reference: scripts/training/train_direct_decoder.py:440-476
wraps its forward/loss in `autocast` and scales gradients).  On TPU the story
is simpler and loss scaling is unnecessary: bfloat16 keeps float32's 8-bit
exponent (same dynamic range, fewer mantissa bits), so gradients cannot
underflow the way float16 gradients do.  The MXU natively multiplies bf16
operands ~2x faster than the fp32 (bf16x3-pass) path and halves HBM traffic
for activations.

Recipe (the standard JAX pattern):
  * parameters + optimizer state stay float32 ("master weights");
  * inside the differentiated loss, params/inputs are CAST to bf16, the
    network runs in bf16, and outputs are cast back to float32 before the
    loss math;
  * the cast is differentiable — `convert_element_type`'s transpose casts
    cotangents back up, so `jax.grad` returns float32 gradients against the
    float32 master params with no extra code.

Norm/softmax reductions run in bf16 under this scheme; flax norm layers
compute statistics in float32 internally by default, which keeps GroupNorm/
LayerNorm stable.  Loss computation always stays float32.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def cast_floats(tree: Any, dtype) -> Any:
    """Cast every floating-point array leaf of a pytree to `dtype`.

    Non-float leaves (ints, bools, PRNG keys, python scalars) pass through
    unchanged, so whole train-state / batch dicts can be cast safely.
    """

    def cast(x):
        if isinstance(x, (jnp.ndarray, jax.Array)) and jnp.issubdtype(
                x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)


def to_bf16(tree: Any) -> Any:
    """Cast float leaves to bfloat16 (compute precision)."""
    return cast_floats(tree, jnp.bfloat16)


def to_f32(tree: Any) -> Any:
    """Cast float leaves back to float32 (loss / master precision)."""
    return cast_floats(tree, jnp.float32)


def amp_apply(apply_fn, params, *args, use_amp: bool = True, **kwargs):
    """Run `apply_fn(params, *args, **kwargs)` with bf16 compute.

    Positional args are cast to bf16 (they are assumed to be array inputs);
    keyword args pass through untouched (flags like `deterministic`, rngs).
    All float outputs are cast back to float32 so downstream loss/render
    math keeps full precision.  With use_amp=False this is a plain call.
    """
    if not use_amp:
        return apply_fn(params, *args, **kwargs)
    out = apply_fn(to_bf16(params), *to_bf16(args), **kwargs)
    return to_f32(out)
