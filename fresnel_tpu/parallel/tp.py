"""Tensor parallelism — weight sharding over a 2-D (data, model) mesh.

The reference has no distributed code at all (SURVEY.md §2.6); this module
is the TPU-native scale-out path for models too large to replicate: lay the
devices out as a (dp, tp) mesh, shard each large weight along its largest
tp-divisible axis over the "model" axis, keep the batch sharded over
"data", and let XLA's SPMD partitioner (GSPMD) insert the all-gathers /
reduce-scatters on ICI.  This is the scaling-book recipe — annotate
shardings, don't hand-write collectives — and it composes with the
data-parallel helpers in parallel/mesh.py (the same jitted train step runs
unmodified; only input placement changes).

Adam moments mirror parameter shapes, so the same spec inference applies
leaf-wise to the whole train state: every tensor big enough to matter is
distributed, everything else (scalars, small biases, step counters) is
replicated.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Leaves smaller than this stay replicated: sharding tiny tensors buys no
# memory and costs a collective per use.  16 KiB f32 = 4096 elements.
_MIN_SHARD_ELEMS = 4096


def infer_leaf_spec(shape: tuple, tp: int, axis: str = "model",
                    min_elems: int = _MIN_SHARD_ELEMS) -> P:
    """Megatron-style "largest divisible axis" rule for one tensor.

    Dense kernels (in, out) shard their wider dim: output-dim sharding is
    column-parallel, input-dim sharding row-parallel; XLA inserts the
    matching all-gather / reduce-scatter either way, so the simple rule of
    sharding the LARGEST tp-divisible axis minimizes per-device bytes
    without per-layer annotations.
    """
    size = 1
    for d in shape:
        size *= d
    if not shape or size < min_elems:
        return P()
    for dim in sorted(range(len(shape)), key=lambda d: shape[d],
                      reverse=True):
        if shape[dim] % tp == 0:
            spec = [None] * len(shape)
            spec[dim] = axis
            return P(*spec)
    return P()


def infer_state_specs(state: Any, mesh: Mesh, axis: str = "model",
                      min_elems: int = _MIN_SHARD_ELEMS) -> Any:
    """PartitionSpec pytree for a train state (params + optimizer moments)."""
    tp = mesh.shape[axis]
    return jax.tree.map(
        lambda x: infer_leaf_spec(getattr(x, "shape", ()), tp, axis,
                                  min_elems),
        state)


def shard_state(state: Any, mesh: Mesh, axis: str = "model",
                min_elems: int = _MIN_SHARD_ELEMS) -> Any:
    """Place a train state on the mesh with inferred tensor-parallel specs.

    Batch inputs still go through parallel/mesh.py's shard_batch over
    "data"; the jitted step picks both placements up and GSPMD partitions
    the graph.
    """
    specs = infer_state_specs(state, mesh, axis, min_elems)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs)


def sharded_fraction(state: Any, axis: str = "model") -> float:
    """Fraction of state elements actually distributed over `axis`
    (diagnostic: ~0 means the rule found nothing divisible)."""
    tot = 0
    sharded = 0
    for leaf in jax.tree.leaves(state):
        n = getattr(leaf, "size", 0)
        tot += n
        sh = getattr(leaf, "sharding", None)
        if sh is not None and getattr(sh, "spec", None) is not None:
            if any(s == axis for s in sh.spec if isinstance(s, str)):
                sharded += n
    return sharded / max(tot, 1)
