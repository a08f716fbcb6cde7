"""Device mesh + SPMD helpers — the TPU-native parallelism layer.

The reference has NO distributed code (SURVEY.md §2.6); this layer is
designed fresh for TPU: data parallelism over image batches via a 1D "data"
mesh (gradient all-reduce rides ICI as an XLA psum), with an optional
"gauss" axis for sharding very large Gaussian clouds during rendering.
Multi-host extends the same meshes over DCN via jax.distributed.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(num_devices: Optional[int] = None,
             axis_names: Sequence[str] = ("data",),
             shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first num_devices devices.

    Default: 1D data-parallel mesh.  Pass shape + axis_names for 2D meshes
    (e.g. shape=(4, 2), axis_names=("data", "gauss"))."""
    devices = jax.devices()
    if num_devices is None:
        num_devices = len(devices)
    devices = devices[:num_devices]
    if shape is None:
        shape = (num_devices,)
    mesh_devices = np.asarray(devices).reshape(shape)
    return Mesh(mesh_devices, axis_names)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a batch dict with its leading dim sharded over `axis`.
    Scalars (e.g. the distill_scale knob) are replicated."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1))) if x.ndim else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def data_parallel_step(step_fn: Callable, mesh: Mesh,
                       axis: str = "data") -> Callable:
    """Wrap a per-shard train step into an SPMD step with shard_map.

    step_fn(state, batch, rng) -> (new_state, metrics) must compute grads
    internally; this wrapper runs it per shard and is written so that
    step_fn performs its own jax.lax.pmean over `axis` for gradients.
    Prefer `jit_data_parallel` below for the simpler jit-partitioner route.
    """
    from jax import shard_map

    state_spec = P()          # replicated
    batch_spec = P(axis)      # leading dim sharded
    return shard_map(
        step_fn, mesh=mesh,
        in_specs=(state_spec, batch_spec, state_spec),
        out_specs=(state_spec, state_spec),
        check_vma=False)


def jit_data_parallel(step_fn: Callable, donate_state: bool = True) -> Callable:
    """jit a train step for data parallelism via the SPMD partitioner.

    Shardings are taken from input placement: replicate the state with
    `replicate(state, mesh)` and shard batches with `shard_batch(...)`;
    XLA then inserts the gradient all-reduce (psum over ICI) automatically.
    """
    return jax.jit(step_fn, donate_argnums=(0,) if donate_state else ())


def pmean_gradients(grads, axis: str = "data"):
    """All-reduce gradients across the data axis (use inside shard_map)."""
    return jax.lax.pmean(grads, axis_name=axis)
