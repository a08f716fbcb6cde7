from fresnel_tpu.parallel.mesh import (
    get_mesh,
    shard_batch,
    replicate,
    data_parallel_step,
    jit_data_parallel,
    pmean_gradients,
)
from fresnel_tpu.parallel.tp import (
    infer_leaf_spec,
    infer_state_specs,
    shard_state,
    sharded_fraction,
)

__all__ = [
    "get_mesh", "shard_batch", "replicate", "data_parallel_step",
    "jit_data_parallel", "pmean_gradients",
    "infer_leaf_spec", "infer_state_specs", "shard_state",
    "sharded_fraction",
]
