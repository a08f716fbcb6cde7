from fresnel_tpu.parallel.mesh import (
    get_mesh,
    shard_batch,
    replicate,
    data_parallel_step,
    jit_data_parallel,
    pmean_gradients,
)

__all__ = [
    "get_mesh", "shard_batch", "replicate", "data_parallel_step",
    "jit_data_parallel", "pmean_gradients",
]
