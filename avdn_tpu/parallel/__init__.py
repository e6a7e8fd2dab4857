from avdn_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_episode_batch,
)
from avdn_tpu.parallel.runtime import ParallelRuntime, setup_runtime
from avdn_tpu.parallel.collectives import (
    init_distributed,
    all_gather_metrics,
    all_gather_objects,
    merge_prediction_dicts,
    reduce_mean_metrics,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_episode_batch",
    "ParallelRuntime",
    "setup_runtime",
    "init_distributed",
    "all_gather_metrics",
    "all_gather_objects",
    "merge_prediction_dicts",
    "reduce_mean_metrics",
]
