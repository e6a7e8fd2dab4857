"""Device mesh + sharding utilities.

The reference's scale-out story is NCCL data-parallel scaffolding that never
actually syncs gradients (the DDP wrap is commented out and no all-reduce is
ever issued — src/xview_lstm/agent.py:144-150, SURVEY.md §2.2). Here data
parallelism is *real* and TPU-native: a ``jax.sharding.Mesh`` with a
``data`` axis, batch inputs sharded over it, parameters replicated, and XLA
inserting the mean-gradient ``psum`` over ICI during the jitted train step.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code spans slices (DCN) unchanged — device order in the mesh keeps
DP groups on-slice so the gradient all-reduce rides ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_episode_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place every array of an EpisodeBatch/TrainBatch pytree with its batch
    dimension sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
