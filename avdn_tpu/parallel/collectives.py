"""Multi-host collectives + distributed init.

Replaces the reference's NCCL file-rendezvous process group and pickle-based
object all_gather (src/utils/distributed.py:21-164) with the JAX runtime:
``jax.distributed.initialize`` for process bootstrap and
``multihost_utils.process_allgather`` for host-side object/metric exchange.
In-step gradient reduction needs none of this — it's XLA collectives over
the mesh (see parallel.mesh).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Initialise the multi-process JAX runtime. With no arguments, JAX
    auto-detects the TPU pod environment. Returns the process index."""
    import jax

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator is not None:
        jax.distributed.initialize()
    return jax.process_index()


def all_gather_metrics(local: Dict[str, Any]) -> List[Dict[str, Any]]:
    """Gather per-host metric dicts to every host (the reference pickles
    objects onto GPU tensors for this, src/utils/distributed.py:90-130)."""
    import jax

    if jax.process_count() == 1:
        return [local]
    from jax.experimental import multihost_utils

    # scalars only: pack values into an array, gather, rebuild
    keys = sorted(local.keys())
    vals = np.asarray([float(local[k]) for k in keys], np.float64)
    gathered = multihost_utils.process_allgather(vals)
    return [dict(zip(keys, row)) for row in np.asarray(gathered)]


def reduce_mean_metrics(local: Dict[str, float]) -> Dict[str, float]:
    """Cross-host averaged metrics (reference ``reduce_dict``,
    src/utils/distributed.py:133-157)."""
    rows = all_gather_metrics(local)
    out: Dict[str, float] = {}
    for k in rows[0]:
        out[k] = float(np.mean([r[k] for r in rows]))
    return out
