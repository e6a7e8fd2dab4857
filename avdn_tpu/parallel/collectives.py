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


_BARRIER_COUNT = 0


def barrier(name: str, timeout_ms: int = 3_600_000) -> None:
    """Host-side cross-process barrier through the jax coordination service
    (plain TCP to the coordinator — no device collective, so it tolerates
    multi-minute skew such as per-process XLA compiles; the CPU backend's
    gloo contexts only give ~30 s)."""
    import jax

    if jax.process_count() == 1:
        return
    try:
        from jax._src import distributed

        client = distributed.global_state.client
        client.wait_at_barrier(name, timeout_ms)
    except (ImportError, AttributeError):  # private API moved: best effort
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def _synced_allgather(arr: np.ndarray) -> np.ndarray:
    """process_allgather preceded by a coordination barrier: the underlying
    gloo context initialisation has a short connect window, so processes
    must arrive together (one may have just spent minutes compiling)."""
    global _BARRIER_COUNT
    from jax.experimental import multihost_utils

    _BARRIER_COUNT += 1
    barrier(f"avdn_allgather_{_BARRIER_COUNT}")
    return multihost_utils.process_allgather(arr)


def all_gather_metrics(local: Dict[str, Any]) -> List[Dict[str, Any]]:
    """Gather per-host metric dicts to every host (the reference pickles
    objects onto GPU tensors for this, src/utils/distributed.py:90-130)."""
    import jax

    if jax.process_count() == 1:
        return [local]
    # scalars only: pack values into an array, gather, rebuild
    keys = sorted(local.keys())
    vals = np.asarray([float(local[k]) for k in keys], np.float64)
    gathered = _synced_allgather(vals)
    return [dict(zip(keys, row)) for row in np.asarray(gathered)]


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every process (the
    reference's pickle-onto-GPU-tensor ``all_gather`` of prediction dicts,
    src/utils/distributed.py:90-130 — here pickle onto a padded uint8 array
    through ``process_allgather``)."""
    import jax

    if jax.process_count() == 1:
        return [obj]
    import pickle

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    # equalise lengths first (process_allgather needs one static shape)
    n = np.asarray([payload.size], np.int64)
    max_n = int(np.asarray(_synced_allgather(n)).max())
    padded = np.zeros((max_n + 8,), np.uint8)
    padded[:8] = np.frombuffer(np.int64(payload.size).tobytes(), np.uint8)
    padded[8 : 8 + payload.size] = payload
    rows = np.asarray(_synced_allgather(padded))
    out = []
    for row in rows:
        sz = int(np.frombuffer(row[:8].tobytes(), np.int64)[0])
        out.append(pickle.loads(row[8 : 8 + sz].tobytes()))
    return out


def merge_prediction_dicts(local_preds: Dict[str, Any]) -> Dict[str, Any]:
    """Union per-process prediction dicts (keyed by instr_id) across all
    processes — duplicates from wrap-around refill overwrite by key, same
    as the single-process eval (agent.py:204-206)."""
    merged: Dict[str, Any] = {}
    for preds in all_gather_objects(local_preds):
        merged.update(preds)
    return merged


def reduce_mean_metrics(local: Dict[str, float]) -> Dict[str, float]:
    """Cross-host averaged metrics (reference ``reduce_dict``,
    src/utils/distributed.py:133-157)."""
    rows = all_gather_metrics(local)
    out: Dict[str, float] = {}
    for k in rows[0]:
        out[k] = float(np.mean([r[k] for r in rows]))
    return out
