"""Production parallel runtime — the driver-facing face of `parallel`.

The reference's driver initialises torch.distributed when ``world_size > 1``
(src/xview_et/main.py:294-304) but its replicas never synchronise (the DDP
wrap is commented out, SURVEY.md §2.2). Here the train/valid drivers get
*real* synced data parallelism through one small object:

* **single process** (a v5e-8 is one host): a 1-D ``data`` mesh over the
  visible chips, parameters replicated, every train AND eval batch sharded
  over the mesh — XLA inserts the mean-gradient all-reduce over ICI inside
  the jitted step;
* **multi process** (pod slices): ``jax.distributed`` bootstrap, per-process
  dataset shards feeding a *global* batch
  (``multihost_utils.host_local_array_to_global_array``), evaluation sharded
  per process on local devices with prediction dicts merged through a
  pickle all-gather (the reference's ``all_gather_object`` role,
  src/utils/distributed.py:90-130), and checkpoint/log writes gated to
  process 0.

Device-count selection: the largest divisor of the batch size that fits the
available (or ``--world_size``-requested) chips, so any batch size runs —
an awkward batch just uses fewer chips rather than erroring.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import numpy as np


_DIST_INITIALIZED = False


def maybe_init_distributed() -> None:
    """Join a multi-process cluster if ``AVDN_NUM_PROCESSES > 1`` is set.

    MUST run before anything initialises the XLA backend (any jnp op,
    ``jax.devices()``, …) — the CLI calls this before importing the train
    loop. No-op (and cheap: no jax import) when the env is absent. Guarded
    by a module flag instead of ``jax.process_count()``, which would itself
    create the backend."""
    global _DIST_INITIALIZED
    n_proc_env = int(os.environ.get("AVDN_NUM_PROCESSES", "0") or 0)
    if n_proc_env > 1 and not _DIST_INITIALIZED:
        from avdn_tpu.parallel.collectives import init_distributed

        init_distributed(
            coordinator=os.environ.get("AVDN_COORDINATOR"),
            num_processes=n_proc_env,
            process_id=int(os.environ["AVDN_PROCESS_ID"]),
        )
        _DIST_INITIALIZED = True


def _pick_dp(batch: int, n_dev: int) -> int:
    """Largest divisor of ``batch`` that is ≤ ``n_dev``."""
    for d in range(min(batch, n_dev), 0, -1):
        if batch % d == 0:
            return d
    return 1


@dataclasses.dataclass
class ParallelRuntime:
    """Everything the drivers need to place state/batches on devices."""

    mesh: Any                 # jax.sharding.Mesh, 1-D axis "data"
    n_dp: int                 # total devices on the data axis (all processes)
    process_index: int
    process_count: int
    _bank_cache: Any = None   # (local_array_id, global_array) memo

    @property
    def is_main(self) -> bool:
        return self.process_index == 0

    @property
    def multiprocess(self) -> bool:
        return self.process_count > 1

    # ---- placement -------------------------------------------------------

    def _sharding(self, spec):
        from jax.sharding import NamedSharding

        return NamedSharding(self.mesh, spec)

    @property
    def replicated(self):
        """NamedSharding replicating over the mesh (for e.g. the map bank)."""
        from jax.sharding import PartitionSpec as P

        return self._sharding(P())

    def replicate(self, tree):
        """Replicate a pytree (params/optimizer state) over the mesh."""
        import jax
        from jax.sharding import PartitionSpec as P

        if not self.multiprocess:
            return jax.device_put(tree, self._sharding(P()))
        from jax.experimental import multihost_utils

        host = jax.tree_util.tree_map(np.asarray, jax.device_get(tree))
        return multihost_utils.host_local_array_to_global_array(
            host, self.mesh, P()
        )

    def shard_batch(self, tree):
        """Shard a batch pytree's leading dimension over the data axis.

        Single process: the local batch IS the global batch. Multi process:
        each process's local batch becomes its shard of the global batch
        (global B = local B × process_count), so the in-jit loss
        normalisation by the global batch size matches DDP's mean-gradient
        semantics."""
        import jax
        from jax.sharding import PartitionSpec as P

        if not self.multiprocess:
            return jax.device_put(tree, self._sharding(P("data")))
        from jax.experimental import multihost_utils

        host = jax.tree_util.tree_map(np.asarray, jax.device_get(tree))
        return multihost_utils.host_local_array_to_global_array(
            host, self.mesh, P("data")
        )

    def place_bank(self, bank_arr):
        """Replicate the HBM map bank over the mesh.

        Multi-process train banks hold *different* maps per process (each
        process renders its own data shard); the bank is declared replicated
        so the compiled gather reads each device's local copy — no
        collective ever redistributes it. Memoised by identity: the bank
        array only changes when maps change."""
        import jax
        from jax.sharding import PartitionSpec as P

        if not self.multiprocess:
            return jax.device_put(bank_arr, self._sharding(P()))
        if (self._bank_cache is not None
                and self._bank_cache[0] is bank_arr):
            return self._bank_cache[1]
        from jax.experimental import multihost_utils

        g = multihost_utils.host_local_array_to_global_array(
            np.asarray(jax.device_get(bank_arr)), self.mesh,
            P(),
        )
        self._bank_cache = (bank_arr, g)
        return g

    def sync_bank_growth(self, bank) -> None:
        """Multi-process only: agree on one bank shape across processes so
        every replica compiles the identical program (divergent auto-grow
        would deadlock the first collective)."""
        if not self.multiprocess:
            return
        from avdn_tpu.parallel.collectives import _synced_allgather

        hw = np.asarray(
            [bank.bank_hw[0], bank.bank_hw[1], bank.n_slots], np.int64
        )
        all_hw = np.asarray(_synced_allgather(hw))
        bank.grow_to(int(all_hw[:, 0].max()), int(all_hw[:, 1].max()))

    def assert_replicas_identical(self, tree, what: str = "state") -> None:
        """Multi-process failure detection: verify every process placed the
        same replicated values (model init is seeded identically and
        checkpoints are assumed on a shared filesystem — a divergent resume,
        e.g. a node-local ckpt_dir, would otherwise train silently split).
        Compares per-leaf float64 sum fingerprints across processes."""
        if not self.multiprocess:
            return
        import jax

        from avdn_tpu.parallel.collectives import _synced_allgather

        leaves = jax.tree_util.tree_leaves(tree)
        fp = np.asarray(
            [np.sum(np.asarray(jax.device_get(l), np.float64))
             for l in leaves], np.float64,
        )
        rows = np.asarray(_synced_allgather(fp))
        for p in range(1, rows.shape[0]):
            if not np.allclose(rows[0], rows[p], rtol=1e-12, atol=0.0,
                               equal_nan=True):
                bad = int(np.argmax(~np.isclose(rows[0], rows[p],
                                                rtol=1e-12, atol=0.0,
                                                equal_nan=True)))
                raise RuntimeError(
                    f"replicated {what} differs between process 0 and "
                    f"process {p} (leaf {bad}: {rows[0][bad]} vs "
                    f"{rows[p][bad]}) — all processes must resume from the "
                    "same checkpoint (shared filesystem) and share seeds"
                )

    def any_flag(self, flag: bool) -> bool:
        """Cross-process OR of a host-side boolean (identity when single
        process). Every process must call this at the same point — it is a
        collective. Used for per-step consensus decisions (e.g. "someone
        received SIGTERM"), so replicas always break out of the step loop
        together instead of abandoning each other mid-collective."""
        if not self.multiprocess:
            return flag
        from avdn_tpu.parallel.collectives import _synced_allgather

        rows = np.asarray(_synced_allgather(np.asarray([int(flag)], np.int64)))
        return bool(rows.max())

    def describe(self) -> str:
        return (
            f"data parallel: {self.n_dp} device(s) on axis 'data' "
            f"({self.process_count} process(es), "
            f"{self.n_dp // self.process_count} local), "
            f"process {self.process_index}"
        )


class CompileSynced:
    """Wrap a jitted global-mesh function so every distinct input signature
    is AOT-compiled first and a coordination-service barrier runs before the
    first execution.

    Why: execution of an SPMD program opens the backend's cross-process
    communicator contexts, whose connect window is short (~30 s for the CPU
    backend's gloo) — while per-process XLA compiles can skew by minutes.
    Compiling ahead of time and meeting at a host barrier keeps the skew out
    of the connect window. Single-process: pass-through."""

    def __init__(self, jit_fn, name: str):
        self._fn = jit_fn
        self._name = name
        self._compiled = {}

    def __call__(self, *args):
        import jax

        leaves = jax.tree_util.tree_leaves(args)
        key = tuple((tuple(l.shape), str(getattr(l, "dtype", type(l))))
                    for l in leaves)
        if key not in self._compiled:
            from avdn_tpu.parallel.collectives import barrier

            self._compiled[key] = self._fn.lower(*args).compile()
            barrier(f"avdn_compiled_{self._name}_{len(self._compiled)}")
        return self._compiled[key](*args)


def setup_runtime(args=None, batch_size: Optional[int] = None) -> ParallelRuntime:
    """Build the driver's parallel runtime from the run config.

    Bootstrap order (must run before any other jax use of the devices):

    1. If ``AVDN_NUM_PROCESSES > 1`` is in the environment, join the
       multi-process cluster through ``jax.distributed``
       (``AVDN_COORDINATOR``/``AVDN_PROCESS_ID``); on TPU pod slices the
       same variables are auto-detected when unset.
    2. Pick the data-axis width: the largest divisor of the per-process
       batch size that fits the local chips (capped by ``--world_size``
       when > 0 in single-process mode; ``AVDN_DP_DEVICES`` caps further,
       for tests/bisection).
    """
    world_size = int(getattr(args, "world_size", 0) or 0) if args is not None else 0
    bs = int(batch_size if batch_size is not None
             else getattr(args, "batch_size", 1))

    maybe_init_distributed()
    import jax

    pc = jax.process_count()
    if world_size > 1 and pc > 1 and pc != world_size:
        raise ValueError(
            f"--world_size {world_size} but jax.process_count()={pc}: in "
            "multi-process mode world_size must equal the process count"
        )

    local = jax.local_devices()
    cap = len(local)
    if pc == 1 and world_size > 0:
        if world_size > len(local):
            raise ValueError(
                f"--world_size {world_size} requested but only "
                f"{len(local)} device(s) are visible"
            )
        cap = world_size
    env_cap = int(os.environ.get("AVDN_DP_DEVICES", "0") or 0)
    if env_cap > 0:
        cap = min(cap, env_cap)
    k = _pick_dp(bs, cap)
    if pc == 1 and world_size > 1 and k != world_size:
        if world_size > cap:
            # only reachable via the env cap — the visible-device count was
            # already checked above; name the real knob
            raise ValueError(
                f"--world_size {world_size} exceeds the usable device cap "
                f"{cap} (AVDN_DP_DEVICES={env_cap})"
            )
        raise ValueError(
            f"--world_size {world_size} does not divide batch_size {bs}; "
            "choose a batch size divisible by the worker count"
        )

    by_proc = {}
    for d in jax.devices():
        by_proc.setdefault(d.process_index, []).append(d)
    mesh_devs = [d for p in sorted(by_proc) for d in by_proc[p][:k]]
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(mesh_devs), ("data",))
    rt = ParallelRuntime(
        mesh=mesh, n_dp=k * pc,
        process_index=jax.process_index(), process_count=pc,
    )
    return rt
