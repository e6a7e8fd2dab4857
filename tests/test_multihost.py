"""Multi-host smoke test: two real processes through jax.distributed.

The reference's multi-GPU path never actually synchronised anything (DDP
commented out, SURVEY.md §2.2); ours must. This spawns two OS processes,
bootstraps them through ``init_distributed`` (coordinator rendezvous, the
role of the reference's NCCL file rendezvous, src/utils/distributed.py:56-61),
and checks:

* a cross-process psum over a 2-process × k-device CPU mesh,
* ``all_gather_metrics`` / ``reduce_mean_metrics`` host-side exchange.

Runs on CPU with gloo collectives — the TPU-world pattern (pods bootstrap
the same way with auto-detected arguments).
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.multiproc  # spawns jax processes (tiered suite, README)

_WORKER = r"""
import os, sys
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2").strip()
import jax
jax.config.update("jax_platforms", "cpu")

from avdn_tpu.parallel.collectives import (
    init_distributed, all_gather_metrics, reduce_mean_metrics,
)

coord = sys.argv[1]
pid = int(sys.argv[2])
rank = init_distributed(coordinator=coord, num_processes=2, process_id=pid)
assert rank == pid, (rank, pid)
assert jax.process_count() == 2
assert jax.device_count() == 4      # 2 procs x 2 virtual cpu devices
assert len(jax.local_devices()) == 2

# cross-process psum over the global mesh
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax.experimental import multihost_utils

mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("data",))
local = np.full((2, 3), float(pid + 1), np.float32)  # 2 local shards
garr = multihost_utils.host_local_array_to_global_array(
    local, mesh, P("data"))

def f(x):
    return jax.lax.psum(jnp.sum(x, axis=-1), "data")

out = jax.jit(
    jax.shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P()),
)(garr)
got = float(np.asarray(jax.device_get(out))[0])
# rows: proc0 contributes 2 rows of 1s, proc1 2 rows of 2s -> sum = 2*3*1 + 2*3*2
assert got == 18.0, got

rows = all_gather_metrics({"loss": float(pid), "n": 1.0})
assert len(rows) == 2
assert sorted(r["loss"] for r in rows) == [0.0, 1.0]

avg = reduce_mean_metrics({"loss": float(pid)})
assert avg["loss"] == 0.5, avg

print(f"proc {pid} OK")
"""


_TRAIN_WORKER = r"""
import json, os, sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2").strip()
import jax
jax.config.update("jax_platforms", "cpu")

root, out, cfg_path = sys.argv[1], sys.argv[2], sys.argv[3]

from avdn_tpu.config import Args, postprocess_args
from avdn_tpu.train.loop import train

args = postprocess_args(Args(
    root_dir=root, output_dir=out, iters=1, log_every=1, batch_size=2,
    max_action_len=2, max_instr_len=32, dialog_pad=64, demb=64,
    encoder_heads=4, encoder_layers=1, bert_layers=2, optim="adamW",
    nss_w=0.1, darknet_model_file=cfg_path, map_bank_px=256,
    map_bank_slots=3, family="et",
))
train(args)
print(f"proc {os.environ['AVDN_PROCESS_ID']} TRAIN OK")
"""


@pytest.mark.skipif(os.environ.get("AVDN_SKIP_MULTIHOST") == "1",
                    reason="multihost smoke disabled")
def test_two_process_train_driver(tmp_path):
    """The PRODUCTION train() driver across two real jax processes: global
    batch sharded over a 2-process × 2-device mesh, per-process dataset
    shards, eval predictions merged across processes, checkpoints/logs from
    process 0 — the corrected form of the reference's distributed init that
    never synced (src/xview_et/main.py:294-304, SURVEY §2.2)."""
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import write_fixture_dataset
    from test_e2e_loop import TINY_DARKNET_CFG

    root = write_fixture_dataset(str(tmp_path / "data"))
    out = str(tmp_path / "out")
    os.makedirs(out, exist_ok=True)
    cfg_path = os.path.join(out, "tiny_yolo.cfg")
    with open(cfg_path, "w") as f:
        f.write(TINY_DARKNET_CFG)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env_base = dict(os.environ)
    env_base["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env_base.get("PYTHONPATH", "").split(os.pathsep)
    )
    env_base["AVDN_NUM_PROCESSES"] = "2"
    env_base["AVDN_COORDINATOR"] = f"127.0.0.1:{port}"
    procs = []
    for pid in range(2):
        env = dict(env_base)
        env["AVDN_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _TRAIN_WORKER, root, out, cfg_path],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        ))
    outs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(o)
    for pid, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{o[-4000:]}"
        assert f"proc {pid} TRAIN OK" in o
    # process 0 wrote checkpoints + the canonical logs
    ckpts = os.listdir(os.path.join(out, "ckpts"))
    assert any(n.startswith("latest_dict_") for n in ckpts)
    # both processes computed IDENTICAL merged eval metrics
    import json

    def metrics_of(log_dir):
        recs = [json.loads(l) for l in
                open(os.path.join(log_dir, "metrics.jsonl"))]
        # loss and throughput are per-process (wall-clock / local shard);
        # the MODEL metrics must be identical (merged predictions)
        return {f"{r.get('step')}/{k}": v for r in recs
                for k, v in r.items()
                if k != "step" and isinstance(v, (int, float))
                and k != "loss/IL_loss"
                and not k.startswith("throughput/")}

    m0 = metrics_of(os.path.join(out, "logs"))
    m1 = metrics_of(os.path.join(out, "logs", "proc1"))
    assert m0.keys() == m1.keys() and len(m0) > 0
    for k in m0:
        assert abs(m0[k] - m1[k]) < 1e-9, (k, m0[k], m1[k])


@pytest.mark.skipif(os.environ.get("AVDN_SKIP_MULTIHOST") == "1",
                    reason="multihost smoke disabled")
def test_two_process_collectives(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} OK" in out
