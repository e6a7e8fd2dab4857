"""End-to-end driver test: a tiny full training run through the CLI config →
dataset → map bank → train loop → eval → checkpoints, on fixture data."""

import pytest

pytestmark = pytest.mark.e2e  # compile-heavy driver flow (tiered suite, README)

import json
import os

import numpy as np
import pytest

from fixtures import write_fixture_dataset

TINY_DARKNET_CFG = """
[net]
channels=3
height=224
width=224

[convolutional]
batch_normalize=1
filters=16
size=3
stride=8
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=4
pad=1
activation=leaky
"""


@pytest.fixture(scope="module")
def run_dirs(tmp_path_factory):
    root = write_fixture_dataset(str(tmp_path_factory.mktemp("andh_e2e")))
    out = str(tmp_path_factory.mktemp("out"))
    cfg_path = os.path.join(out, "tiny_yolo.cfg")
    with open(cfg_path, "w") as f:
        f.write(TINY_DARKNET_CFG)
    return root, out, cfg_path


def make_args(root, out, cfg_path, **over):
    from avdn_tpu.config import Args, postprocess_args

    args = Args(
        root_dir=root,
        output_dir=out,
        iters=2,
        log_every=1,
        batch_size=2,
        max_action_len=2,
        max_instr_len=32,
        dialog_pad=64,
        demb=64,
        encoder_heads=4,
        encoder_layers=1,
        bert_layers=2,
        optim="adamW",
        nss_w=0.1,
        darknet_model_file=cfg_path,
        map_bank_px=256,
        map_bank_slots=3,
        family="et",
    )
    for k, v in over.items():
        setattr(args, k, v)
    return postprocess_args(args)


class TestEndToEnd:
    def test_train_loop_et(self, run_dirs):
        from avdn_tpu.train.loop import train

        root, out, cfg_path = run_dirs
        args = make_args(root, out, cfg_path)
        train(args)
        # checkpoints written
        names = os.listdir(args.ckpt_dir)
        assert any(n.startswith("latest_dict_") for n in names)
        assert "best_val_unseen" in names
        # metrics logged
        lines = open(os.path.join(args.log_dir, "metrics.jsonl")).read().splitlines()
        recs = [json.loads(l) for l in lines]
        assert any("loss/IL_loss" in r for r in recs)
        assert any(any(k.startswith("spl/") for k in r) for r in recs)

    def test_inference_resume_from_checkpoint(self, run_dirs):
        from avdn_tpu.train.loop import valid

        root, out, cfg_path = run_dirs
        args = make_args(root, out, cfg_path, inference=True)
        ckpts = sorted(os.listdir(args.ckpt_dir))
        args.resume_file = os.path.join(args.ckpt_dir, "best_val_unseen")
        valid(args)
        assert os.path.exists(os.path.join(args.log_dir, "valid.txt"))
        # inference mode writes trajectory-overlay debug images
        dbg = os.listdir(os.path.join(args.pred_dir, "debug_images"))
        assert any(f.endswith(".jpg") for f in dbg)
        # ... and per-step saliency heatmaps from the teacher-forced HA eval
        # (agent.py:694-706): pred/gt/input triples with step suffixes
        assert any("_pred_att_" in f for f in dbg)
        assert any("_gt_att_" in f for f in dbg)
        assert any("_input_" in f for f in dbg)
        # step-0 triple exists for a val_seen item
        assert any(f.startswith("val_seen") and f.endswith("_pred_att_0.jpg")
                   for f in dbg)

    def test_inference_profile_trace(self, run_dirs, tmp_path_factory):
        """--profile_dir captures a jax profiler trace during validation."""
        from avdn_tpu.train.loop import valid

        root, out, cfg_path = run_dirs
        prof = str(tmp_path_factory.mktemp("prof"))
        args = make_args(root, out, cfg_path, inference=True,
                         profile_dir=prof)
        args.resume_file = os.path.join(args.ckpt_dir, "best_val_unseen")
        valid(args)
        traces = [
            os.path.join(dp, f)
            for dp, _, fs in os.walk(prof) for f in fs
        ]
        assert any(f.endswith(".xplane.pb") or ".trace" in f for f in traces), traces

    def test_inference_submit_dumps_testset_npy(self, run_dirs, tmp_path,
                                                monkeypatch):
        """--submit adds test_unseen and dumps the Eval.ai npy
        (main.py:274-276)."""
        from avdn_tpu.train.loop import valid
        import numpy as np

        root, out, cfg_path = run_dirs
        monkeypatch.chdir(tmp_path)  # npy lands in cwd like the reference
        args = make_args(root, out, cfg_path, inference=True, submit=True)
        args.resume_file = os.path.join(args.ckpt_dir, "best_val_unseen")
        valid(args)
        assert os.path.exists("output_test_result.npy")
        preds = np.load("output_test_result.npy", allow_pickle=True).item()
        assert len(preds) >= 1
        rec = next(iter(preds.values()))
        assert "path_corners" in rec and "actions" in rec

    def test_eval_batch_size_invariance(self, run_dirs, tmp_path_factory):
        """The reference evaluates at DataLoader batch_size=1
        (main.py:118,189,269); we evaluate at --batch_size with wrap-around
        dedup. Benign deviation (PARITY.md #8): identical NAV metrics at
        any batch size.

        EXCEPTION — the HA metrics are batch-composition-dependent BY
        REFERENCE SEMANTICS: the reference records human-attention
        precision/recall/NSS for every item while the batch's episode loop
        is still running, ended or not (agent.py:673-691; preserved as
        ``ha_valid = nss_valid & any_alive`` in rollout/engine.py), so an
        ended episode keeps logging HA rows as long as a LONGER co-batched
        episode is alive. At batch 1 those extra rows never exist. The
        round-5 fixture's varied episode lengths exposed this (the old
        2-episode fixture had equal lengths); HA keys get a loose bound
        instead of exactness."""
        from avdn_tpu.train.loop import valid

        root, _, cfg_path = run_dirs
        metrics = {}
        for bs in (1, 2):
            out = str(tmp_path_factory.mktemp(f"out_bs{bs}"))
            args = make_args(root, out, cfg_path, inference=True,
                             batch_size=bs)
            valid(args)
            recs = [json.loads(l) for l in
                    open(os.path.join(args.log_dir, "metrics.jsonl"))]
            metrics[bs] = {k: v for r in recs for k, v in r.items()
                           if k != "step" and isinstance(v, (int, float))}
        assert metrics[1].keys() == metrics[2].keys() and metrics[1]
        HA_PREFIXES = ("HA_precision/", "HA_recall/", "nss/")
        assert any(k.startswith(HA_PREFIXES) for k in metrics[1])
        for k in metrics[1]:
            if k.startswith(HA_PREFIXES):
                # quirk-scale variance only (extra post-end rows of an
                # already-converged saliency head) — bound, not exact
                np.testing.assert_allclose(
                    metrics[1][k], metrics[2][k], rtol=0.10, atol=0.05,
                    err_msg=(f"HA metric {k} moved beyond the post-end "
                             "recording quirk's scale (agent.py:673-691)"),
                )
            else:
                np.testing.assert_allclose(
                    metrics[1][k], metrics[2][k], rtol=1e-5, atol=1e-6,
                    err_msg=f"metric {k} depends on eval batch size",
                )

    def test_train_loop_lstm(self, run_dirs, tmp_path_factory):
        from avdn_tpu.train.loop import train

        root, _, cfg_path = run_dirs
        out = str(tmp_path_factory.mktemp("out_lstm"))
        args = make_args(root, out, cfg_path, family="lstm", nss_w=0.0)
        train(args)
        assert any(n.startswith("latest_dict_")
                   for n in os.listdir(args.ckpt_dir))

    def test_auto_resume_and_ckpt_pruning(self, run_dirs, tmp_path_factory):
        """--resume_file latest picks the newest latest_dict_*; --ckpt_keep
        bounds the retained checkpoints (best_val_unseen never pruned);
        metrics.jsonl carries the train throughput."""
        from avdn_tpu.train.loop import train, _find_latest_checkpoint

        root, _, cfg_path = run_dirs
        out = str(tmp_path_factory.mktemp("out_resume"))
        args = make_args(root, out, cfg_path, iters=2, log_every=1,
                         ckpt_keep=1)
        train(args)
        names = sorted(os.listdir(args.ckpt_dir))
        latest = [n for n in names if n.startswith("latest_dict_")]
        assert len(latest) == 1, names  # pruned to the newest
        assert "best_val_unseen" in names
        newest = _find_latest_checkpoint(args.ckpt_dir)
        assert newest is not None and newest.endswith(latest[0])
        # auto-resume continues from the saved iteration
        args2 = make_args(root, out, cfg_path, iters=1, log_every=1,
                          ckpt_keep=1, resume_file="latest")
        train(args2)
        resumed = [n for n in os.listdir(args.ckpt_dir)
                   if n.startswith("latest_dict_")]
        assert max(int(n.split("_")[-1]) for n in resumed) > \
            int(latest[0].split("_")[-1])
        recs = [json.loads(l) for l in
                open(os.path.join(args.log_dir, "metrics.jsonl"))]
        assert any("throughput/train_eps" in r for r in recs)

    def test_auto_resume_fresh_start_when_empty(self, run_dirs,
                                                tmp_path_factory):
        """--resume_file latest with no checkpoint yet = fresh start (the
        restart-safe launcher contract)."""
        from avdn_tpu.train.loop import _find_latest_checkpoint

        assert _find_latest_checkpoint("/nonexistent/dir") is None
        empty = str(tmp_path_factory.mktemp("empty_ckpts"))
        assert _find_latest_checkpoint(empty) is None

    def test_train_loop_fast_modes(self, run_dirs, tmp_path_factory):
        """The production-speed combo through the full driver:
        --render_twopass (auto crop) + --remat + --grad_accum."""
        from avdn_tpu.train.loop import train

        root, _, cfg_path = run_dirs
        out = str(tmp_path_factory.mktemp("out_fast"))
        args = make_args(root, out, cfg_path, render_twopass=True,
                         render_crop=0, remat=True, grad_accum=2)
        train(args)
        assert args.render_crop > 0  # auto-derived
        names = os.listdir(args.ckpt_dir)
        assert "best_val_unseen" in names

    def test_train_loop_decode_trunk(self, run_dirs, tmp_path_factory):
        """--et_decode_trunk (opt-in incremental eval-scan trunk) through
        the full driver: eval metrics match the default full re-encode run
        exactly (deterministic eval, same seed)."""
        from avdn_tpu.train.loop import train

        root, _, cfg_path = run_dirs

        def metrics_of(out, **over):
            args = make_args(root, out, cfg_path, **over)
            train(args)
            recs = [json.loads(l) for l in
                    open(os.path.join(args.log_dir, "metrics.jsonl"))]
            return {
                f"{r.get('step')}/{k}": v
                for r in recs for k, v in r.items()
                if isinstance(v, (int, float)) and not k.startswith("throughput/")
            }

        m_dec = metrics_of(str(tmp_path_factory.mktemp("out_dec")),
                           et_decode_trunk=True)
        m_ref = metrics_of(str(tmp_path_factory.mktemp("out_ref")))
        assert set(m_dec) == set(m_ref)
        for k in m_ref:
            np.testing.assert_allclose(m_dec[k], m_ref[k], rtol=1e-4,
                                       atol=1e-4, err_msg=k)
