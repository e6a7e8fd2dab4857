"""Preemption-safe shutdown: SIGTERM → checkpoint → clean exit → resume.

The reference has no preemption handling (SURVEY.md §5 — only cold
``--resume_file`` restarts). The production driver saves ``latest_dict_{step}``
on SIGTERM and exits cleanly so ``--resume_file latest`` continues from the
exact step (avdn_tpu/utils/preemption.py).
"""

import pytest

pytestmark = pytest.mark.e2e  # compile-heavy driver flow (tiered suite, README)

import os
import signal
import time

import pytest

from fixtures import write_fixture_dataset
from test_e2e_loop import TINY_DARKNET_CFG, make_args


class TestGuard:
    def test_traps_sigterm_and_restores_handler(self):
        from avdn_tpu.utils.preemption import PreemptionGuard

        prev = signal.getsignal(signal.SIGTERM)
        with PreemptionGuard() as g:
            assert not g.triggered
            os.kill(os.getpid(), signal.SIGTERM)
            for _ in range(500):  # delivery happens at a bytecode boundary
                if g.triggered:
                    break
                time.sleep(0.01)
            assert g.triggered, "SIGTERM did not set the guard flag"
        assert signal.getsignal(signal.SIGTERM) is prev

    def test_install_idempotent(self):
        from avdn_tpu.utils.preemption import PreemptionGuard

        prev = signal.getsignal(signal.SIGTERM)
        g = PreemptionGuard().install()
        g.install()  # second install must not capture our own handler
        g.uninstall()
        assert signal.getsignal(signal.SIGTERM) is prev

    def test_any_flag_single_process_identity(self):
        from avdn_tpu.parallel.runtime import setup_runtime

        rt = setup_runtime(batch_size=2)
        assert rt.any_flag(False) is False
        assert rt.any_flag(True) is True


class _FakeGuard:
    """Reports a preemption signal on the first poll (i.e. right after the
    first completed train step)."""

    def __init__(self, *a, **k):
        self.triggered = True

    def install(self):
        return self

    def uninstall(self):
        pass


@pytest.fixture(scope="module")
def run_dirs(tmp_path_factory):
    root = write_fixture_dataset(str(tmp_path_factory.mktemp("andh_pre")))
    out = str(tmp_path_factory.mktemp("out_pre"))
    cfg_path = os.path.join(out, "tiny_yolo.cfg")
    with open(cfg_path, "w") as f:
        f.write(TINY_DARKNET_CFG)
    return root, out, cfg_path


class TestPreemptedTraining:
    def test_preempt_saves_step_checkpoint_and_resume_continues(
        self, run_dirs, monkeypatch
    ):
        from avdn_tpu.train.loop import train
        import avdn_tpu.utils.preemption as pre

        root, out, cfg_path = run_dirs
        args = make_args(root, out, cfg_path, iters=4)

        with monkeypatch.context() as m:
            m.setattr(pre, "PreemptionGuard", _FakeGuard)
            train(args)

        # exactly one step ran before the (fake) signal: its checkpoint
        # exists and no interval checkpoint was written
        names = os.listdir(args.ckpt_dir)
        assert "latest_dict_1" in names, names
        assert not any(n.startswith("latest_dict_") and n != "latest_dict_1"
                       for n in names)
        log = open(os.path.join(args.log_dir, "train.txt")).read()
        assert "preemption signal — saved latest_dict_1" in log

        # relaunch with auto-resume: continues from step 1 and completes the
        # remaining schedule normally (interval checkpoints + best ckpt)
        args2 = make_args(root, out, cfg_path, iters=4,
                          resume_file="latest")
        train(args2)
        log = open(os.path.join(args2.log_dir, "train.txt")).read()
        assert "auto-resume" in log and "latest_dict_1" in log
        names = os.listdir(args2.ckpt_dir)
        assert any(n.startswith("latest_dict_") and n != "latest_dict_1"
                   for n in names), names
        assert "best_val_unseen" in names

    def test_preempt_save_off_leaves_no_trap(self, run_dirs, monkeypatch):
        """--preempt_save False: the loop must not install any guard."""
        from avdn_tpu.train.loop import train
        import avdn_tpu.utils.preemption as pre

        root, out, cfg_path = run_dirs

        class Boom:
            def __init__(self, *a, **k):
                raise AssertionError("guard installed despite --preempt_save False")

        monkeypatch.setattr(pre, "PreemptionGuard", Boom)
        out2 = os.path.join(out, "nopreempt")
        os.makedirs(out2, exist_ok=True)
        args = make_args(root, out2, cfg_path, iters=2, preempt_save=False)
        train(args)
        assert any(n.startswith("latest_dict_")
                   for n in os.listdir(args.ckpt_dir))
