"""python -m avdn_tpu.warmup — AOT compile-cache priming (PERF.md "Cold
compile"). Verifies the tool compiles the full driver surface without a
dataset and populates the persistent cache directory."""

import pytest

pytestmark = pytest.mark.e2e  # compile-heavy driver flow (tiered suite, README)

import os

from test_e2e_loop import TINY_DARKNET_CFG


def test_warmup_compiles_driver_surface(tmp_path, monkeypatch):
    from avdn_tpu.config import Args, postprocess_args
    from avdn_tpu.warmup import warmup

    monkeypatch.chdir(tmp_path)
    cfg_path = str(tmp_path / "tiny.cfg")
    with open(cfg_path, "w") as f:
        f.write(TINY_DARKNET_CFG)
    args = postprocess_args(Args(
        output_dir=str(tmp_path / "out"), batch_size=2, max_action_len=2,
        max_instr_len=16, dialog_pad=32, demb=64, encoder_heads=4,
        encoder_layers=1, bert_layers=2, darknet_model_file=cfg_path,
        map_bank_px=128, map_bank_slots=2, optim="adamW",
    ))
    times = warmup(args)
    assert set(times) == {"train_step", "eval_student", "eval_teacher_ha"}
    assert all(t >= 0 for t in times.values())
    cache = os.path.join(args.output_dir, ".jax_cache")
    # the persistent cache now holds the compiled programs
    assert os.path.isdir(cache) and len(os.listdir(cache)) >= 1


def test_warmup_cli_entry(tmp_path, monkeypatch):
    """The module entry point parses config.Args flags."""
    import avdn_tpu.warmup as w

    called = {}
    monkeypatch.setattr(w, "warmup", lambda a: called.setdefault("args", a))
    w.main(["--output_dir", str(tmp_path / "o"), "--batch_size", "3"])
    assert called["args"].batch_size == 3
