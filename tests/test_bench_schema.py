"""bench.py output contract.

The round driver runs ``python bench.py`` and records its single stdout
JSON line as the round's benchmark. These tests pin that contract —
required keys present, one parseable line, and (critically) that a JSON
line is still emitted when individual measurement paths fail — without
touching the TPU: the ``bench_eval``/``bench_train`` measurement functions
are monkeypatched with canned results (jax is only imported inside them,
so importing the module is free).
"""

import importlib.util
import io
import json
import os
import sys
from contextlib import redirect_stdout

import pytest


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # skip the opt-in extra rows (each would cold-compile on real hardware)
    monkeypatch.setenv("AVDN_BENCH_SERVING", "0")
    monkeypatch.setenv("AVDN_BENCH_TRAIN_FAST", "0")
    monkeypatch.delenv("AVDN_BENCH_LSTM", raising=False)
    monkeypatch.setattr(mod, "_enable_compile_cache", lambda: None)
    return mod


def _run_main(mod):
    buf = io.StringIO()
    with redirect_stdout(buf):
        mod.main()
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line, got {lines}"
    return json.loads(lines[0])


def _fake(eps, flops=1.0e13):
    return {"eps": eps, "model_flops_per_sec": flops}


def test_happy_path_schema(bench, monkeypatch):
    monkeypatch.setattr(
        bench, "bench_eval", lambda **k: _fake(200.0 if k.get("twopass") else 100.0)
    )
    monkeypatch.setattr(bench, "bench_train", lambda **k: _fake(15.0))
    out = _run_main(bench)
    # the driver-required quartet
    assert out["metric"] == "episodes_per_sec_et_eval_rollout"
    assert out["value"] == 100.0
    assert out["unit"] == "episodes/s"
    assert out["vs_baseline"] == round(100.0 / bench.REFERENCE_EPISODES_PER_SEC, 2)
    # aux rows + MFU accounting
    assert out["eval_twopass_episodes_per_sec"] == 200.0
    assert out["train_episodes_per_sec"] == 15.0
    assert "eval_mfu_pct_v5e_bf16_peak" in out
    assert "headline_note" not in out
    assert not any(k.endswith("_bench_error") for k in out)


def test_exact_eval_failure_degrades_to_twopass_headline(bench, monkeypatch):
    def eval_fn(**k):
        if not k.get("twopass"):
            raise RuntimeError("exact path OOM")
        return _fake(200.0)

    monkeypatch.setattr(bench, "bench_eval", eval_fn)
    monkeypatch.setattr(bench, "bench_train", lambda **k: _fake(15.0))
    out = _run_main(bench)
    assert out["value"] == 200.0
    assert out["headline_note"]
    assert "OOM" in out["eval_bench_error"]
    assert out["train_episodes_per_sec"] == 15.0


def test_total_failure_still_emits_json(bench, monkeypatch):
    def boom(**k):
        raise RuntimeError("backend down")

    monkeypatch.setattr(bench, "bench_eval", boom)
    monkeypatch.setattr(bench, "bench_train", boom)
    out = _run_main(bench)
    assert out["value"] == 0.0 and out["vs_baseline"] == 0.0
    assert "backend down" in out["eval_bench_error"]
    assert "backend down" in out["train_bench_error"]


def test_train_failure_keeps_eval_headline(bench, monkeypatch):
    monkeypatch.setattr(bench, "bench_eval", lambda **k: _fake(100.0))
    monkeypatch.setattr(
        bench, "bench_train",
        lambda **k: (_ for _ in ()).throw(RuntimeError("train OOM")),
    )
    out = _run_main(bench)
    assert out["value"] == 100.0
    assert "train OOM" in out["train_bench_error"]
    assert "train_episodes_per_sec" not in out
