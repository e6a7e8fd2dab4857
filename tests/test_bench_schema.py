"""bench.py output contract.

The round driver runs ``python bench.py`` and records its single stdout
JSON line as the round's benchmark. These tests pin that contract —
required keys present, one parseable line, machine-readable ``status`` /
``headline_mode`` fields, error keys tagged consistently with each path's
success keys, and (critically) that a JSON line is still emitted when
individual measurement paths fail — without touching the TPU: the
``bench_eval``/``bench_train`` measurement functions are monkeypatched with
canned results (jax is only imported inside them, so importing the module
is free).

Headline contract since round 4: the headline is the SHIPPED eval default
(two-pass render — golden-gated in tests/test_render_mode_goldens.py); the
exact cv2-parity mode is the ``eval_exact_*`` aux row and the fallback
headline when the default path fails.
"""

import importlib.util
import io
import json
import os
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
    # default-ON since round 5; off here (it would build a REAL Navigator)
    monkeypatch.setenv("AVDN_BENCH_SERVING_E2E", "0")
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


def _is_default(kwargs):
    """bench_eval(twopass=None) is the shipped default (two-pass)."""
    return kwargs.get("twopass") is not False


def test_happy_path_schema(bench, monkeypatch):
    monkeypatch.setattr(
        bench, "bench_eval",
        lambda **k: _fake(500.0 if _is_default(k) else 100.0),
    )
    monkeypatch.setattr(bench, "bench_train", lambda **k: _fake(15.0))
    out = _run_main(bench)
    # the driver-required quartet: headline = the shipped default mode
    assert out["metric"] == "episodes_per_sec_et_eval_rollout"
    assert out["value"] == 500.0
    assert out["unit"] == "episodes/s"
    assert out["vs_baseline"] == round(500.0 / bench.REFERENCE_EPISODES_PER_SEC, 2)
    assert out["status"] == "ok"
    assert out["headline_mode"] == "twopass_bf16_default"
    # aux rows + MFU accounting (analytic — utils/flops.py)
    assert out["eval_exact_episodes_per_sec"] == 100.0
    assert out["train_episodes_per_sec"] == 15.0
    assert "eval_default_mfu_pct_v5e_bf16_peak" in out
    assert "eval_exact_mfu_pct_v5e_bf16_peak" in out
    assert "headline_note" not in out
    assert not any(k.endswith("_bench_error") for k in out)


def test_serving_e2e_row_default_on(bench, monkeypatch):
    """The full-stack serving row (round 5) runs by DEFAULT and lands its
    three keys in the JSON; =0 skips it. Stubbed: the real runner builds a
    Navigator + HTTP server (tools/bench_serving.py)."""
    import sys
    import types

    monkeypatch.setattr(
        bench, "bench_eval",
        lambda **k: _fake(500.0 if _is_default(k) else 100.0),
    )
    monkeypatch.setattr(bench, "bench_train", lambda **k: _fake(15.0))
    stub = types.ModuleType("bench_serving")
    seen = {}

    def run(ns):
        seen["serve_batch"] = ns.serve_batch
        return {"serving_e2e_eps": 459.3, "p50_ms": 474.1, "p99_ms": 716.8}

    stub.run = run
    monkeypatch.setitem(sys.modules, "bench_serving", stub)
    monkeypatch.delenv("AVDN_BENCH_SERVING_E2E", raising=False)
    out = _run_main(bench)
    assert out["serving_e2e_eps"] == 459.3
    assert out["serving_e2e_p50_ms"] == 474.1
    assert out["serving_e2e_p99_ms"] == 716.8
    assert seen["serve_batch"] == 64  # the PERF.md-recommended point
    monkeypatch.setenv("AVDN_BENCH_SERVING_E2E", "0")
    out = _run_main(bench)
    assert "serving_e2e_eps" not in out


def test_default_eval_failure_falls_back_to_exact_headline(bench, monkeypatch):
    def eval_fn(**k):
        if _is_default(k):
            raise RuntimeError("twopass path OOM")
        return _fake(100.0)

    monkeypatch.setattr(bench, "bench_eval", eval_fn)
    monkeypatch.setattr(bench, "bench_train", lambda **k: _fake(15.0))
    out = _run_main(bench)
    assert out["value"] == 100.0
    assert out["headline_mode"] == "exact_fallback"
    assert out["status"] == "degraded"
    assert out["headline_note"]
    # error key tag pairs with the success-key tag of the same path
    assert "OOM" in out["eval_default_bench_error"]
    assert "OOM" in out["ha_eval_twopass_bench_error"]  # also default mode
    assert out["train_episodes_per_sec"] == 15.0


def test_total_failure_still_emits_json(bench, monkeypatch):
    def boom(**k):
        raise RuntimeError("backend down")

    monkeypatch.setattr(bench, "bench_eval", boom)
    monkeypatch.setattr(bench, "bench_train", boom)
    out = _run_main(bench)
    assert out["value"] == 0.0 and out["vs_baseline"] == 0.0
    # a consumer must be able to tell "failed to measure" from "measured 0"
    assert out["status"] == "error"
    assert out["headline_mode"] == "none"
    for tag in ("eval_default", "eval_exact", "ha_eval_twopass", "train"):
        assert "backend down" in out[f"{tag}_bench_error"]


def test_train_failure_keeps_eval_headline(bench, monkeypatch):
    monkeypatch.setattr(bench, "bench_eval", lambda **k: _fake(500.0))
    monkeypatch.setattr(
        bench, "bench_train",
        lambda **k: (_ for _ in ()).throw(RuntimeError("train OOM")),
    )
    out = _run_main(bench)
    assert out["value"] == 500.0
    assert out["status"] == "degraded"
    assert "train OOM" in out["train_bench_error"]
    assert "train_episodes_per_sec" not in out


def test_analytic_flops_flagship_magnitudes(bench):
    """The analytic counts at flagship shapes land in the right ballpark:
    darknet-53 at 224² is ~14 GFLOP/img, so one eval episode (T=5 darknet +
    2×BERT + 5 trunk re-encodes) must be O(100 GFLOP)."""
    per_ep = bench._analytic_flops(batch_size=1, T=bench.EVAL_T)
    assert 5e10 < per_ep < 5e11, per_ep
    tr = bench._analytic_flops(batch_size=1, T=bench.TRAIN_T, train=True)
    assert tr > 3 * per_ep  # 3x backward factor, 2 rollouts, T=10
