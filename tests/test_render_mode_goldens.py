"""Metric-level equivalence gate for the fast render modes.

The shipped eval/serving default renders with the two-pass MXU warp
(``eval_render_twopass`` in train/loop.py) — ~5x the exact cv2-parity
gather. This is only sound if the approximation (mean pixel error <1/255,
p99 <6/255 — PERF.md) leaves the NAVIGATION metrics untouched. This file is
that gate, at the same fixture-e2e level as tests/test_golden_regression.py:

* one checkpoint is trained with the exact render, then validated once per
  render mode (exact gather / two-pass auto-crop / two-pass + bf16 towers /
  subsample-2 gather);
* every mode's full metric set is pinned to a committed golden
  (``tests/golden/eval_metrics_<mode>.json``) — semantic drift in any mode
  fails its pin;
* the fast modes are compared metric-by-metric against the exact mode with
  explicit per-family tolerances.

Measured deltas on the fixture (2026-08, CPU backend), driving the gate
tolerances below with ~2-3x headroom:

* **thresholded nav metrics** (SR/OSR — progress >= 0.4 + mutual
  containment, env.py:335-475): identical in every mode. (All zero on the
  untrained fixture model, so this equality is weak evidence by itself —
  the margin argument comes from the continuous metrics.)
* **continuous nav metrics** (GP/OGP/IoU/SPL/lengths): <=0.16 m absolute on
  20-40 m scales, i.e. <=0.8% relative — the student-forced trajectories
  genuinely differ (closed-loop pixel noise compounds through the policy)
  but stay ~50x below the 0.4-progress success threshold's scale.
* **saliency-derived metrics** (NSS, HA precision/recall): up to 0.12
  absolute. These flow the <=6/255-pixel render difference through the
  fixture's near-random 8x8 saliency head, whose z-scoring (NSS) and
  thresholding (precision/recall) amplify noise maximally; the HA-eval
  TRAJECTORIES are teacher-forced and bit-identical across modes, so this
  is pure model-forward sensitivity, bounded here, and shrinks as the head
  trains.

Regenerate the pins intentionally with ``AVDN_UPDATE_GOLDEN=1 pytest
tests/test_render_mode_goldens.py`` and review the diff like a code change.
"""

import pytest

pytestmark = pytest.mark.e2e  # compile-heavy driver flow (tiered suite, README)

import json
import os

import numpy as np
import pytest

from fixtures import write_fixture_dataset
from test_e2e_loop import TINY_DARKNET_CFG, make_args

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

# mode name -> config overrides for the VALIDATION run
MODES = {
    "exact": dict(render_twopass=False),
    "twopass": dict(render_twopass=True, render_crop=0),   # auto-crop
    "twopass_bf16": dict(render_twopass=True, render_crop=0, bf16=True),
    "subsample2": dict(render_twopass=False, render_subsample=2),
    # int8 vision tower on top of the shipped two-pass render (--quant int8)
    "twopass_int8": dict(render_twopass=True, render_crop=0, quant="int8"),
}

# pin tolerance vs the committed golden (cross-version XLA noise)
PIN_TOL = {"exact": 1e-3, "twopass": 1e-3, "twopass_bf16": 1e-2,
           "subsample2": 1e-3, "twopass_int8": 1e-2}

# gate tolerances vs the exact mode, by metric family (see module docstring
# for the measured deltas these bound)
THRESHOLD_METRICS = ("sr/", "oracle_sr/")  # binary per-episode -> identical
SALIENCY_METRICS = ("nss/", "HA_precision/", "HA_recall/")
GATE = {  # mode -> (nav rtol+atol, saliency atol)
    "twopass": (0.02, 0.25),
    "twopass_bf16": (0.05, 0.3),
    "subsample2": (0.02, 0.25),
    "twopass_int8": (0.05, 0.3),
}


@pytest.fixture(scope="module")
def mode_metrics(tmp_path_factory):
    """Train one exact-render checkpoint, validate it under every mode."""
    from avdn_tpu.train.loop import train, valid

    root = write_fixture_dataset(str(tmp_path_factory.mktemp("andh_modes")))
    out = str(tmp_path_factory.mktemp("out_modes"))
    cfg_path = os.path.join(out, "tiny_yolo.cfg")
    with open(cfg_path, "w") as f:
        f.write(TINY_DARKNET_CFG)
    targs = make_args(root, out, cfg_path, iters=2, log_every=1, seed=0,
                      render_twopass=False)
    train(targs)
    ckpt = os.path.join(targs.ckpt_dir, "best_val_unseen")

    metrics = {}
    for mode, over in MODES.items():
        mout = str(tmp_path_factory.mktemp(f"out_{mode}"))
        args = make_args(root, mout, cfg_path, inference=True, seed=0,
                         resume_file=ckpt, **over)
        valid(args)
        recs = [json.loads(l) for l in
                open(os.path.join(args.log_dir, "metrics.jsonl"))]
        metrics[mode] = {
            k: float(v) for r in recs for k, v in r.items()
            if k != "step" and isinstance(v, (int, float))
            and not k.startswith("throughput/")
        }
    return metrics


@pytest.mark.parametrize("mode", list(MODES))
def test_mode_pinned_golden(mode_metrics, mode):
    """Each render mode's metric set is frozen to its committed golden."""
    got = mode_metrics[mode]
    assert any("spl/val_unseen" in k for k in got)
    path = os.path.join(GOLDEN_DIR, f"eval_metrics_{mode}.json")
    if os.environ.get("AVDN_UPDATE_GOLDEN") == "1":
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            json.dump(got, f, indent=2, sort_keys=True)
        pytest.skip(f"golden regenerated at {path}")
    assert os.path.exists(path), (
        f"golden file for render mode {mode!r} missing — run "
        "AVDN_UPDATE_GOLDEN=1 pytest tests/test_render_mode_goldens.py "
        "once and commit the result"
    )
    golden = json.load(open(path))
    assert set(got) == set(golden), (
        f"metric set changed for {mode}: +{sorted(set(got) - set(golden))} "
        f"-{sorted(set(golden) - set(got))}"
    )
    tol = PIN_TOL[mode]
    for k in sorted(golden):
        np.testing.assert_allclose(
            got[k], golden[k], rtol=tol, atol=tol,
            err_msg=(f"pinned {mode} metric {k} drifted — if intentional, "
                     "regenerate with AVDN_UPDATE_GOLDEN=1"),
        )


@pytest.mark.parametrize("mode", [m for m in MODES if m != "exact"])
def test_fast_mode_matches_exact_metrics(mode_metrics, mode):
    """THE GATE: a fast render mode must reproduce the exact render's
    navigation + human-attention metrics. Thresholded metrics exactly;
    continuous ones within the mode's tolerance."""
    exact, fast = mode_metrics["exact"], mode_metrics[mode]
    assert set(exact) == set(fast)
    nav_tol, sal_atol = GATE[mode]
    for k in sorted(exact):
        if any(k.startswith(p) for p in THRESHOLD_METRICS):
            assert fast[k] == exact[k], (
                f"{mode}: thresholded metric {k} flipped: exact {exact[k]} "
                f"vs {fast[k]} — the render approximation changed an "
                "episode's success outcome"
            )
        elif any(k.startswith(p) for p in SALIENCY_METRICS):
            np.testing.assert_allclose(
                fast[k], exact[k], rtol=0, atol=sal_atol,
                err_msg=(f"{mode}: saliency metric {k} deviates from the "
                         f"exact render beyond +-{sal_atol}"),
            )
        else:
            np.testing.assert_allclose(
                fast[k], exact[k], rtol=nav_tol, atol=nav_tol,
                err_msg=(f"{mode}: metric {k} deviates from the exact "
                         f"render beyond the {nav_tol} nav tolerance"),
            )
