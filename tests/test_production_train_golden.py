"""Metric gate for the ``--preset production`` TRAIN recipe (VERDICT r4 #2).

The production preset changes *training numerics* — bf16 tower compute,
two-pass MXU render inside the loss path, batch 16 with dots-policy remat —
for a measured 4.2x train-step throughput (PERF.md "Train-step profile";
BENCH_r04 57.48 vs 13.84 eps/s). Speed alone doesn't earn a recommendation:
this file pins the evidence that the recipe still trains to an
equivalent-or-better checkpoint.

Protocol (mirrors tests/test_render_mode_goldens.py, but for the TRAIN
side):

* the fixture is trained twice from the same seed — once with reference
  numerics (fp32, exact cv2-parity render, batch 2) and once with the
  preset's REAL combination (bf16 + two-pass render + batch 16 + dots
  remat; log_every scaled so both runs take the same 8 optimizer steps);
* both ``best_val_unseen`` checkpoints are validated with the EXACT fp32
  render at batch 2 — isolating what training numerics did to the model
  from any eval-mode approximation;
* the preset run's full metric set is pinned to a committed golden
  (``tests/golden/eval_metrics_production_train.json``);
* the preset run must not DEGRADE success metrics beyond a one-episode
  budget vs the reference-numerics run.

This is a regime gate, not bit-equality: batch 16 vs batch 2 is a different
optimization trajectory by construction (the reference trains fp32/exact at
small batch, src/xview_et/agent.py:226-251), so per-metric values legitimately
differ. Measured on the fixture (2026-08, CPU backend): the
production-trained checkpoint is BETTER, not merely equivalent —
SR 37.5/37.5 vs 25.0/31.25 (val_seen/val_unseen), SPL 34.0/31.6 vs
22.4/30.1 — and the gate would catch a recipe regression (e.g. bf16
divergence or render corruption in the loss path) as a multi-episode SR
drop.

Regenerate the pin intentionally with ``AVDN_UPDATE_GOLDEN=1 pytest
tests/test_production_train_golden.py`` and review the diff like a code
change.
"""

import pytest

pytestmark = pytest.mark.e2e  # two full fixture trainings (tiered suite)

import json
import os

import numpy as np

from fixtures import write_fixture_dataset
from test_e2e_loop import TINY_DARKNET_CFG, make_args

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "eval_metrics_production_train.json")

# the preset's real combination (config._PRESETS["production"]), at the
# fixture's scale: batch 16 covers the whole (wrapped) train split, so
# log_every=4 keeps the optimizer-step count equal to the reference run's
PRODUCTION_OVERRIDES = dict(batch_size=16, bf16=True, render_twopass=True,
                            render_crop=0, remat=True, remat_policy="dots",
                            log_every=4)


@pytest.fixture(scope="module")
def recipe_metrics(tmp_path_factory):
    """Train ref-numerics + production runs, validate both exact/fp32."""
    from avdn_tpu.train.loop import train, valid

    root = write_fixture_dataset(str(tmp_path_factory.mktemp("andh_prod")))
    cfg_path = os.path.join(str(tmp_path_factory.mktemp("cfg")), "tiny.cfg")
    with open(cfg_path, "w") as f:
        f.write(TINY_DARKNET_CFG)

    def run_train(name, **over):
        out = str(tmp_path_factory.mktemp("train_" + name))
        over.setdefault("log_every", 1)
        args = make_args(root, out, cfg_path, iters=8, seed=0, lr=1e-3,
                         **over)
        train(args)
        return os.path.join(args.ckpt_dir, "best_val_unseen")

    def eval_exact(name, ckpt):
        out = str(tmp_path_factory.mktemp("eval_" + name))
        args = make_args(root, out, cfg_path, inference=True, seed=0,
                         resume_file=ckpt, render_twopass=False, bf16=False)
        valid(args)
        recs = [json.loads(l) for l in
                open(os.path.join(args.log_dir, "metrics.jsonl"))]
        return {k: float(v) for r in recs for k, v in r.items()
                if k != "step" and isinstance(v, (int, float))
                and not k.startswith("throughput/")}

    ck_ref = run_train("ref")
    ck_prod = run_train("prod", **PRODUCTION_OVERRIDES)
    return eval_exact("ref", ck_ref), eval_exact("prod", ck_prod)


def _episodes_per_split(metrics, key):
    split = key.split("/", 1)[1]
    n = sum(v for k, v in metrics.items()
            if k.startswith("num_") and k.endswith("/" + split))
    return max(n, 1.0)


def test_production_metrics_pinned_golden(recipe_metrics):
    """The production-trained checkpoint's exact-render metrics are frozen
    to a committed golden — recipe-numerics drift fails the pin."""
    _, prod = recipe_metrics
    assert any("spl/val_unseen" in k for k in prod)
    if os.environ.get("AVDN_UPDATE_GOLDEN") == "1":
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(prod, f, indent=2, sort_keys=True)
        pytest.skip(f"golden regenerated at {GOLDEN_PATH}")
    assert os.path.exists(GOLDEN_PATH), (
        "golden missing — run AVDN_UPDATE_GOLDEN=1 pytest "
        "tests/test_production_train_golden.py once and commit the result"
    )
    golden = json.load(open(GOLDEN_PATH))
    assert set(prod) == set(golden), (
        f"metric set changed: +{sorted(set(prod) - set(golden))} "
        f"-{sorted(set(golden) - set(prod))}"
    )
    # 1e-2: the bf16 training path is the noisiest numerics in the suite
    for k in sorted(golden):
        np.testing.assert_allclose(
            prod[k], golden[k], rtol=1e-2, atol=1e-2,
            err_msg=(f"pinned production-train metric {k} drifted — if "
                     "intentional, regenerate with AVDN_UPDATE_GOLDEN=1"),
        )


def test_production_trains_success_metrics(recipe_metrics):
    """The gate checkpoint from the production recipe genuinely succeeds
    (non-vacuous thresholded metrics, same requirement as the render
    goldens)."""
    _, prod = recipe_metrics
    srs = {k: v for k, v in prod.items() if k.startswith("sr/")}
    assert srs and any(v > 0 for v in srs.values()), srs


def test_production_not_worse_than_reference(recipe_metrics):
    """THE GATE: the 4.2x recipe must not degrade what training is for.
    Success metrics (SR/OSR/SPL) may not drop more than one episode's worth
    below the reference-numerics run; goal progress within 2.5 m; IoU
    within 0.05; saliency metrics within 0.15. (Measured: the production
    run is BETTER on every success metric — see module docstring — so these
    budgets are pure regression headroom, not an equivalence claim.)"""
    ref, prod = recipe_metrics
    assert set(ref) == set(prod)
    for k in sorted(ref):
        d = prod[k] - ref[k]  # positive = production better (for gains)
        if k.startswith(("sr", "oracle_sr", "spl")):
            budget = 100.0 / _episodes_per_split(ref, k) + 1e-6
            assert d >= -budget, (
                f"production recipe degrades {k}: ref {ref[k]:.2f} vs "
                f"prod {prod[k]:.2f} (budget -{budget:.2f})"
            )
        elif k.startswith(("gp", "oracle_gp")):
            assert d >= -2.5, (
                f"production recipe degrades {k} by {-d:.2f} m"
            )
        elif k.startswith("iou"):
            assert d >= -0.05, (
                f"production recipe degrades {k}: {ref[k]:.3f} -> "
                f"{prod[k]:.3f}"
            )
        elif k.startswith(("nss", "HA_")):
            assert abs(d) <= 0.15, (
                f"production recipe moves saliency metric {k} by {d:.3f}"
            )
        # lengths/gt_length/num_* are schedule- or dataset-determined:
        # gt_length and num_* must be identical, lengths is informational
        elif k.startswith(("gt_length", "num_")):
            assert prod[k] == ref[k], k
