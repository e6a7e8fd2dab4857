"""Pinned-number regression fixture.

The reference's de-facto regression oracle is its shipped metric log
(/root/reference/datasets/XVIEW/et_haa_test/logs/valid.txt:4,11). This is
the equivalent for the fixture world: one seeded end-to-end train+eval run
whose SR/OSR/SPL/GP/IoU and HA precision/recall/NSS are frozen into
``tests/golden/e2e_metrics.json``. Any semantic drift in the oracle, the
rollout engine, the dynamics, the losses, or the metric aggregation fails
this test even when every unit test still passes.

Regenerate intentionally with ``AVDN_UPDATE_GOLDEN=1 pytest
tests/test_golden_regression.py`` and review the diff like a code change.
"""

import pytest

pytestmark = pytest.mark.e2e  # compile-heavy driver flow (tiered suite, README)

import json
import os

import numpy as np
import pytest

from fixtures import write_fixture_dataset
from test_e2e_loop import TINY_DARKNET_CFG, make_args

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "e2e_metrics.json")

# tight enough to flag semantic drift (which moves these numbers by >1e-2),
# loose enough for cross-version XLA numeric noise
RTOL, ATOL = 1e-3, 1e-3


def _run_fixture_flow(tmp_path_factory):
    """The frozen configuration: fixture dataset seed 0, ET family, 2 train
    intervals + full validation per interval, lr high enough (1e-3) that the
    progress head genuinely learns to stop near-goal episodes — the pinned
    SR/OSR/SPL are NON-zero (the thresholded metrics are exercised, not
    vacuous). Returns {step/metric: value}."""
    from avdn_tpu.train.loop import train

    root = write_fixture_dataset(str(tmp_path_factory.mktemp("andh_gold")))
    out = str(tmp_path_factory.mktemp("out_gold"))
    cfg_path = os.path.join(out, "tiny_yolo.cfg")
    with open(cfg_path, "w") as f:
        f.write(TINY_DARKNET_CFG)
    args = make_args(root, out, cfg_path, iters=8, log_every=1, seed=0,
                     lr=1e-3)
    train(args)
    recs = [json.loads(l) for l in
            open(os.path.join(args.log_dir, "metrics.jsonl"))]
    flat = {}
    for r in recs:
        step = r.get("step")
        for k, v in r.items():
            # throughput/* are wall-clock rates — machine-dependent, never
            # pinned (the golden freezes semantics, not speed)
            if (k != "step" and isinstance(v, (int, float))
                    and not k.startswith("throughput/")):
                flat[f"{step}/{k}"] = float(v)
    return flat


def test_golden_e2e_metrics(tmp_path_factory):
    got = _run_fixture_flow(tmp_path_factory)
    assert any("spl/val_unseen" in k for k in got)
    assert any("nss/" in k for k in got)
    # the fixture must keep success ACHIEVABLE: a pinned all-zero SR would
    # make every thresholded-metric gate in the suite vacuous (VERDICT r4)
    assert any(k.startswith("8/sr/") and v > 0 for k, v in got.items()), (
        "no val split has SR>0 after training — the fixture no longer "
        "exercises the thresholded metrics"
    )
    if os.environ.get("AVDN_UPDATE_GOLDEN") == "1":
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(got, f, indent=2, sort_keys=True)
        pytest.skip(f"golden regenerated at {GOLDEN_PATH}")
    assert os.path.exists(GOLDEN_PATH), (
        "golden file missing — run AVDN_UPDATE_GOLDEN=1 pytest "
        "tests/test_golden_regression.py once and commit the result"
    )
    golden = json.load(open(GOLDEN_PATH))
    assert set(got) == set(golden), (
        f"metric set changed: +{sorted(set(got) - set(golden))} "
        f"-{sorted(set(golden) - set(got))}"
    )
    for k in sorted(golden):
        np.testing.assert_allclose(
            got[k], golden[k], rtol=RTOL, atol=ATOL,
            err_msg=(f"pinned metric {k} drifted: golden {golden[k]} vs "
                     f"current {got[k]} — if intentional, regenerate with "
                     "AVDN_UPDATE_GOLDEN=1"),
        )
