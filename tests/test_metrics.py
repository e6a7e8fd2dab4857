"""Navigation-metric spec tests (hand-computed, reference semantics
src/env.py:335-475)."""

import numpy as np
import pytest

from avdn_tpu.metrics import eval_item, eval_metrics, count_dialog_rounds

DEG_TO_M = 11.13e4


def sq(center, half):
    c = np.asarray(center, np.float64)
    return np.array(
        [[c[0] - half, c[1] - half], [c[0] - half, c[1] + half],
         [c[0] + half, c[1] + half], [c[0] + half, c[1] - half]]
    )


class TestEvalItem:
    def test_perfect_arrival(self):
        h = 50 / DEG_TO_M
        gt = [sq([0, 0], h), sq([0, 1e-3], h)]
        path_corners = [sq([0, 0], h), sq([0, 1e-3], h)]
        s = eval_item(
            [g.mean(0) for g in gt], gt,
            [p.mean(0) for p in path_corners], path_corners,
            progress=[0.1, 1.0],
        )
        assert s["success"] == 1.0
        assert s["iou"] == 1.0
        # traveled exactly the gt net length → spl == success
        assert s["spl"] == pytest.approx(1.0, abs=1e-6)
        assert s["gp"] == pytest.approx(1e-3 * DEG_TO_M, rel=1e-6)

    def test_progress_below_threshold_fails(self):
        h = 50 / DEG_TO_M
        gt = [sq([0, 0], h), sq([0, 1e-3], h)]
        path = [sq([0, 0], h), sq([0, 1e-3], h)]
        s = eval_item([g.mean(0) for g in gt], gt,
                      [p.mean(0) for p in path], path, progress=[0.1, 0.39])
        assert s["success"] == 0.0
        assert s["spl"] == 0.0

    def test_containment_required(self):
        h = 50 / DEG_TO_M
        gt = [sq([0, 0], h), sq([0, 1e-3], h)]
        # final view far away: progress high (hypothetically) but centers not
        # mutually contained → fail (env.py:354-364)
        path = [sq([0, 0], h), sq([0, 5e-3], h)]
        s = eval_item([g.mean(0) for g in gt], gt,
                      [p.mean(0) for p in path], path, progress=[0.1, 0.45])
        assert s["success"] == 0.0

    def test_oracle_strictly_greater(self):
        h = 50 / DEG_TO_M
        gt = [sq([0, 0], h), sq([0, 1e-3], h)]
        path = [sq([0, 0], h), sq([0, 1e-3], h), sq([0, 2e-3], h)]
        # passes through goal (progress 0.5) then overshoots to 0.2
        s = eval_item([g.mean(0) for g in gt], gt,
                      [p.mean(0) for p in path], path,
                      progress=[0.1, 0.5, 0.2])
        assert s["oracle_success"] == 1.0
        assert s["success"] == 0.0
        # oracle gp measured at closest point
        assert s["oracle_gp"] == pytest.approx(1e-3 * DEG_TO_M, rel=1e-5)

    def test_spl_penalises_long_paths(self):
        h = 50 / DEG_TO_M
        gt = [sq([0, 0], h), sq([0, 1e-3], h)]
        # wandering path twice as long as needed
        path = [sq([0, 0], h), sq([1e-3, 0], h), sq([0, 1e-3], h)]
        s = eval_item([g.mean(0) for g in gt], gt,
                      [p.mean(0) for p in path], path, progress=[0.1, 0.2, 0.9])
        assert 0 < s["spl"] < 1.0
        expected = s["success"] * (1e-3 * DEG_TO_M) / s["trajectory_lengths"]
        assert s["spl"] == pytest.approx(expected, rel=1e-6)


class TestAggregation:
    def _pred(self, key, num_dia, success=True, length_deg=1e-3):
        h = 50 / DEG_TO_M
        gt = [sq([0, 0], h), sq([0, length_deg], h)]
        end = [0, length_deg] if success else [0, 5 * length_deg]
        path = [sq([0, 0], h), sq(end, h)]
        return {
            "instr_id": key,
            "num_dia": num_dia,
            "path_corners": [(p, 0.0) for p in path],
            "gt_path_corners": gt,
            "gt_progress": [0.1, 0.9 if success else 0.0],
        }

    def test_slices(self):
        preds = {
            "a": self._pred("a", 1, True),
            "b": self._pred("b", 2, False),
            "c": self._pred("c", 3, True),
        }
        avg, metrics = eval_metrics(preds)
        assert avg["num_1"] == 1 and avg["num_2"] == 1 and avg["num_else"] == 1
        assert avg["sr_1"] == 100.0
        assert avg["sr_2"] == 0.0
        assert avg["sr"] == pytest.approx(100 * 2 / 3)
        assert len(metrics["instr_id"]) == 3

    def test_ha_aggregation(self):
        preds = {
            "a": {"human_att_performance": [[0.5, 0.4], [0.7, 0.6]],
                  "nss": [-1.0, -2.0]},
            "b": {"human_att_performance": [[0.1, 0.2]], "nss": [-3.0]},
        }
        avg, _ = eval_metrics(preds, human_att_eval=True)
        assert avg["HA_precision"] == pytest.approx(np.mean([0.5, 0.7, 0.1]))
        assert avg["HA_recall"] == pytest.approx(np.mean([0.4, 0.6, 0.2]))
        assert avg["nss"] == pytest.approx(np.mean([-1.5, -3.0]))


class TestDialogRounds:
    def test_counting(self):
        assert count_dialog_rounds("go north") == 1
        assert count_dialog_rounds("go north [QUE] which way? [INS] east") == 2
        # rounds opening with 'Yes' are discounted (agent.py:557-562)
        assert count_dialog_rounds("go [QUE] Yes, continue") == 1
