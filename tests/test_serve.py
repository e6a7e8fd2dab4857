"""Serving API (avdn_tpu.serve.Navigator): checkpoint → compiled batch
inference without the eval harness. The reference has no serving surface at
all (inference requires the full main.py machinery, main.py:253-288)."""

import pytest

pytestmark = pytest.mark.e2e  # compile-heavy driver flow (tiered suite, README)

import json
import os

import numpy as np
import pytest

from fixtures import write_fixture_dataset
from test_e2e_loop import TINY_DARKNET_CFG, make_args


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """A tiny trained run whose checkpoint the Navigator loads."""
    from avdn_tpu.train.loop import train

    root = write_fixture_dataset(str(tmp_path_factory.mktemp("andh_serve")))
    out = str(tmp_path_factory.mktemp("out_serve"))
    cfg_path = os.path.join(out, "tiny_yolo.cfg")
    with open(cfg_path, "w") as f:
        f.write(TINY_DARKNET_CFG)
    args = make_args(root, out, cfg_path, iters=1, log_every=1)
    train(args)
    return root, out, cfg_path, args


class TestNavigator:
    def test_navigate_from_checkpoint(self, trained):
        from avdn_tpu.serve import Navigator

        root, out, cfg_path, targs = trained
        args = make_args(root, out, cfg_path,
                         resume_file=os.path.join(targs.ckpt_dir,
                                                  "best_val_unseen"))
        nav = Navigator(args, serve_batch=2)
        anno = os.path.join(root, "AVDN", "annotations",
                            "val_seen_data.json")
        items = json.load(open(anno))
        preds = nav.navigate(items)
        assert len(preds) == len(items)
        rec = next(iter(preds.values()))
        assert "path_corners" in rec and "actions" in rec
        corners0, heading0 = rec["path_corners"][0]
        assert np.asarray(corners0).shape == (4, 2)
        assert len(rec["actions"]) >= 1

    def test_padding_and_chunking(self, trained):
        """3 items through serve_batch=2: one full chunk + one padded; the
        pad item must not leak into the predictions."""
        from avdn_tpu.serve import Navigator

        root, out, cfg_path, targs = trained
        args = make_args(root, out, cfg_path)
        nav = Navigator(args, serve_batch=2)
        anno = os.path.join(root, "AVDN", "annotations", "train_data.json")
        items = json.load(open(anno))[:3]
        preds = nav.navigate(items)
        assert len(preds) == 3
        want = {it["map_name"] + "__" + it["route_index"] for it in items}
        assert set(preds) == want

    def test_accepts_items_without_gt(self, trained):
        """Serving needs no ground-truth path: items with only a start view
        and dialog navigate fine (losses are compiled out)."""
        from avdn_tpu.serve import Navigator

        root, out, cfg_path, targs = trained
        args = make_args(root, out, cfg_path)
        nav = Navigator(args, serve_batch=2)
        anno = os.path.join(root, "AVDN", "annotations", "val_seen_data.json")
        raw = json.load(open(anno))[0]
        item = {
            "map_name": raw["map_name"],
            "route_index": "99_1",
            "angle": raw["angle"],
            "instructions": "Fly north to the building",
            "pre_dialogs": ["[QUE] where? [INS] north."],
            "lat_ratio": raw["lat_ratio"],
            "lng_ratio": raw["lng_ratio"],
            "gps_botm_left": raw["gps_botm_left"],
            "gps_top_right": raw["gps_top_right"],
            "start_corners": raw["gt_path_corners"][0],
        }
        preds = nav.navigate([item])
        assert len(preds) == 1
        rec = next(iter(preds.values()))
        assert len(rec["path_corners"]) >= 1

    def test_explicit_empty_gt_path_corners(self, trained):
        """An item with an EXPLICIT empty gt_path_corners list (natural for
        no-GT requests) must fall back to start_corners — not batch an empty
        list into all-zero start corners and silently navigate from (0,0)."""
        from avdn_tpu.serve import Navigator

        root, out, cfg_path, targs = trained
        args = make_args(root, out, cfg_path)
        nav = Navigator(args, serve_batch=2)
        anno = os.path.join(root, "AVDN", "annotations", "val_seen_data.json")
        raw = json.load(open(anno))[0]
        item = dict(raw, route_index="98_1", gt_path_corners=[],
                    attention_list=[],
                    start_corners=raw["gt_path_corners"][0])
        preds = nav.navigate([item])
        corners0, _ = next(iter(preds.values()))["path_corners"][0]
        want = np.asarray(raw["gt_path_corners"][0], np.float64)
        start_gps = np.asarray(corners0) + np.asarray(
            [raw["gps_botm_left"]])  # path corners are gps-offset records
        # the start view must be the provided start_corners, not zeros
        assert np.abs(start_gps - want).max() < 1e-6

    def test_resume_file_latest_sentinel(self, trained):
        """--resume_file latest resolves to the newest latest_dict_* in this
        run's ckpt dir (same sentinel the production train loop honors)."""
        from avdn_tpu.serve import Navigator

        root, out, cfg_path, targs = trained
        args = make_args(root, out, cfg_path, resume_file="latest")
        nav = Navigator(args, serve_batch=2)
        assert "latest_dict_" in nav.args.resume_file
