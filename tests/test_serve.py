"""Serving API (avdn_tpu.serve.Navigator): checkpoint → compiled batch
inference without the eval harness. The reference has no serving surface at
all (inference requires the full main.py machinery, main.py:253-288)."""

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
