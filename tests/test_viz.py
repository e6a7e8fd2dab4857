"""Visualisation smoke tests on fixture data."""

import pytest

pytestmark = pytest.mark.e2e  # spawns the CLI tool end-to-end (tiered suite)

import os
import subprocess
import sys

import numpy as np

from fixtures import write_fixture_dataset
from avdn_tpu.viz import draw_trajectory_overlay, save_saliency_heatmaps


def test_draw_trajectory_overlay(tmp_path):
    rng = np.random.default_rng(0)
    map_rgb = rng.integers(0, 256, (256, 256, 3), np.uint8)
    lat_ratio = 2e-5
    extent = 256 * lat_ratio
    quad = np.array([[1e-3, 1e-3], [1e-3, 2e-3], [2e-3, 2e-3], [2e-3, 1e-3]])
    rec = {
        "gt_path_corners": [quad, quad + 5e-4],
        "path_corners": [(quad, 0.0), (quad + 3e-4, 10.0)],
        "actions": [[np.array([0.5, 0.5]), 0.3]],
        "progress": [0.2],
        "gt_progress": [0.25],
    }
    img = draw_trajectory_overlay(map_rgb, rec, lat_ratio, extent, "go north")
    assert img.shape == map_rgb.shape
    assert not np.array_equal(img, map_rgb)  # something was drawn


def test_save_saliency_heatmaps(tmp_path):
    rng = np.random.default_rng(1)
    save_saliency_heatmaps(
        str(tmp_path), "t0",
        rng.uniform(0, 1, (224, 224)),
        (rng.uniform(0, 1, (224, 224)) > 0.7).astype(np.float32),
        rng.integers(0, 256, (224, 224, 3)).astype(np.uint8),
    )
    assert sorted(os.listdir(tmp_path)) == [
        "t0_gt_att.jpg", "t0_input.jpg", "t0_pred_att.jpg"
    ]


def test_visualize_sub_traj_cli(tmp_path):
    root = write_fixture_dataset(str(tmp_path / "andh"))
    out = tmp_path / "viz"
    r = subprocess.run(
        [sys.executable, os.path.join("tools", "visualize_sub_traj.py"),
         "--anno_dir", os.path.join(root, "AVDN", "annotations"),
         "--dataset_dir", os.path.join(root, "AVDN", "train_images"),
         "--split", "train", "--out_dir", str(out), "--limit", "2"],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert r.returncode == 0, r.stderr
    assert len(os.listdir(out)) == 2
