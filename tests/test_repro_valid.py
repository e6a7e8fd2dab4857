"""The asset-gated BASELINE reproduction entry point (tools/repro_valid.py):
must skip cleanly (exit 0, naming every missing asset) until the dataset
release is present, so reproducing valid.txt is one command the day it is."""

import os
import subprocess
import sys


def test_skips_cleanly_when_assets_missing(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "repro_valid.py"),
         "--root_dir", str(tmp_path)],
        capture_output=True, text=True, env=env, cwd=repo, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "SKIPPED" in out.stdout
    for asset in ("yolo_v3.cfg", "best_val_unseen", "vocab.txt",
                  "GeoTIFF", "annotations"):
        assert asset in out.stdout, f"missing asset {asset} not named"


def test_find_assets_detects_presence(tmp_path):
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    import repro_valid

    avdn = tmp_path / "AVDN"
    (avdn / "annotations").mkdir(parents=True)
    (avdn / "pretrain_weights").mkdir()
    (avdn / "train_images").mkdir()
    for f in ("annotations/val_seen_data.json",
              "annotations/val_unseen_data.json",
              "pretrain_weights/yolo_v3.cfg",
              "pretrain_weights/vocab.txt",
              "pretrain_weights/best_val_unseen",
              "train_images/map1.tif"):
        (avdn / f).write_text("x")
    need, missing, ckpt = repro_valid.find_assets(str(tmp_path), None)
    assert not missing
    assert ckpt.endswith("best_val_unseen")
