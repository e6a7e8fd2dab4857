"""CLI surface test: invoke the module entry point exactly as the run
scripts do (reference flag names, values-style booleans)."""

import pytest

pytestmark = pytest.mark.e2e  # compile-heavy driver flow (tiered suite, README)

import json
import os
import subprocess
import sys

from fixtures import write_fixture_dataset

TINY_CFG = """
[net]
channels=3
height=224
width=224

[convolutional]
batch_normalize=1
filters=16
size=3
stride=8
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=4
pad=1
activation=leaky
"""


def test_cli_train_et(tmp_path):
    root = write_fixture_dataset(str(tmp_path / "andh"))
    out = str(tmp_path / "out")
    cfg_path = str(tmp_path / "tiny.cfg")
    with open(cfg_path, "w") as f:
        f.write(TINY_CFG)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from avdn_tpu.cli.main import main; import sys; main(sys.argv[1:], 'et')",
         "--root_dir", root, "--output_dir", out,
         "--iters", "2", "--log_every", "1", "--batch_size", "2",
         "--max_action_len", "2", "--max_instr_len", "32",
         "--dialog_pad", "48", "--demb", "32", "--encoder_heads", "2",
         "--encoder_layers", "1", "--bert_layers", "1",
         "--optim", "adamW", "--nss_w", "0.1",
         "--darknet_model_file", cfg_path,
         "--map_bank_px", "256", "--map_bank_slots", "3",
         "--eval_first", "False",
         "--some_unknown_flag", "ignored",  # parse_known_args tolerance
         ],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(__file__)),
        timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert os.path.exists(os.path.join(out, "logs", "training_args.json"))
    args_json = json.load(open(os.path.join(out, "logs", "training_args.json")))
    assert args_json["batch_size"] == 2
    assert os.path.exists(os.path.join(out, "ckpts", "best_val_unseen"))
