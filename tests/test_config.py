"""CLI config semantics (reference parser behaviours, src/xview_et/parser.py)."""

import os

from avdn_tpu.config import parse_args


def test_defaults_and_derived_dirs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    args = parse_args(["--output_dir", "out1", "--root_dir", "data"])
    assert args.train_anno_dir == os.path.join("data", "AVDN", "annotations")
    assert os.path.isdir("out1/ckpts")
    assert os.path.isdir("out1/preds/debug_images")
    assert args.family == "et"


def test_bool_flags_accept_values(tmp_path, monkeypatch):
    # the shipped scripts pass `--eval_first True` (run_et_haa.sh:33)
    monkeypatch.chdir(tmp_path)
    args = parse_args(["--output_dir", "o", "--eval_first", "True",
                       "--submit", "True", "--inference", "True"])
    assert args.eval_first and args.submit and args.inference
    args = parse_args(["--output_dir", "o", "--eval_first", "False"])
    assert not args.eval_first
    args = parse_args(["--output_dir", "o", "--eval_first"])
    assert args.eval_first


def test_unknown_flags_ignored(tmp_path, monkeypatch):
    # parse_known_args tolerance (parser.py:102) — the shipped eval script
    # depends on it
    monkeypatch.chdir(tmp_path)
    args = parse_args(["--output_dir", "o", "--no_such_flag", "1"])
    assert args.output_dir == "o"


def test_train_val_on_full_scales_horizon(tmp_path, monkeypatch):
    # main.py:292-293
    monkeypatch.chdir(tmp_path)
    args = parse_args(["--output_dir", "o", "--max_action_len", "10",
                       "--train_val_on_full", "True"])
    assert args.max_action_len == 40
    # the GT-path pad must also widen so the concatenated trajectory's
    # appended goal view area survives batching (batcher clamps to
    # max_gt_len; the reference keeps unbounded lists, env.py:263-268)
    assert args.max_gt_len == 12 * 4 + 1


def test_unknown_optim_is_a_hard_error(tmp_path, monkeypatch):
    # the reference asserts optim in ("adam", "adamW") (agent.py:152); a
    # typo'd --optim must fail, never silently coerce (PARITY.md #10)
    import pytest

    from avdn_tpu.train.loop import train_config_from_args

    monkeypatch.chdir(tmp_path)
    args = parse_args(["--output_dir", "o", "--optim", "sgd"])
    with pytest.raises(ValueError, match="sgd"):
        train_config_from_args(args)
    # the reference parser's own default "rms" is equally rejected there
    args = parse_args(["--output_dir", "o", "--optim", "rms"])
    with pytest.raises(ValueError, match="rms"):
        train_config_from_args(args)
    for ok in ("adam", "adamW"):
        cfg = train_config_from_args(parse_args(["--output_dir", "o",
                                                 "--optim", ok]))
        assert cfg.optim == ok
    # our default is runnable (deviation: reference default is not)
    assert parse_args(["--output_dir", "o"]).optim == "adamW"


def test_bf16_tristate(tmp_path, monkeypatch):
    # default (unset): bf16 eval/serving on TPU, fp32 train + fp32 on CPU
    # backends (tests run on CPU -> eval resolves fp32 here, same
    # auto-fallback rule as render_bf16, sim/warp2pass.py)
    from avdn_tpu.train.loop import eval_bf16, train_bf16

    monkeypatch.chdir(tmp_path)
    args = parse_args(["--output_dir", "o"])
    assert args.bf16 is None
    assert train_bf16(args) is False
    import jax

    want_eval = jax.default_backend() != "cpu"
    assert eval_bf16(args) is want_eval
    # forced: both paths follow the flag on any backend
    args = parse_args(["--output_dir", "o", "--bf16", "True"])
    assert args.bf16 is True
    assert train_bf16(args) is True and eval_bf16(args) is True
    args = parse_args(["--output_dir", "o", "--bf16", "False"])
    assert args.bf16 is False
    assert train_bf16(args) is False and eval_bf16(args) is False


def test_preset_production_applies_recipe(tmp_path, monkeypatch):
    # the measured-best recipe in one flag (PERF.md "Train-step profile")
    monkeypatch.chdir(tmp_path)
    args = parse_args(["--output_dir", "o", "--preset", "production"])
    assert args.batch_size == 16
    assert args.bf16 is True
    assert args.render_twopass is True
    assert args.remat is True and args.remat_policy == "dots"


def test_preset_explicit_flags_win(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    args = parse_args(["--output_dir", "o", "--preset", "production",
                       "--batch_size", "32", "--bf16", "False"])
    assert args.batch_size == 32
    assert args.bf16 is False
    assert args.render_twopass is True  # non-overridden preset value stays
    # '=' form counts as explicit too
    args = parse_args(["--output_dir", "o", "--preset", "production",
                       "--remat_policy=full"])
    assert args.remat_policy == "full"


def test_preset_reference_is_default_and_noop(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    base = parse_args(["--output_dir", "o"])
    named = parse_args(["--output_dir", "o", "--preset", "reference"])
    assert base == named
    assert base.preset == "reference"
    assert base.batch_size == 8 and base.bf16 is None  # bf16 tristate


def test_unknown_preset_is_a_hard_error(tmp_path, monkeypatch):
    import pytest

    monkeypatch.chdir(tmp_path)
    with pytest.raises(ValueError, match="fastest"):
        parse_args(["--output_dir", "o", "--preset", "fastest"])


def test_family_flag(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    args = parse_args(["--output_dir", "o"], family="lstm")
    assert args.family == "lstm"
    args = parse_args(["--output_dir", "o", "--family", "et"], family="lstm")
    assert args.family == "et"


def test_preset_abbreviated_flag_not_silently_clobbered(tmp_path, monkeypatch):
    """allow_abbrev=False: a prefix abbreviation like --remat_pol is treated
    as an unknown flag (reference parse_known_args semantics) instead of
    being argparse-expanded and then silently overwritten by the preset
    (ADVICE r4)."""
    monkeypatch.chdir(tmp_path)
    args = parse_args(["--output_dir", "o", "--preset", "production",
                       "--remat_pol", "full"])
    # the abbreviation was ignored entirely, not half-honored: the preset's
    # value applies and nothing downstream saw a partially-parsed flag
    assert args.remat_policy == "dots"
    # the full name still counts as explicit and wins over the preset
    args = parse_args(["--output_dir", "o", "--preset", "production",
                       "--remat_policy", "full"])
    assert args.remat_policy == "full"
