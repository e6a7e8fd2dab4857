"""Export a trained avdn_tpu checkpoint to the reference's torch format.

The produced file is a drop-in ``best_val_unseen``-style agent checkpoint
(``{lang_model, vision_model, vln_model}``) the reference harness loads
directly with ``agent.load()`` (src/xview_et/agent.py:918-945) — the
reverse direction of ``--resume_file <released .pt>``. Round-trip identity
is pinned by tests/test_checkpoint_import.py::test_export_import_roundtrip.

Usage:
    python tools/export_torch_ckpt.py --output agent.pt \
        --resume_file <ckpt_dir or 'latest'> [usual CLI flags]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    import jax

    from avdn_tpu.config import parse_args
    from avdn_tpu.compat.torch_export import export_reference_agent
    from avdn_tpu.train import checkpoints as ckpt
    from avdn_tpu.train.loop import (
        _find_latest_checkpoint,
        build_models,
        init_state,
        train_config_from_args,
    )

    argv = list(sys.argv[1:] if argv is None else argv)
    if "--output" not in argv:
        raise SystemExit("required: --output <path.pt>")
    i = argv.index("--output")
    output = argv[i + 1]
    del argv[i : i + 2]

    args = parse_args(argv)
    if not args.resume_file:
        raise SystemExit("required: --resume_file <checkpoint dir or 'latest'>")
    cfg = train_config_from_args(args)
    bert, darknet, vln = build_models(args)
    state = init_state(args, bert, darknet, vln, cfg, jax.random.PRNGKey(0))
    resume = args.resume_file
    if resume == "latest":
        resume = _find_latest_checkpoint(args.ckpt_dir)
        if resume is None:
            raise SystemExit(f"no latest_dict_* checkpoint in {args.ckpt_dir}")
    ckpt.wait_for_saves()
    state = ckpt.load_checkpoint(resume, state)
    export_reference_agent(
        output,
        args.family,
        darknet.cfg.block_dicts(),
        {"params": state.bert_params},
        {"params": state.darknet_params, "batch_stats": state.batch_stats},
        {"params": state.vln_params},
        epoch=int(state.step),
        bert_layers=args.bert_layers,
        et_layers=args.encoder_layers,
    )
    print(f"wrote {output} ({args.family} family, step {int(state.step)})")


if __name__ == "__main__":
    main()
