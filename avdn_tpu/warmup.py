"""Populate the persistent XLA compile cache for a training configuration.

The full train-step gradient compile is expensive cold (measured 438 s on
the remote TPU backend — PERF.md "Cold compile"); the persistent cache
(enabled by the drivers, train/loop.py ``_enable_compile_cache``) makes
every later run start in seconds — but only AFTER someone has paid the
cold compile once. This tool pays it up front, without needing the
dataset: it AOT-compiles the exact programs the training/validation
drivers build — same model configs, same static shapes (the batch is
synthesized through the real batcher code path, so the avals are
aval-identical to production) — and reports per-program compile seconds.

    python -m avdn_tpu.warmup --output_dir runs/myrun --batch_size 4 \
        --max_action_len 10 [any config.Args flag]

Run it once on a fresh machine (or in the image build) with the same flags
as the intended training run; the training run then skips every cold
compile. A second invocation shows the warm (cached) times.
"""

from __future__ import annotations

import time
from typing import List, Optional

import numpy as np


def _synthetic_items(args, n: int) -> List[dict]:
    """ANDH-shaped items sufficient for make_train_batch (static shapes are
    what matters; values are arbitrary but geometrically sane)."""
    edge = 100.0 / 11.13e4
    items = []
    for i in range(n):
        c = np.array([edge * 4, edge * 4])
        h = edge / 2
        quad = (np.array([[h, -h], [h, h], [-h, h], [-h, -h]]) + c)
        items.append({
            "map_name": "warmup_map",
            "route_index": f"{i}_1",
            "angle": 0.0,
            "instructions": "warm up the compile cache [SEP]",
            "pre_dialogs": "[QUE] ready? [INS] yes.",
            "gt_path_corners": [quad, quad + edge],
            "attention_list": [[[float(c[0]), float(c[1])], 12]],
            "lat_ratio": 2e-5,
            "lng_ratio": 2e-5,
            "gps_botm_left": [0.0, 0.0],
            "gps_top_right": [edge * 64, edge * 64],
        })
    return items


def warmup(args, programs: Optional[List[str]] = None) -> dict:
    """AOT-compile the driver programs for ``args``. Returns
    {program_name: compile_seconds}. ``programs`` defaults to the full
    driver surface: train_step, eval_student, eval_teacher_ha."""
    import jax
    import jax.numpy as jnp

    from avdn_tpu.data.batcher import make_train_batch
    from avdn_tpu.data.tokenizer import WordPieceTokenizer
    from avdn_tpu.parallel import setup_runtime
    from avdn_tpu.train.loop import (
        _enable_compile_cache,
        batcher_config,
        build_models,
        eval_bf16,
        eval_config_from_args,
        init_state,
        train_bf16,
        train_config_from_args,
    )
    from avdn_tpu.train.step import make_eval_rollout, make_train_step

    _enable_compile_cache(args)
    if args.render_crop == 0:
        # no dataset to scan: the caller must pass --render_crop for exact
        # production parity; 512 covers lat_ratio >= 9e-6 (auto_render_crop)
        args.render_crop = 512
        print("warmup: --render_crop not set; using 512 (pass the "
              "production value for an exact cache hit)")
    runtime = setup_runtime(args)
    cfg = train_config_from_args(args)
    ecfg = eval_config_from_args(args)
    bert, darknet, vln = build_models(args)
    # mirror the driver's eval-vs-train compute dtype split (loop.py train())
    if eval_bf16(args) != train_bf16(args):
        ebert, edarknet, evln = build_models(args, bf16=eval_bf16(args))
    else:
        ebert, edarknet, evln = bert, darknet, vln
    state = init_state(args, bert, darknet, vln, cfg,
                       jax.random.PRNGKey(args.seed))
    state = runtime.replicate(state)
    tokenizer = WordPieceTokenizer.load(args.bert_vocab_file)
    bcfg = batcher_config(args)
    batch, _ = make_train_batch(_synthetic_items(args, args.batch_size),
                                tokenizer, None, bcfg)
    batch = runtime.shard_batch(batch)
    bank = runtime.place_bank(jnp.zeros(
        (args.map_bank_slots, args.map_bank_px, args.map_bank_px, 3),
        jnp.uint8))
    rng = jax.random.PRNGKey(0)

    builders = {
        # mirror the driver exactly: donated state on the train step
        # (train/loop.py), eval rollouts on the eval config
        "train_step": lambda: jax.jit(
            make_train_step(cfg, bert, darknet, vln), donate_argnums=0),
        "eval_student": lambda: jax.jit(
            make_eval_rollout(ecfg, ebert, edarknet, evln, teacher=False)),
        "eval_teacher_ha": lambda: jax.jit(
            make_eval_rollout(ecfg, ebert, edarknet, evln, teacher=True,
                              collect_ha=True)),
    }
    times = {}
    for name in programs or list(builders):
        fn = builders[name]()
        t0 = time.perf_counter()
        fn.lower(state, bank, batch, rng).compile()
        times[name] = round(time.perf_counter() - t0, 2)
        print(f"warmup: {name} compiled in {times[name]:.1f}s", flush=True)
    total = round(sum(times.values()), 2)
    print(f"warmup: done, {total:.1f}s total (cache: "
          f"{args.output_dir}/.jax_cache)")
    return times


def main(argv=None) -> None:
    from avdn_tpu.config import parse_args

    warmup(parse_args(argv))


if __name__ == "__main__":  # pragma: no cover
    main()
