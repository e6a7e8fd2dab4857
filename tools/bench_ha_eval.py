"""Teacher-forced human-attention eval bench — fused vs sequential scan.

The HA eval (src/xview_et/main.py:226-239: teacher-forced rollout
collecting per-step NSS + precision/recall) is the second half of every
validation interval. Its trajectory is model-independent, so the fused
path (rollout/fused.py) runs it as one wide render/tower call; this tool
measures both paths on the real TPU with the bench.py methodology
(in-jit repetition, perturbed inputs, host-fetch completion).

Usage: python tools/bench_ha_eval.py [--batch 16] [--horizon 5] [--no_fused]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--horizon", type=int, default=5)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--twopass", action="store_true")
    ap.add_argument("--no_fused", action="store_true")
    ns = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import __graft_entry__ as g
    from avdn_tpu.train import make_eval_rollout
    from bench import _analytic_flops, _enable_compile_cache, _mfu

    _enable_compile_cache()
    world, cfg, (bert, dk, et), state, batch = g._flagship(
        batch_size=ns.batch, map_px=1024, max_action_len=ns.horizon, seed=0,
        bf16=ns.bf16,
    )
    cfg = dataclasses.replace(
        cfg, fused_teacher=not ns.no_fused, render_twopass=ns.twopass
    )
    eval_fn = make_eval_rollout(cfg, bert, dk, et, teacher=True,
                                collect_ha=True)
    bank = jnp.asarray(world.map_bank)
    n_iters = ns.iters

    def many(state, bank, batch, rng):
        def body(i, acc):
            k = jax.random.fold_in(rng, i)
            noise = 1e-9 * jax.random.normal(
                k, batch.episode.start_corners.shape
            )
            ep = batch.episode.replace(
                start_corners=batch.episode.start_corners + noise
            )
            out = eval_fn(state, bank, batch.replace(episode=ep), k)
            return acc + out.loss + jnp.sum(out.ha_nss)

        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    f = jax.jit(many)

    def _fetch(o):
        return np.asarray(jax.device_get(o))

    t_c = time.perf_counter()
    _fetch(f(state, bank, batch, jax.random.PRNGKey(0)))
    compile_s = time.perf_counter() - t_c
    t0 = time.perf_counter()
    _fetch(f(state, bank, batch, jax.random.PRNGKey(1)))
    dt = time.perf_counter() - t0

    # analytic model FLOPs (utils/flops.py); the HA eval uses the one-pass
    # teacher trunk (collect_ha=True path)
    flops1 = _analytic_flops(batch_size=ns.batch, T=ns.horizon,
                             one_pass=True)
    out = {
        "config": {"batch": ns.batch, "T": ns.horizon, "bf16": ns.bf16,
                   "twopass": ns.twopass, "fused_teacher": not ns.no_fused},
        "eps": round(ns.batch * n_iters / dt, 2),
        "ms_per_batch": round(dt / n_iters * 1e3, 1),
        "compile_or_warm_s": round(compile_s, 1),
    }
    if flops1:
        out["model_tflops_per_sec"] = round(flops1 * n_iters / dt / 1e12, 2)
        out["mfu_pct_v5e_bf16_peak"] = _mfu(
            {"model_flops_per_sec": flops1 * n_iters / dt})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
