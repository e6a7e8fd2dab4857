"""Train-step configuration matrix bench — one config per process.

Measures the full train step (double rollout teacher+student, 3-way AdamW,
vln grad-clip 40) for one flag combination on the real TPU and prints one
JSON line. Run separately per config so an OOM in one point cannot take
down the rest of a sweep, and so the persistent compile cache amortises the
multi-minute cold grad-compiles across reruns (PERF.md "Cold compile").

Methodology identical to bench.py::bench_train: repetition loop inside jit
with the optimizer state threaded through the carry (hoist-proof by
construction), completion forced by a host fetch (block_until_ready is not
a sync point on this backend — PERF.md "Timing methodology").

Usage:
    python tools/bench_train_matrix.py --batch 16 --remat dots --twopass
    python tools/bench_train_matrix.py --batch 4 --bf16
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
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--horizon", type=int, default=10)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--twopass", action="store_true")
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--remat", choices=["none", "full", "dots"], default="none")
    ap.add_argument("--grad_accum", type=int, default=1)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--no_fused", action="store_true",
                    help="disable the time-fused teacher rollout (A/B)")
    ns = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import __graft_entry__ as g
    from avdn_tpu.train import make_train_step
    from bench import _analytic_flops, _enable_compile_cache, _mfu

    _enable_compile_cache()
    world, cfg, (bert, dk, et), state, batch = g._flagship(
        batch_size=ns.batch, map_px=1024, max_action_len=ns.horizon, seed=0,
        bf16=ns.bf16,
    )
    cfg = dataclasses.replace(
        cfg,
        render_twopass=ns.twopass,
        render_crop=ns.crop,
        remat=ns.remat != "none",
        remat_policy="dots" if ns.remat == "dots" else "full",
        grad_accum=ns.grad_accum,
        fused_teacher=not ns.no_fused,
    )
    step_fn = make_train_step(cfg, bert, dk, et)
    bank = jnp.asarray(world.map_bank)
    n_iters = ns.iters

    def many(state, bank, batch, rng):
        def body(i, carry):
            st, acc = carry
            k = jax.random.fold_in(rng, i)
            st, metrics = step_fn(st, bank, batch, k)
            return st, acc + metrics["loss"]

        _, acc = jax.lax.fori_loop(0, n_iters, body, (state, 0.0))
        return acc

    f = jax.jit(many)

    def _fetch(o):
        return np.asarray(jax.device_get(o))

    t_compile = time.perf_counter()
    _fetch(f(state, bank, batch, jax.random.PRNGKey(0)))  # compile + warm
    compile_s = time.perf_counter() - t_compile
    t0 = time.perf_counter()
    _fetch(f(state, bank, batch, jax.random.PRNGKey(1)))
    dt = time.perf_counter() - t0

    # analytic model FLOPs (utils/flops.py): trip-count-honest for the
    # scan paths, identical math across remat/fused/accum variants
    flops1 = _analytic_flops(batch_size=ns.batch, T=ns.horizon, train=True)
    out = {
        "config": {
            "batch": ns.batch, "T": ns.horizon, "bf16": ns.bf16,
            "twopass": ns.twopass, "crop": ns.crop, "remat": ns.remat,
            "grad_accum": ns.grad_accum, "fused_teacher": not ns.no_fused,
        },
        "eps": round(ns.batch * n_iters / dt, 2),
        "ms_per_step": round(dt / n_iters * 1e3, 1),
        "compile_or_warm_s": round(compile_s, 1),
    }
    if flops1:
        out["model_tflops_per_sec"] = round(flops1 * n_iters / dt / 1e12, 2)
        out["mfu_pct_v5e_bf16_peak"] = _mfu(
            {"model_flops_per_sec": flops1 * n_iters / dt})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
