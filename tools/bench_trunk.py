"""A/B bench: eval-trunk reformulations (models/et_fast.py) on the real TPU.

Measures the end-to-end eval rollout with ``fast_eval_trunk`` on vs off for
the flows it touches:

* student-forced eval (incremental KV decode in the scan) — exact and
  two-pass render;
* teacher-forced HA eval via the fused path (single causal trunk pass);
* the serving point (batch 128, bf16 towers, two-pass crop 256).

Same hoist-proof methodology as bench.py. Prints one JSON line.
Usage: python tools/bench_trunk.py [--serving] [--iters 10]
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


def _run(teacher, fast, twopass, batch_size, bf16, crop, T, n_iters,
         lang_tokens=24):
    import jax
    import jax.numpy as jnp
    from avdn_tpu.train import make_eval_rollout
    import __graft_entry__ as g

    world, cfg, (bert, dk, et), state, batch = g._flagship(
        batch_size=batch_size, map_px=1024, max_action_len=T, seed=0,
        bf16=bf16, lang_tokens=lang_tokens,
    )
    # teacher flows use the one-pass trunk; student scans the KV decode
    cfg = dataclasses.replace(
        cfg, render_twopass=twopass, render_crop=crop,
        fast_eval_trunk=fast if teacher else False,
        et_decode_trunk=fast if not teacher else False,
    )
    eval_fn = make_eval_rollout(cfg, bert, dk, et, teacher=teacher,
                                collect_ha=teacher)
    bank = jnp.asarray(world.map_bank)

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
            return acc + jnp.sum(out.actions_wp)

        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    f = jax.jit(many)
    np.asarray(jax.device_get(f(state, bank, batch, jax.random.PRNGKey(0))))
    t0 = time.perf_counter()
    np.asarray(jax.device_get(f(state, bank, batch, jax.random.PRNGKey(1))))
    dt = time.perf_counter() - t0
    return batch_size * n_iters / dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--serving", action="store_true")
    ap.add_argument("--only", default="", help="substring filter on flow names")
    ns = ap.parse_args(argv)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    out = {}
    flows = [
        ("eval_exact", dict(teacher=False, twopass=False, batch_size=16,
                            bf16=False, crop=512, T=5)),
        ("eval_twopass", dict(teacher=False, twopass=True, batch_size=16,
                              bf16=False, crop=512, T=5)),
        ("ha_eval_twopass", dict(teacher=True, twopass=True, batch_size=16,
                                 bf16=False, crop=512, T=5)),
        # real dialogs run at --max_instr_len 100; the trunk share grows
        # with L so the reformulations matter most here
        ("eval_twopass_L100", dict(teacher=False, twopass=True, batch_size=16,
                                   bf16=False, crop=512, T=5,
                                   lang_tokens=100)),
        ("ha_eval_twopass_L100", dict(teacher=True, twopass=True,
                                      batch_size=16, bf16=False, crop=512,
                                      T=5, lang_tokens=100)),
    ]
    if ns.serving:
        flows.append(
            ("serving_b128", dict(teacher=False, twopass=True, batch_size=128,
                                  bf16=True, crop=256, T=5))
        )
        flows.append(
            ("serving_b128_L100", dict(teacher=False, twopass=True,
                                       batch_size=128, bf16=True, crop=256,
                                       T=5, lang_tokens=100))
        )
    for name, kw in flows:
        if ns.only and ns.only not in name:
            continue
        for fast in (False, True):
            eps = _run(fast=fast, n_iters=ns.iters, **kw)
            out[f"{name}_{'fast' if fast else 'full'}_eps"] = round(eps, 1)
        out[f"{name}_speedup"] = round(
            out[f"{name}_fast_eps"] / out[f"{name}_full_eps"], 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
