"""Benchmark: closed-loop episode throughput of the flagship HAA-Transformer.

Two measurements, both end-to-end under one jit on the TPU:

* **eval**: student-forced eval rollouts (the reference's headline eval flow:
  BERT ×2 → per-step render → Darknet-53 → ET → dynamics) at batch 16,
  max_action_len=5 as in the shipped eval config (validation_args.json);
* **train**: full train steps (double rollout teacher+student, 3-way AdamW,
  vln grad-clip) at batch 4, max_action_len=10 as in the shipped train
  config (parser.py --batch_size 4, run_et_haa.sh).

Baseline: the CUDA reference runs the eval loop at batch_size=1 with per-step
host OpenCV rendering + Shapely geometry (SURVEY.md §3.3). Its shipped logs
publish no throughput; we use a 4 episodes/sec estimate for a modern GPU
(≈0.25 s/episode over 5 steps of host-render→H2D→forward→D2H→host-geometry),
which is generous to the reference. ``vs_baseline`` is measured/4.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (the eval
headline) plus auxiliary keys ``train_episodes_per_sec``, the measured
shapes, per-path MFU, the serving and fast-train recipe points
(``AVDN_BENCH_SERVING=0`` / ``AVDN_BENCH_TRAIN_FAST=0`` to skip), and the
HAA-LSTM family eval when ``AVDN_BENCH_LSTM=1`` (opt-in; measured 106.7 /
519.4 eps/s exact/two-pass — see PERF.md "HAA-LSTM family").
"""

import json
import os
import time
from typing import Optional

import numpy as np

REFERENCE_EPISODES_PER_SEC = 4.0  # documented estimate, see module docstring

BATCH = 16
EVAL_T = 5    # shipped eval config (validation_args.json: max_action_len 5)
TRAIN_BATCH = 4  # shipped train config (parser.py: --batch_size 4)
TRAIN_T = 10  # shipped train config (parser.py: --max_action_len 10)


def _fetch(o):
    """Force completion by pulling the (scalar) result to host.
    ``block_until_ready`` is NOT a sync point on the remote axon backend
    (measured: it returns immediately, PERF.md "Timing methodology") — only
    a host transfer of the value actually waits for the computation."""
    import jax

    return np.asarray(jax.device_get(o))


def _timed(fn, args, warm_args):
    """Warm up with DIFFERENT arguments than the timed call — this backend's
    host dispatch caches identical calls (PERF.md)."""
    _fetch(fn(*warm_args))  # compile + warmup
    t0 = time.perf_counter()
    _fetch(fn(*args))
    return time.perf_counter() - t0


V5E_PEAK_BF16 = 1.97e14  # TPU v5e per-chip peak FLOP/s (bf16 MXU)


def _flops_per_call(jit_fn, args):
    """Model FLOPs of ONE compiled call from XLA's cost analysis (the loop
    wrappers can't be used — XLA counts a while-loop body once regardless of
    trip count). None when the backend exposes no cost model."""
    try:
        compiled = jit_fn.lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def _enable_compile_cache():
    """Persistent XLA compile cache — the full train-step grad compile takes
    ~25 min cold on this backend; cached reruns are seconds."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


def bench_eval(twopass: bool = False, batch_size: int = BATCH,
               bf16: bool = False, crop: int = 512, teacher: bool = False,
               family: str = "et"):
    import dataclasses
    import jax
    import jax.numpy as jnp
    from avdn_tpu.train import make_eval_rollout
    import __graft_entry__ as g

    world, cfg, (bert, dk, et), state, batch = g._flagship(
        batch_size=batch_size, map_px=1024, max_action_len=EVAL_T, seed=0,
        bf16=bf16, family=family,
    )
    if twopass:
        cfg = dataclasses.replace(cfg, render_twopass=True, render_crop=crop)
    # teacher=True is the human-attention eval: time-fused rollout + the
    # one-pass trunk (rollout/fused.py + models/et_fast.py)
    eval_fn = make_eval_rollout(cfg, bert, dk, et, teacher=teacher,
                                collect_ha=teacher)
    bank = jnp.asarray(world.map_bank)
    n_iters = 10

    # measure with the repetition loop INSIDE jit: this backend's host
    # dispatch pipelines/caches identical calls, so only in-graph repetition
    # reports true device time (PERF.md)
    def many(state, bank, batch, rng):
        def body(i, acc):
            k = jax.random.fold_in(rng, i)
            # hoist-proof: perturb the start pose so XLA cannot lift the
            # rng-independent rollout out of the loop (PERF.md)
            noise = 1e-9 * jax.random.normal(
                k, batch.episode.start_corners.shape
            )
            ep = batch.episode.replace(
                start_corners=batch.episode.start_corners + noise
            )
            out = eval_fn(state, bank, batch.replace(episode=ep), k)
            return acc + jnp.sum(out.actions_wp)

        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    import jax as _jax

    f = _jax.jit(many)
    dt = _timed(f, (state, bank, batch, _jax.random.PRNGKey(1)),
                (state, bank, batch, _jax.random.PRNGKey(0)))
    flops1 = _flops_per_call(_jax.jit(eval_fn),
                             (state, bank, batch, _jax.random.PRNGKey(0)))
    return {
        "eps": batch_size * n_iters / dt,
        "model_flops_per_sec": (flops1 * n_iters / dt) if flops1 else None,
        "flops_per_episode": (flops1 / batch_size) if flops1 else None,
    }


def bench_train(batch_size: int = TRAIN_BATCH, bf16: bool = False,
                twopass: bool = False, remat: Optional[str] = None):
    import dataclasses
    import jax
    import jax.numpy as jnp
    from avdn_tpu.train import make_train_step
    import __graft_entry__ as g

    world, cfg, (bert, dk, et), state, batch = g._flagship(
        batch_size=batch_size, map_px=1024, max_action_len=TRAIN_T, seed=0,
        bf16=bf16,
    )
    if twopass or remat:
        cfg = dataclasses.replace(
            cfg, render_twopass=twopass,
            remat=remat is not None,
            remat_policy=remat or "full",
        )
    step_fn = make_train_step(cfg, bert, dk, et)
    bank = jnp.asarray(world.map_bank)
    n_iters = 4

    # hoist-proof by construction: the optimizer state threads through the
    # loop carry, so every iteration depends on the previous one
    def many(state, bank, batch, rng):
        def body(i, carry):
            st, acc = carry
            k = jax.random.fold_in(rng, i)
            st, metrics = step_fn(st, bank, batch, k)
            return st, acc + metrics["loss"]

        _, acc = jax.lax.fori_loop(0, n_iters, body, (state, 0.0))
        return acc

    f = jax.jit(many)
    dt = _timed(f, (state, bank, batch, jax.random.PRNGKey(2)),
                (state, bank, batch, jax.random.PRNGKey(3)))
    step1 = jax.jit(step_fn)
    flops1 = _flops_per_call(step1,
                             (state, bank, batch, jax.random.PRNGKey(0)))
    return {
        "eps": batch_size * n_iters / dt,
        "model_flops_per_sec": (flops1 * n_iters / dt) if flops1 else None,
    }


def _mfu(r):
    f = r.get("model_flops_per_sec")
    return round(100.0 * f / V5E_PEAK_BF16, 2) if f else None


def main():
    # Every measurement is individually guarded: the driver records this
    # script's single JSON line as the round's benchmark — one failing
    # path (cold-compile OOM, backend hiccup) must degrade the report,
    # never lose it. The headline falls back exact → two-pass → error row.
    _enable_compile_cache()

    def _try(fn, *a, **k):
        try:
            return fn(*a, **k), None
        except Exception as e:  # pragma: no cover - exercised via mocks
            return None, repr(e)[:200]

    ev, ev_err = _try(bench_eval)
    ev2, ev2_err = _try(bench_eval, twopass=True)
    ha, ha_err = _try(bench_eval, twopass=True, teacher=True)
    tr, tr_err = _try(bench_train)
    headline = ev or ev2
    out = {
        # headline stays the exact-parity mode; fast modes are aux
        "metric": "episodes_per_sec_et_eval_rollout",
        "value": round(headline["eps"], 2) if headline else 0.0,
        "unit": "episodes/s",
        "vs_baseline": round(headline["eps"] / REFERENCE_EPISODES_PER_SEC, 2)
        if headline else 0.0,
        "eval_shape": f"batch={BATCH} T={EVAL_T} bert-base darknet53",
        "train_shape": f"batch={TRAIN_BATCH} T={TRAIN_T} double-rollout 3xAdamW",
    }
    if ev is None and ev2 is not None:
        out["headline_note"] = "exact eval failed; headline is two-pass mode"
    if ev2 is not None:
        out["eval_twopass_episodes_per_sec"] = round(ev2["eps"], 2)
    if ha is not None:
        out["ha_eval_twopass_episodes_per_sec"] = round(ha["eps"], 2)
    if tr is not None:
        out["train_episodes_per_sec"] = round(tr["eps"], 2)
    for tag, err in (("eval", ev_err), ("eval_twopass", ev2_err),
                     ("ha_eval", ha_err), ("train", tr_err)):
        if err:
            out[f"{tag}_bench_error"] = err
    # MFU: model FLOPs (XLA cost analysis of one compiled call) / wall time,
    # as a share of the v5e bf16 MXU peak (197 TFLOP/s). The exact-parity
    # eval computes in fp32, so its ceiling is below 100% by construction.
    if os.environ.get("AVDN_BENCH_SERVING") != "0":
        # serving point — batch 128, bf16 towers, two-pass render (PERF.md
        # "Serving scale"). crop 256: the serving point for coarse-lat_ratio
        # maps (crop is dataset-dependent — auto-crop sizes it from the
        # annotations in production). Guarded: a cold compile or OOM here
        # must not take down the headline rows (AVDN_BENCH_SERVING=0 skips).
        try:
            sv = bench_eval(twopass=True, batch_size=128, bf16=True, crop=256)
            out["serving_b128_bf16_twopass_crop256_eps"] = round(sv["eps"], 2)
            if sv.get("model_flops_per_sec"):
                out["serving_mfu_pct_v5e_bf16_peak"] = _mfu(sv)
        except Exception as e:  # pragma: no cover
            out["serving_bench_error"] = repr(e)[:200]
    if os.environ.get("AVDN_BENCH_TRAIN_FAST") != "0":
        # the optimized training recipe — batch 16, bf16 towers, two-pass
        # render, --remat_policy dots (PERF.md "Train-step profile": 47.4
        # eps/s, 13% MFU on v5e). Same guard (AVDN_BENCH_TRAIN_FAST=0 skips).
        try:
            tf = bench_train(batch_size=16, bf16=True, twopass=True,
                             remat="dots")
            out["train_fast_b16_bf16_twopass_dots_eps"] = round(tf["eps"], 2)
            if tf.get("model_flops_per_sec"):
                out["train_fast_mfu_pct_v5e_bf16_peak"] = _mfu(tf)
        except Exception as e:  # pragma: no cover
            out["train_fast_bench_error"] = repr(e)[:200]
    if os.environ.get("AVDN_BENCH_LSTM") == "1":
        # opt-in (extra cold compiles): the second model family, HAA-LSTM,
        # same eval flow (recurrent cell instead of full-history trunk)
        try:
            lv = bench_eval(family="lstm")
            out["lstm_eval_episodes_per_sec"] = round(lv["eps"], 2)
            lv2 = bench_eval(family="lstm", twopass=True)
            out["lstm_eval_twopass_episodes_per_sec"] = round(lv2["eps"], 2)
        except Exception as e:  # pragma: no cover
            out["lstm_bench_error"] = repr(e)[:200]
    for tag, r in (("eval", ev), ("eval_twopass", ev2),
                   ("ha_eval_twopass", ha), ("train", tr)):
        if r and r.get("model_flops_per_sec"):
            out[f"{tag}_model_tflops_per_sec"] = round(
                r["model_flops_per_sec"] / 1e12, 2)
            out[f"{tag}_mfu_pct_v5e_bf16_peak"] = _mfu(r)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
