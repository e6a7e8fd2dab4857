"""Component microbenchmarks — per-piece timing for the PERF.md attribution
table (render / vision tower / language tower / VLN trunk), on the real TPU.

Same methodology as bench.py: repetition loop inside jit, per-iteration
input perturbation (hoist-proof), completion forced by a host fetch of the
scalar result (block_until_ready is not a sync point on this backend).

Usage: python tools/microbench.py [--batch 16] [--iters 20]
Prints one JSON line with per-component ms per call.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _timed_loop(fn_body, example, n_iters, params=None):
    """Time `n_iters` executions of fn_body(x, params) chained through a
    scalar. ``params`` (weights/bank) MUST be threaded as an argument — a
    closure capture would bake them into the HLO as literals and blow the
    remote-compile request size."""
    import jax
    import jax.numpy as jnp

    def many(x, seed, params):
        def body(i, acc):
            k = jax.random.fold_in(seed, i)
            noise = 1e-9 * jax.random.normal(k, x.shape, x.dtype) \
                if jnp.issubdtype(x.dtype, jnp.floating) else 0
            return acc + fn_body(x + noise, params)

        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    f = jax.jit(many)
    o = f(example, jax.random.PRNGKey(0), params)
    np.asarray(jax.device_get(o))  # warm + force
    t0 = time.perf_counter()
    o = f(example, jax.random.PRNGKey(1), params)
    np.asarray(jax.device_get(o))
    return (time.perf_counter() - t0) / n_iters * 1e3  # ms/call


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bf16", action="store_true")
    ns = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import __graft_entry__ as g
    from avdn_tpu.sim.render import render_batch, view_to_map_coords
    from avdn_tpu.sim.warp2pass import render_batch_twopass
    from avdn_tpu.models.darknet import fold_darknet_params
    from avdn_tpu.rollout.engine import RGB_STD

    B = ns.batch
    world, cfg, (bert, dk, et), state, batch = g._flagship(
        batch_size=B, map_px=1024, max_action_len=5, seed=0, bf16=ns.bf16,
    )
    bank = jnp.asarray(world.map_bank)
    ep = batch.episode
    quad = jnp.asarray(
        np.tile(np.array([[300., 400.], [300., 300.], [400., 300.],
                          [400., 400.]], np.float32), (B, 1, 1)))
    out = {}

    # exact 4-tap gather render
    def exact(q, bank):
        v, s = render_batch(bank, ep.map_idx, q, ep.circles, ep.n_circles)
        return jnp.sum(v) + jnp.sum(s)

    out["render_exact_ms"] = _timed_loop(exact, quad, ns.iters, bank)
    print(f"render_exact_ms={out['render_exact_ms']:.3f}", file=sys.stderr, flush=True)

    # two-pass MXU render
    def twopass(q, bank):
        v, s = render_batch_twopass(bank, ep.map_idx, q, ep.circles,
                                    ep.n_circles, crop_hw=512)
        return jnp.sum(v) + jnp.sum(s)

    out["render_twopass_ms"] = _timed_loop(twopass, quad, ns.iters, bank)
    print(f"render_twopass_ms={out['render_twopass_ms']:.3f}", file=sys.stderr, flush=True)

    # vision tower (eval mode, unfolded and folded)
    x_img = jnp.asarray(np.random.default_rng(0).uniform(
        -2, 2, (B, 224, 224, 3)).astype(np.float32))

    dk_vars = {"params": state.darknet_params}
    if state.batch_stats:
        dk_vars["batch_stats"] = state.batch_stats

    def dk_eval(x, vs):
        return jnp.sum(dk.apply(vs, x, train=False))

    out["darknet_eval_ms"] = _timed_loop(dk_eval, x_img, ns.iters, dk_vars)
    print(f"darknet_eval_ms={out['darknet_eval_ms']:.3f}", file=sys.stderr, flush=True)

    from avdn_tpu.models.darknet import Darknet
    dkf = Darknet(dk.cfg, dtype=dk.dtype, folded=True)
    fp = fold_darknet_params(dk.cfg, state.darknet_params, state.batch_stats,
                             input_std=RGB_STD)
    fp = jax.device_get(fp)

    def dk_folded(x, fp):
        return jnp.sum(dkf.apply({"params": fp}, x, train=False))

    out["darknet_folded_ms"] = _timed_loop(
        dk_folded, x_img, ns.iters,
        jax.tree_util.tree_map(jnp.asarray, fp))
    print(f"darknet_folded_ms={out['darknet_folded_ms']:.3f}", file=sys.stderr, flush=True)

    # int8 dynamic-quantized tower (--quant int8; 2x bf16 MXU peak on s8xs8)
    from avdn_tpu.models.darknet_quant import (
        quant_forward, quantize_darknet_params)
    qp = quantize_darknet_params(dk.cfg, jax.tree_util.tree_map(jnp.asarray, fp))

    def dk_int8(x, qp):
        return jnp.sum(quant_forward(dk.cfg, qp, x))

    out["darknet_int8_ms"] = _timed_loop(dk_int8, x_img, ns.iters, qp)
    print(f"darknet_int8_ms={out['darknet_int8_ms']:.3f}", file=sys.stderr, flush=True)

    # language tower (both passes)
    ids = batch.ids_instr

    def bert2(i, bp):
        f1, c1, _ = bert.apply({"params": bp}, i,
                               batch.mask_instr, deterministic=True)
        _, c2, _ = bert.apply({"params": bp}, batch.ids_dialog,
                              batch.mask_dialog, deterministic=True)
        return jnp.sum(f1) + jnp.sum(c1) + jnp.sum(c2)

    out["bert_x2_ms"] = _timed_loop(bert2, ids, ns.iters, state.bert_params)
    print(f"bert_x2_ms={out['bert_x2_ms']:.3f}", file=sys.stderr, flush=True)

    # VLN trunk (ET) at full padded history
    from avdn_tpu.train.step import _darknet_channels
    ch = _darknet_channels(dk)
    frames = jnp.asarray(np.random.default_rng(1).normal(
        0, 1, (B, 5, ch, 49)).astype(np.float32))

    def et_fwd(fr, vp):
        a, s = et.apply(
            {"params": vp}, ep.lang_feat, ep.lang_cls, fr,
            jnp.zeros((B, 5, 2)), jnp.full((B,), 5, jnp.int32),
            deterministic=True,
        )
        return jnp.sum(a) + jnp.sum(s)

    out["et_trunk_ms"] = _timed_loop(et_fwd, frames, ns.iters,
                                     state.vln_params)

    out = {k: round(v, 3) for k, v in out.items()}
    out["batch"] = B
    out["bf16"] = ns.bf16
    print(json.dumps(out))


if __name__ == "__main__":
    main()
