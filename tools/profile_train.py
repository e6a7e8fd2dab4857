"""Device-time attribution for the train step, from a real profiler trace.

Captures a ``jax.profiler`` trace around a few flagship train steps and
parses the XPlane protobuf directly (``tensorflow.tsl.profiler.protobuf``
— the tensorboard profile plugin's converter is broken against the baked
TF build, so this aggregates the device plane itself). Reports device time
grouped by HLO category and the top individual ops with their jax scope
names — the evidence behind PERF.md's "Train-step profile" top-sinks list.

The reference has no profiling surface at all; its timing is a wall-clock
dict summed per epoch (/root/reference/src/xview_et/agent.py:259-266,
utils.py Timer).

Usage:
    python tools/profile_train.py                    # production recipe
    python tools/profile_train.py --reference        # fp32/exact/batch-4
    python tools/profile_train.py --eval             # eval rollout instead
Prints one JSON line; pass --table for a human-readable op table too.
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import json
import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _capture(ns) -> str:
    """Run warm train steps under the profiler; return the trace dir."""
    import jax
    import __graft_entry__ as g
    from avdn_tpu.train import make_train_step
    from avdn_tpu.train.step import make_eval_rollout

    world, cfg, (bert, dk, et), state, batch = g._flagship(
        batch_size=ns.batch, map_px=1024, max_action_len=ns.T, seed=0,
        bf16=ns.bf16,
    )
    cfg = dataclasses.replace(
        cfg, render_twopass=ns.twopass, remat=ns.remat != "none",
        remat_policy=ns.remat if ns.remat != "none" else "full",
    )
    import jax.numpy as jnp

    bank = jnp.asarray(world.map_bank)
    rng = jax.random.PRNGKey(0)
    if ns.eval:
        fn = jax.jit(make_eval_rollout(cfg, bert, dk, et, teacher=False))

        def run(k):
            return fn(state, bank, batch, k)
    else:
        step_fn = jax.jit(make_train_step(cfg, bert, dk, et))

        def run(k):
            nonlocal state
            state, metrics = step_fn(state, bank, batch, k)
            return metrics["loss"]

    # warm: compile + one steady-state step outside the trace
    for i in range(2):
        out = run(jax.random.fold_in(rng, i))
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))

    trace_dir = ns.trace_dir or tempfile.mkdtemp(prefix="avdn_profile_")
    with jax.profiler.trace(trace_dir):
        for i in range(ns.steps):
            out = run(jax.random.fold_in(rng, 100 + i))
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    return trace_dir


def _load_xspaces(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    spaces = []
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append(xs)
    return spaces


def _is_device_plane(name: str) -> bool:
    low = name.lower()
    return ("tpu" in low or "gpu" in low or "/device:" in low
            or "xla op" in low) and "host" not in low


_ASYNC_PREFIXES = ("copy-start", "copy-done", "async-start", "async-done",
                   "slice-start", "slice-done", "all-reduce-start",
                   "all-gather-start", "collective-permute-start")


def analyze(trace_dir: str, steps: int) -> dict:
    """Aggregate device-plane op SELF time by HLO category and op name.

    XLA op-trace events NEST (a ``while`` envelopes its body ops; fusions
    inside it appear as child events on the same line) and async ops
    (``copy-start``/``slice-start`` DMA) SPAN the compute they overlap — a
    flat duration sum therefore multi-counts wildly. Self time = duration
    minus directly-nested children, computed per line with an interval
    stack; async-prefixed ops are bucketed apart (they are overlapped DMA,
    not critical-path compute)."""
    by_cat = defaultdict(float)
    by_op = defaultdict(float)
    async_ms = defaultdict(float)
    op_scope, op_cat = {}, {}
    plane_names = []
    total_self_ps = 0.0
    span_lo, span_hi = float("inf"), 0.0
    busy_ps = 0.0  # union of sync-op intervals (utilization numerator)
    for xs in _load_xspaces(trace_dir):
        for plane in xs.planes:
            if not _is_device_plane(plane.name):
                continue
            plane_names.append(plane.name)
            smeta = plane.stat_metadata  # map<int64, XStatMetadata>
            emeta = plane.event_metadata

            def _stat_str(st):
                if st.str_value:
                    return st.str_value
                if st.ref_value and st.ref_value in smeta:
                    return smeta[st.ref_value].name
                return ""

            # op-level lines only: module/step lines envelope the op events
            # and would double-count
            lines = [l for l in plane.lines
                     if "op" in l.name.lower() and "module" not in l.name.lower()]
            if not lines:
                lines = [l for l in plane.lines
                         if "step" not in l.name.lower()
                         and "module" not in l.name.lower()]
            for line in lines:
                evs = []
                for ev in line.events:
                    md = emeta.get(ev.metadata_id)
                    name = md.name if md else f"op{ev.metadata_id}"
                    # metadata names carry the full HLO instruction text;
                    # keep the "%opname" identifier (unique per HLO op)
                    name = name.split(" = ", 1)[0].strip().lstrip("%")
                    cat, scope = "", ""
                    stats = list(ev.stats) + (list(md.stats) if md else [])
                    for st in stats:
                        sname = (smeta[st.metadata_id].name
                                 if st.metadata_id in smeta else "")
                        if sname == "hlo_category":
                            cat = _stat_str(st) or cat
                        elif sname in ("tf_op", "hlo_op", "tf_op_name"):
                            scope = scope or _stat_str(st)
                    start = ev.offset_ps
                    evs.append((start, start + ev.duration_ps, name, cat,
                                scope))
                    lo = line.timestamp_ns * 1000 + ev.offset_ps
                    span_lo = min(span_lo, lo)
                    span_hi = max(span_hi, lo + ev.duration_ps)
                # nesting: sort by (start, -duration) so parents precede
                # the children they contain; stack of open intervals
                evs.sort(key=lambda e: (e[0], -(e[1] - e[0])))
                stack = []  # [start, end, child_sum, name, cat, scope]
                busy_end = 0.0

                def _close(fr):
                    start, end, child, name, cat, scope = fr
                    self_ps = max(0.0, (end - start) - child)
                    by_op[name] += self_ps
                    by_cat[cat or _guess_category(name)] += self_ps
                    if scope:
                        op_scope[name] = scope
                    if cat:
                        op_cat[name] = cat
                    return self_ps

                for start, end, name, cat, scope in evs:
                    if name.startswith(_ASYNC_PREFIXES):
                        # overlapped DMA: bucket apart, keep OFF the
                        # nesting stack (async spans straddle sync ops and
                        # would corrupt the containment invariant)
                        async_ms[name.split(".")[0]] += end - start
                        continue
                    while stack and stack[-1][1] <= start:
                        total_self_ps += _close(stack.pop())
                    if stack:
                        stack[-1][2] += end - start
                    busy_ps += max(0.0, end - max(busy_end, start))
                    busy_end = max(busy_end, end)
                    stack.append([start, end, 0.0, name, cat, scope])
                while stack:
                    total_self_ps += _close(stack.pop())
    dev_ms = total_self_ps / 1e9
    span_ms = ((span_hi - span_lo) / 1e9) if span_hi > span_lo else 0.0
    out = {
        "device_planes": sorted(set(plane_names)),
        "device_self_ms_total": round(dev_ms, 3),
        "device_self_ms_per_step": round(dev_ms / max(steps, 1), 3),
        "trace_span_ms": round(span_ms, 3),
        "device_busy_pct_of_span": round(100 * busy_ps / 1e9 / span_ms, 1)
        if span_ms else 0.0,
        "async_dma_ms": {k: round(v / 1e9, 3)
                         for k, v in sorted(async_ms.items(),
                                            key=lambda kv: -kv[1])},
        "by_category_ms": {
            k or "(uncategorized)": round(v / 1e9, 3)
            for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])
        },
        "top_ops": [
            {
                "op": k,
                "ms": round(v / 1e9, 3),
                "pct": round(100 * v / max(total_self_ps, 1), 1),
                "cat": op_cat.get(k, ""),
                "scope": op_scope.get(k, ""),
            }
            for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:25]
        ],
    }
    return out


_CAT_HINTS = (
    ("fusion", "fusion"), ("conv", "convolution"), ("dot", "convolution"),
    ("copy", "data movement"), ("transpose", "data movement"),
    ("all-reduce", "collective"), ("dynamic", "data movement"),
    ("gather", "gather/scatter"), ("scatter", "gather/scatter"),
    ("infeed", "host"), ("outfeed", "host"),
)


def _guess_category(name: str) -> str:
    low = name.lower()
    for hint, cat in _CAT_HINTS:
        if hint in low:
            return cat
    return ""


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--T", type=int, default=10)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--no-bf16", dest="bf16", action="store_false")
    ap.add_argument("--twopass", action="store_true", default=True)
    ap.add_argument("--no-twopass", dest="twopass", action="store_false")
    ap.add_argument("--remat", default="dots",
                    choices=["none", "full", "dots"])
    ap.add_argument("--reference", action="store_true",
                    help="reference numerics: fp32, exact render, batch 4")
    ap.add_argument("--eval", action="store_true",
                    help="profile the student eval rollout instead")
    ap.add_argument("--trace_dir", default=None,
                    help="keep the raw trace here (default: tmpdir)")
    ap.add_argument("--analyze_only", default=None, metavar="DIR",
                    help="skip capture; analyze an existing trace dir")
    ap.add_argument("--table", action="store_true",
                    help="also print a human-readable op table to stderr")
    ns = ap.parse_args(argv)
    if ns.reference:
        ns.bf16, ns.twopass, ns.remat, ns.batch = False, False, "none", 4

    if ns.analyze_only:
        trace_dir = ns.analyze_only
    else:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        trace_dir = _capture(ns)
    out = analyze(trace_dir, ns.steps)
    out["recipe"] = ("eval" if ns.eval else
                     "reference" if ns.reference else
                     f"batch{ns.batch}_bf16={ns.bf16}_twopass={ns.twopass}"
                     f"_remat={ns.remat}")
    out["trace_dir"] = trace_dir
    if ns.table:
        print(f"-- device op time by category (ms over {ns.steps} steps) --",
              file=sys.stderr)
        for k, v in out["by_category_ms"].items():
            print(f"  {k:30s} {v:10.3f}", file=sys.stderr)
        print("-- top ops --", file=sys.stderr)
        for r in out["top_ops"]:
            print(f"  {r['pct']:5.1f}%  {r['ms']:9.3f} ms  {r['op']:40s} "
                  f"{r['scope'][:60]}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
