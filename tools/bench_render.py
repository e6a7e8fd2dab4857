"""Micro-benchmark: exact gather warp vs two-pass MXU warp vs subsample.

Hoist-proof (quad perturbed per iteration inside the jit loop — PERF.md).
Run on the TPU: ``python tools/bench_render.py``.
``--sweep_chunks 32,64,128,224`` instead sweeps the two-pass ``chunk``
parameter (the pass-A/B lax.map slab width) at crops 320/512 — the render
einsums are the top eval-path op (PERF.md trace profile), so the slab
width is the one free tuning knob left.
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from avdn_tpu.sim.render import render_batch
from avdn_tpu.sim.warp2pass import render_batch_twopass

B, N, HW = 16, 4, 1024
ITERS = 20


def measure(fn, quads, label):
    def many(quads, rng):
        def body(i, acc):
            k = jax.random.fold_in(rng, i)
            q = quads + 1e-6 * jax.random.normal(k, quads.shape)
            v, s = fn(q)
            return acc + jnp.sum(v[:, ::64, ::64]) + jnp.sum(s[:, ::64, ::64])

        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    f = jax.jit(many)
    # completion forced by host fetch — block_until_ready is not a sync
    # point on this backend (PERF.md "Timing methodology")
    np.asarray(jax.device_get(f(quads, jax.random.PRNGKey(0))))
    t0 = time.perf_counter()
    np.asarray(jax.device_get(f(quads, jax.random.PRNGKey(1))))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{label:34s} {dt*1e3:8.2f} ms/step   ({B} views)")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep_chunks", default="",
                    help="comma list of two-pass chunk widths to sweep "
                         "(skips the default exact/subsample rows)")
    ns = ap.parse_args()

    rng = np.random.default_rng(0)
    bank = jnp.asarray(rng.integers(0, 256, (N, HW, HW, 3), np.uint8))
    map_idx = jnp.asarray(rng.integers(0, N, B).astype(np.int32))
    quads = []
    for i in range(B):
        cx, cy = rng.uniform(200, HW - 200, 2)
        r = rng.uniform(40, 110)
        th = rng.uniform(0, 2 * np.pi)
        ang = th + np.array([0, 0.5, 1.0, 1.5]) * np.pi
        quads.append(np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], -1))
    quads = jnp.asarray(np.round(np.stack(quads)).astype(np.float32))
    circles = jnp.asarray(rng.uniform(100, 900, (B, 8, 3)).astype(np.float32))
    n_circ = jnp.asarray(rng.integers(0, 8, B).astype(np.int32))

    if ns.sweep_chunks:
        for crop in (320, 512):
            for chunk in (int(c) for c in ns.sweep_chunks.split(",")):
                eff = -(-crop // chunk) * chunk  # entry rounds crop UP
                measure(
                    lambda q, c=crop, ch=chunk: render_batch_twopass(
                        bank, map_idx, q, circles, n_circ, crop_hw=c,
                        chunk=ch, bf16=True),
                    quads,
                    f"two-pass crop={crop}(eff {eff}) bf16 chunk={chunk}")
        return

    t_exact = measure(
        lambda q: render_batch(bank, map_idx, q, circles, n_circ),
        quads, "exact 4-tap gather (parity)")
    for crop in (256, 512):
        for bf16 in (True, False):
            for band in (False, True):
                t = measure(
                    lambda q, c=crop, b=bf16, bd=band: render_batch_twopass(
                        bank, map_idx, q, circles, n_circ, crop_hw=c, bf16=b,
                        band=bd),
                    quads, f"two-pass MXU crop={crop} bf16={bf16} band={band}")
                print(f"    speedup vs exact: {t_exact / t:.2f}x")
    for sub in (2, 4):
        t = measure(
            lambda q, s=sub: render_batch(bank, map_idx, q, circles, n_circ,
                                          subsample=s),
            quads, f"subsample={sub} (low-res)")
        print(f"    speedup vs exact: {t_exact / t:.2f}x")


if __name__ == "__main__":
    main()
