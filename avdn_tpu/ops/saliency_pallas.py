"""Pallas TPU kernel: fused per-item saliency statistics.

One VMEM pass over the (224, 224) predicted + GT saliency maps produces every
reduction the rollout needs — NSS moments (Σp, Σp²), the NSS numerator
(Σ z·fix via Σ p·fix), the fixation mass (Σ fix), and the human-attention
eval sums (Σ clip(p)·fix, Σ clip(p)) (reference formulas
src/xview_et/agent.py:256-270 and :683-691). XLA would emit several separate
reduction loops over the same HBM-resident maps; the kernel reads each map
exactly once.

Grid: one program per batch item. Falls back to plain XLA off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_LANES = 128  # VMEM stores must be vector-shaped; stats live in lanes 0..5


def _stats_kernel(pred_ref, gt_ref, out_ref):
    b = pl.program_id(0)
    p = pred_ref[:]
    g = gt_ref[:]
    pc = jnp.clip(p, 0.0, 1.0)
    stats = [jnp.sum(p), jnp.sum(p * p), jnp.sum(p * g), jnp.sum(g),
             jnp.sum(pc * g), jnp.sum(pc)]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    row = jnp.zeros((1, _LANES), jnp.float32)
    for k, s in enumerate(stats):
        row = jnp.where(lane == k, s, row)
    out_ref[pl.ds(b, 1), :] = row


def saliency_stats_pallas(pred: jnp.ndarray, gt: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    """pred, gt: (B, H, W) float32 → (B, 8) stats
    [Σp, Σp², Σp·g, Σg, Σclip(p)·g, Σclip(p), 0, 0]."""
    B, H, W = pred.shape
    out = pl.pallas_call(
        _stats_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # full-array output block: each program writes its own row (grid
        # programs execute sequentially on TPU)
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, _LANES), jnp.float32),
        interpret=interpret,
    )(pred, gt)
    return out[:, :8]


def saliency_stats_xla(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    B = pred.shape[0]
    p = pred.reshape(B, -1)
    g = gt.reshape(B, -1)
    pc = jnp.clip(p, 0.0, 1.0)
    zeros = jnp.zeros((B,), jnp.float32)
    return jnp.stack(
        [jnp.sum(p, 1), jnp.sum(p * p, 1), jnp.sum(p * g, 1), jnp.sum(g, 1),
         jnp.sum(pc * g, 1), jnp.sum(pc, 1), zeros, zeros],
        axis=1,
    )


@functools.partial(jax.jit, static_argnames=("use_pallas", "nss_r"))
def saliency_reductions(pred, gt, nss_r: int = 0, use_pallas: bool = True):
    """NSS (negated, reference convention) + HA precision/recall from the
    fused stats. Returns (neg_nss (B,), valid (B,), precision (B,),
    recall (B,)). Matches ``ops.losses.nss_loss`` and the HA formulas.
    """
    n = pred.shape[1] * pred.shape[2]
    if use_pallas:
        s = saliency_stats_pallas(pred.astype(jnp.float32), gt.astype(jnp.float32))
    else:
        s = saliency_stats_xla(pred, gt)
    sum_p, sum_p2, sum_pg, sum_g, sum_pcg, sum_pc = (
        s[:, 0], s[:, 1], s[:, 2], s[:, 3], s[:, 4], s[:, 5]
    )
    mean = sum_p / n
    var = (sum_p2 - n * mean * mean) / (n - 1)
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    # Σ z·g = (Σ p·g − mean·Σ g) / std
    z_dot = (sum_pg - mean * sum_g) / jnp.where(std > 0, std, 1.0)
    if nss_r == 1:
        z_dot = z_dot / 2 + sum_g
    elif nss_r == -1:
        z_dot = z_dot / 2 - sum_g
    nss = z_dot / (sum_g + 0.001)
    valid = (sum_g > 0) & jnp.isfinite(nss) & (std > 0)
    precision = jnp.where(sum_pc > 0, sum_pcg / jnp.maximum(sum_pc, 1e-20), 0.0)
    recall = sum_pcg / jnp.maximum(sum_g, 1e-20)
    return -nss, valid, precision, recall
