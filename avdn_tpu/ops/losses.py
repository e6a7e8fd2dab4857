"""Loss ops for the HAA rollout.

All formulas preserve the reference's conventions exactly
(src/xview_et/agent.py:256-270 NSS; :663-669 the four summed MSE terms) —
they are the supervision signal, so constants like π≈3.14159 and the
``+0.001`` fixation-sum guard matter for checkpoint parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PI_REF = 3.14159


def nss_loss(pred_sal: jnp.ndarray, gt_sal: jnp.ndarray, nss_r: int = 0):
    """Per-item negative Normalized Scanpath Saliency.

    pred_sal, gt_sal: (B, H, W). Returns (B,) of ``-NSS`` per item plus a
    validity mask (items with an empty fixation map or NaN are excluded the
    way the reference skips them, agent.py:676-681).

    NSS = sum(z(pred) * fix) / (sum(fix) + 0.001) with z() using the
    *unbiased* std (torch.std default). ``nss_r`` selects the reference's
    normalisation variants (agent.py:259-264).
    """
    B = pred_sal.shape[0]
    flat = pred_sal.reshape(B, -1)
    fix = gt_sal.reshape(B, -1)
    m = jnp.mean(flat, axis=1, keepdims=True)
    var = jnp.sum((flat - m) ** 2, axis=1, keepdims=True) / (flat.shape[1] - 1)
    std = jnp.sqrt(var)
    z = (flat - m) / std
    if nss_r == 1:
        z = z / 2 + 1
    elif nss_r == -1:
        z = z / 2 - 1
    s_fix = jnp.sum(fix, axis=1) + 0.001
    nss = jnp.sum(z * fix, axis=1) / s_fix
    valid = (jnp.sum(fix, axis=1) > 0) & jnp.isfinite(nss)
    return -nss, valid


def heading_of(wp: jnp.ndarray, eps: jnp.ndarray | float = 0.0):
    """Waypoint → normalised heading in [0, 1):
    ``(atan2(x, y + eps) / 3.14159 + 2) / 2 % 1`` (agent.py:666-667, :745)."""
    return (jnp.arctan2(wp[..., 0], wp[..., 1] + eps) / _PI_REF + 2.0) / 2.0 % 1.0


def step_losses(
    pred_wp,        # (B, 2) raw waypoint head output
    pred_alt,       # (B,) raw altitude head output
    pred_prog,      # (B,) raw progress head output
    gt_wp,          # (B, 2) oracle waypoint ratio
    gt_alt,         # (B,)
    gt_prog,        # (B,)
    heading_eps,    # (B,) the reference's 1e-5*rand jitter on atan2's y
):
    """The four summed-MSE supervision terms of one rollout step
    (agent.py:663-669). Sum-reduction over the whole batch — the reference
    accumulates over *all* items each step, including already-ended ones.
    Returns a scalar."""
    l_wp = jnp.sum((pred_wp - gt_wp) ** 2)
    l_head = jnp.sum(
        (heading_of(pred_wp, heading_eps) - heading_of(gt_wp)) ** 2
    )
    l_alt = jnp.sum((pred_alt - gt_alt) ** 2)
    l_prog = jnp.sum((pred_prog - gt_prog) ** 2)
    return l_wp + l_head + l_alt + l_prog
