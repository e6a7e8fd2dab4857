"""Time-fused teacher-forced rollout — the TPU-shaped fast path.

Key observation: under teacher forcing the trajectory is **model-
independent**. The executed action is the oracle target, the stop decision
is the GT progress (src/xview_et/agent.py:724-744 with feedback='teacher'),
and the oracle itself depends only on the current corners and the GT path
(agent.py:386-507). The model is consulted every step — its outputs feed
the losses — but never steers. The reference still interleaves
render → forward → oracle → step serially (agent.py:583-771); the scan
engine (`rollout/engine.py`) compiles that loop but keeps its sequential
structure.

This module exploits the independence:

1. a *geometry-only* ``lax.scan`` unrolls the whole trajectory first
   (oracle, stop, dynamics — no render, no model: microseconds);
2. all T×B views render in ONE batched call (the warp amortises its fixed
   cost and fills the chip);
3. the Darknet tower runs time-batched — ``vmap`` over T in train mode so
   BatchNorm's batch statistics reduce per step exactly like T sequential
   calls, a flat (T·B) batch in eval mode (running stats make the two
   identical);
4. the ET trunk runs as ``vmap`` over T step-views of the full history
   buffer (the scan's incremental buffer at step t equals the full buffer
   masked to positions ≤ t), with the SAME per-step dropout keys the scan
   would draw — bitwise-comparable losses. The LSTM family keeps its tiny
   recurrent cell sequential but feeds it precomputed features.

The result is the same RolloutOutputs as ``engine.rollout`` (equality is
pinned by tests/test_fused_teacher.py) at a fraction of the wall clock:
T sequential model dispatches collapse into one wide dispatch — the shape
TPUs are built for. Used automatically for the teacher-forced half of the
train step and for the teacher-forced human-attention eval
(``RolloutConfig.fused_teacher``); the sequential scan remains the
memory-frugal path under ``--remat`` and the only path for student forcing
(a genuinely closed loop).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from avdn_tpu.rollout.engine import (
    EpisodeBatch,
    RolloutConfig,
    RolloutOutputs,
    RGB_MEAN,
    RGB_STD,
    _PI_REF,
    decode_action,
    dynamics_update,
    render_views,
    _pallas_ok,
)
from avdn_tpu.sim.oracle import teacher_action_batch
from avdn_tpu.ops.losses import step_losses
from avdn_tpu.ops.saliency_pallas import saliency_reductions


def teacher_geometry(batch: EpisodeBatch, cfg: RolloutConfig, rng):
    """Unroll the model-independent teacher trajectory.

    Replicates ``engine.rollout``'s carry and rng-split chain exactly
    (rng → (rng, r_model, r_eps) per step) so the fused model pass can
    consume the *same* per-step dropout keys the scan would have drawn.

    Returns a dict of per-step (T leading) arrays:
    ``corners_pre/dirs_pre`` (the state the step renders from),
    ``ended_pre/any_alive``, the oracle targets, ``heading_eps``,
    ``r_model`` keys, and the post-step ``corners/dirs/ended``.
    """
    B = batch.start_corners.shape[0]
    T = cfg.max_action_len

    def body(carry, t):
        corners, directions, ended, rng = carry
        rng, r_model, r_eps = jax.random.split(rng, 3)
        any_alive = ~jnp.all(ended)
        if cfg.compute_losses:
            oracle = teacher_action_batch(
                corners, ended, batch.gt_corners, batch.gt_len, True
            )
            gt_wp = oracle["waypoint_ratio"]
            gt_alt = oracle["altitude"]
            gt_prog = oracle["progress"]
        else:
            # mirrors the scan body: without losses there are no oracle
            # targets, so prog_stop stays 0 and only t==T-1 stops
            gt_wp = jnp.zeros((B, 2), jnp.float32)
            gt_alt = jnp.zeros((B,), jnp.float32)
            gt_prog = jnp.zeros((B,), jnp.float32)
        heading_eps = 1e-5 * jax.random.uniform(r_eps, (B,))
        stop_now, new_corners, new_dirs = dynamics_update(
            corners, directions, gt_wp, gt_alt, gt_prog, 0.5, t, T,
            batch.extent,
        )
        ended_next = ended | stop_now
        ys = dict(
            corners_pre=corners,
            dirs_pre=directions,
            ended_pre=ended,
            any_alive=any_alive,
            gt_wp=gt_wp,
            gt_alt=gt_alt,
            gt_prog=gt_prog,
            heading_eps=heading_eps,
            r_model=r_model,
            corners_post=new_corners,
            dirs_post=new_dirs,
            ended_post=ended_next,
        )
        return (new_corners, new_dirs, ended_next, rng), ys

    init = (
        batch.start_corners.astype(jnp.float32),
        batch.start_dir.astype(jnp.float32),
        jnp.zeros((B,), bool),
        rng,
    )
    _, ys = jax.lax.scan(body, init, jnp.arange(T))
    return ys


def _flat(x):
    """(T, B, ...) → (T·B, ...)"""
    return x.reshape((-1,) + x.shape[2:])


def _render_all(map_bank, batch: EpisodeBatch, corners_tb, cfg: RolloutConfig):
    """Render all T×B views in one batched call. ``corners_tb``: (T, B, 4, 2).
    Returns (views (T, B, H, W, 3), gt_sal (T, B, H, W))."""
    T, B = corners_tb.shape[0], corners_tb.shape[1]
    tiled = EpisodeBatch(
        map_idx=jnp.tile(batch.map_idx, T),
        start_corners=batch.start_corners,      # unused by render_views
        start_dir=batch.start_dir,
        extent=jnp.tile(batch.extent, (T, 1)),
        lat_ratio=jnp.tile(batch.lat_ratio, T),
        gt_corners=batch.gt_corners,
        gt_len=batch.gt_len,
        circles=jnp.tile(batch.circles, (T, 1, 1)),
        n_circles=jnp.tile(batch.n_circles, T),
        lang_feat=batch.lang_feat,
        lang_cls=batch.lang_cls,
        lang_mask=batch.lang_mask,
    )
    views, gt_sal = render_views(map_bank, tiled, _flat(corners_tb), cfg)
    return (
        views.reshape((T, B) + views.shape[1:]),
        gt_sal.reshape((T, B) + gt_sal.shape[1:]),
    )


def _bn_stats_chain(momentum: float, stats0, stacked_updates):
    """Recover the sequential running-stat chain from per-step vmapped
    updates. flax BN writes ``upd_t = μ·r + (1−μ)·s_t`` against the SAME
    initial ``r`` under vmap; the sequential scan threads r through steps:
    ``r_t = μ·r_{t−1} + (1−μ)·s_t``. Since ``(1−μ)·s_t = upd_t − μ·r₀``,
    the chain follows without ever materialising ``s_t``."""
    mu = momentum

    def step(r, upd_t):
        inc = jax.tree_util.tree_map(
            lambda u, r0: u - mu * r0, upd_t, stats0
        )
        return jax.tree_util.tree_map(lambda rr, ii: mu * rr + ii, r, inc), None

    final, _ = jax.lax.scan(step, stats0, stacked_updates)
    return final


def _tower_features(darknet_model, dk_vars, x_tb, cfg: RolloutConfig):
    """Run the vision tower time-batched. ``x_tb``: (T, B, H, W, 3)
    normalised views. Returns (feats (T, B, C, S), new_batch_stats).

    Train mode vmaps over T: BatchNorm's batch statistics then reduce per
    step over (B, H, W) — exactly the sequential per-step semantics — and
    the running-stat chain is reconstructed in order. Eval mode flattens to
    one (T·B) batch (running stats make per-step and flat identical)."""
    T, B = x_tb.shape[0], x_tb.shape[1]
    stats0 = dk_vars.get("batch_stats", {})
    if cfg.train:
        def call(xt):
            return darknet_model.apply(
                {"params": dk_vars["params"], "batch_stats": stats0},
                xt, train=True, mutable=["batch_stats"],
            )

        feats, updates = jax.vmap(call)(x_tb)
        new_stats = _bn_stats_chain(
            darknet_model.bn_momentum, stats0, updates["batch_stats"]
        )
    else:
        variables = {"params": dk_vars["params"]}
        if stats0:
            variables["batch_stats"] = stats0
        flat_feats = darknet_model.apply(variables, _flat(x_tb), train=False)
        feats = flat_feats.reshape((T, B) + flat_feats.shape[1:])
        new_stats = stats0
    return feats, new_stats


def _et_actions(et_model, et_params, batch: EpisodeBatch, cfg: RolloutConfig,
                feats, dir_feat, ended_pre, r_model):
    """All T step-outputs of the ET trunk in one vmapped call.

    The scan's incremental history buffer at step t holds features for
    positions ≤ t and zeros beyond (engine.make_et_step writes position t
    unconditionally each step); masking the full buffer reproduces it
    exactly, and per-step lengths are the cumulative alive counts. Dropout
    keys are the scan's own per-step keys, so train-mode outputs match the
    sequential path bit-for-bit (up to XLA reassociation)."""
    T, B = feats.shape[0], feats.shape[1]
    frames_full = jnp.moveaxis(feats, 0, 1)      # (B, T, C, S)
    dirs_full = jnp.moveaxis(dir_feat, 0, 1)     # (B, T, 2)
    lengths_t = jnp.cumsum((~ended_pre).astype(jnp.int32), axis=0)  # (T, B)

    def trunk(t, length_t, key_t):
        keep = jnp.arange(T) <= t
        frames_t = jnp.where(keep[None, :, None, None], frames_full, 0.0)
        dirs_t = jnp.where(keep[None, :, None], dirs_full, 0.0)
        return et_model.apply(
            et_params,
            batch.lang_feat,
            batch.lang_cls,
            frames_t,
            dirs_t,
            length_t,
            batch.lang_mask,
            deterministic=not cfg.train,
            rngs={"dropout": key_t} if cfg.train else None,
        )

    if cfg.train:
        actions, sal = jax.vmap(trunk)(jnp.arange(T), lengths_t, r_model)
    elif cfg.fast_eval_trunk:
        # deterministic mode: ONE causal pass over the full history equals
        # all T step-masked re-encodes (models/et_fast.py docstring has the
        # proof sketch; equality pinned by tests/test_et_fast.py)
        from avdn_tpu.models import et_fast

        actions, sal = et_fast.teacher_onepass(
            et_params, et_model.cfg, batch.lang_feat, batch.lang_cls,
            frames_full, dirs_full, lengths_t, batch.lang_mask,
            dtype=et_model.dtype,
        )
    else:
        actions, sal = jax.vmap(trunk, in_axes=(0, 0, None))(
            jnp.arange(T), lengths_t, r_model[0]
        )
    return actions, sal


def _lstm_actions(lstm_model, lstm_params, batch: EpisodeBatch,
                  cfg: RolloutConfig, feats, dir_feat, r_model):
    """The recurrent cell stays sequential (its state genuinely chains) but
    consumes precomputed features — the cell itself is a few small matmuls,
    so the scan is no longer the episode's critical path."""
    from avdn_tpu.models.lstm import init_lstm_state

    B = feats.shape[1]

    def cell(carry, inp):
        feats_t, dir_t, key_t = inp
        deg = jnp.arctan2(dir_t[:, 0:1], dir_t[:, 1:2]) / _PI_REF * 180.0
        new_state, action, sal = lstm_model.apply(
            lstm_params,
            deg,
            feats_t,
            batch.lang_cls,
            batch.lang_feat,
            carry,
            deterministic=not cfg.train,
            rngs={"dropout": key_t} if cfg.train else None,
        )
        return new_state, (action, sal)

    init = init_lstm_state(B, lstm_model.cfg)
    _, (actions, sal) = jax.lax.scan(cell, init, (feats, dir_feat, r_model))
    return actions, sal


def rollout_teacher_fused(
    *,
    map_bank: jnp.ndarray,
    batch: EpisodeBatch,
    cfg: RolloutConfig,
    family: str,
    darknet_model,
    vln_model,
    dk_vars: Dict[str, Any],
    vln_vars: Dict[str, Any],
    rng: jax.Array,
) -> Tuple[RolloutOutputs, Dict[str, Any]]:
    """Teacher-forced rollout with time-batched render/towers.

    Drop-in equal to ``engine.rollout`` with a teacher-forcing config
    (tests/test_fused_teacher.py pins outputs, loss, grads, and BN running
    stats against the scan path for both families, train and eval)."""
    assert cfg.teacher_forcing, "fused path is teacher-forcing only"
    if family not in ("et", "lstm"):
        raise ValueError(f"unknown family: {family}")
    B = batch.start_corners.shape[0]
    T = cfg.max_action_len

    geo = teacher_geometry(batch, cfg, rng)

    # ---- one batched render of every (t, b) view ----
    views, gt_sal = _render_all(map_bank, batch, geo["corners_pre"], cfg)
    if cfg.fused_input_norm:
        x = views - RGB_MEAN
    else:
        x = (views - RGB_MEAN) / RGB_STD

    rad = geo["dirs_pre"] / 180.0 * _PI_REF
    dir_feat = jnp.stack([jnp.sin(rad), jnp.cos(rad)], axis=-1)  # (T, B, 2)
    if cfg.no_direction:
        dir_feat = jnp.zeros_like(dir_feat)

    # ---- towers, time-batched ----
    feats, new_stats = _tower_features(darknet_model, dk_vars, x, cfg)
    if cfg.language_only:
        feats = jnp.zeros_like(feats)
    if family == "et":
        actions, pred_sal = _et_actions(
            vln_model, vln_vars, batch, cfg, feats, dir_feat,
            geo["ended_pre"], geo["r_model"],
        )
    else:
        actions, pred_sal = _lstm_actions(
            vln_model, vln_vars, batch, cfg, feats, dir_feat, geo["r_model"]
        )
    actions = actions.astype(jnp.float32)
    pred_sal = pred_sal.astype(jnp.float32)
    pred_prog_raw = actions[..., 3]
    wp_norm, alt_clip, prog_clip = jax.vmap(decode_action)(actions)

    # ---- losses + HA stats, vectorised over (T, B) ----
    need_sal_stats = cfg.compute_losses or cfg.collect_ha_metrics
    if need_sal_stats:
        neg_nss, nss_valid, ha_prec, ha_rec = saliency_reductions(
            _flat(pred_sal), _flat(gt_sal), nss_r=cfg.nss_r,
            use_pallas=_pallas_ok() and not cfg.train,
        )
        neg_nss = neg_nss.reshape(T, B)
        nss_valid = nss_valid.reshape(T, B)
        ha_prec = ha_prec.reshape(T, B)
        ha_rec = ha_rec.reshape(T, B)
    else:
        neg_nss = jnp.zeros((T, B), jnp.float32)
        nss_valid = jnp.zeros((T, B), bool)
        ha_prec = jnp.zeros((T, B))
        ha_rec = jnp.zeros((T, B))

    if cfg.compute_losses:
        ml = jax.vmap(step_losses)(
            actions[..., 0:2], actions[..., 2], pred_prog_raw,
            geo["gt_wp"], geo["gt_alt"], geo["gt_prog"], geo["heading_eps"],
        )
        ml = ml + cfg.nss_w * jnp.sum(
            jnp.where(nss_valid, neg_nss, 0.0), axis=1
        )
        loss = jnp.sum(jnp.where(geo["any_alive"], ml, 0.0))
    else:
        loss = jnp.float32(0.0)

    outputs = RolloutOutputs(
        alive_pre=~geo["ended_pre"],
        alive_post=~geo["ended_post"],
        actions_wp=wp_norm,
        actions_alt=alt_clip,
        pred_progress=pred_prog_raw,
        gt_wp=geo["gt_wp"],
        gt_alt=geo["gt_alt"],
        gt_progress=geo["gt_prog"],
        corners=geo["corners_post"],
        directions=geo["dirs_post"],
        ha_precision=ha_prec,
        ha_recall=ha_rec,
        ha_nss=neg_nss,
        ha_valid=(
            nss_valid
            & geo["any_alive"][:, None]
            & jnp.bool_(cfg.collect_ha_metrics)
        ),
        loss=loss,
        views=views if cfg.collect_views else None,
        pred_sal=pred_sal if cfg.collect_saliency else None,
        gt_sal=gt_sal if cfg.collect_saliency else None,
    )
    return outputs, {"batch_stats": new_stats}
