"""Fused teacher-forced rollout (rollout/fused.py) vs the sequential scan.

The fused path claims exact equality with ``engine.rollout`` under teacher
forcing — same trajectory, same losses, same BN running stats, same grads —
because the teacher trajectory is model-independent and the time-batched
model passes consume the scan's own per-step rng keys. These tests pin that
claim for both families, train and eval, and for the train-step dispatch.
"""

import dataclasses

import pytest

pytestmark = pytest.mark.compile  # full grad compiles, minutes each (tiered suite)

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avdn_tpu.rollout import RolloutConfig
from avdn_tpu.rollout.engine import rollout, make_et_step, make_lstm_step
from avdn_tpu.rollout.fused import rollout_teacher_fused
from avdn_tpu.train import make_train_step, make_eval_rollout
from avdn_tpu.train.step import _darknet_channels

from tests.test_train_step import build_tiny


def _episode(world, batch):
    return batch.episode.replace(
        lang_feat=jnp.asarray(
            np.random.default_rng(7).normal(
                size=batch.episode.lang_feat.shape
            ).astype(np.float32)
        ),
        lang_cls=jnp.asarray(
            np.random.default_rng(8).normal(
                size=batch.episode.lang_cls.shape
            ).astype(np.float32)
        ),
        lang_mask=jnp.ones(batch.episode.lang_mask.shape, bool),
    )


def _run_both(family, train, collect_ha=False, nss_w=0.1, collect_debug=False):
    world, cfg, (bert, dk, vln), state, batch = build_tiny(
        family, batch_size=3, max_action_len=3
    )
    ep = _episode(world, batch)
    bank = jnp.asarray(world.map_bank)
    roll = RolloutConfig(
        max_action_len=cfg.max_action_len,
        teacher_forcing=True,
        train=train,
        nss_w=nss_w,
        collect_ha_metrics=collect_ha,
        collect_views=collect_debug,
        collect_saliency=collect_debug,
    )
    dk_vars = {"params": state.darknet_params,
               "batch_stats": state.batch_stats}
    vln_vars = {"params": state.vln_params}
    rng = jax.random.PRNGKey(3)

    if family == "et":
        step, init_state = make_et_step(dk, vln, dk_vars, vln_vars, ep, roll)
        init = init_state(_darknet_channels(dk), 49)
    else:
        step, init_state = make_lstm_step(dk, vln, dk_vars, vln_vars, ep, roll)
        init = init_state()
    out_scan, ms_scan = jax.jit(
        lambda b, r: rollout(map_bank=b, batch=ep, cfg=roll, model_step=step,
                             init_model_state=init, rng=r)
    )(bank, rng)

    out_fused, ms_fused = jax.jit(
        lambda b, r: rollout_teacher_fused(
            map_bank=b, batch=ep, cfg=roll, family=family,
            darknet_model=dk, vln_model=vln, dk_vars=dk_vars,
            vln_vars=vln_vars, rng=r,
        )
    )(bank, rng)
    return out_scan, ms_scan["batch_stats"], out_fused, ms_fused["batch_stats"]


def _assert_outputs_match(a, b, atol=1e-5):
    for f in ("alive_pre", "alive_post"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), err_msg=f
        )
    for f in ("actions_wp", "actions_alt", "pred_progress", "gt_wp", "gt_alt",
              "gt_progress", "corners", "directions", "ha_precision",
              "ha_recall", "ha_nss", "ha_valid"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
            atol=atol, rtol=1e-5, err_msg=f,
        )
    np.testing.assert_allclose(
        np.asarray(a.loss), np.asarray(b.loss), rtol=2e-5, err_msg="loss"
    )


@pytest.mark.parametrize("family", ["et", "lstm"])
def test_eval_teacher_fused_matches_scan(family):
    out_s, _, out_f, _ = _run_both(family, train=False, collect_ha=True)
    _assert_outputs_match(out_s, out_f)


@pytest.mark.parametrize("family", ["et", "lstm"])
def test_train_teacher_fused_matches_scan(family):
    """Train mode: dropout keys and per-step BN batch statistics must line
    up exactly with the sequential path (the fused pass replays the scan's
    rng chain and vmaps BN per step)."""
    out_s, stats_s, out_f, stats_f = _run_both(family, train=True)
    _assert_outputs_match(out_s, out_f, atol=2e-5)
    flat_s, _ = jax.tree_util.tree_flatten(stats_s)
    flat_f, _ = jax.tree_util.tree_flatten(stats_f)
    assert len(flat_s) == len(flat_f) and len(flat_s) > 0
    for xs, xf in zip(flat_s, flat_f):
        np.testing.assert_allclose(
            np.asarray(xs), np.asarray(xf), atol=1e-5, rtol=1e-5,
            err_msg="BN running stats chain",
        )


def test_debug_collection_matches():
    out_s, _, out_f, _ = _run_both("et", train=False, collect_debug=True)
    np.testing.assert_allclose(
        np.asarray(out_s.views), np.asarray(out_f.views), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_s.pred_sal), np.asarray(out_f.pred_sal), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_s.gt_sal), np.asarray(out_f.gt_sal), atol=1e-5
    )


@pytest.mark.parametrize("family", ["et", "lstm"])
def test_train_step_fused_matches_scan(family):
    """The full double-rollout train step (teacher half fused) produces the
    same loss and updated parameters as the all-scan step — dropout active,
    same rng."""
    world, cfg, models, state, batch = build_tiny(family, max_action_len=3)
    bank = jnp.asarray(world.map_bank)
    rng = jax.random.PRNGKey(11)

    cfg_f = dataclasses.replace(cfg, fused_teacher=True)
    cfg_s = dataclasses.replace(cfg, fused_teacher=False)
    st_f, m_f = jax.jit(make_train_step(cfg_f, *models))(state, bank, batch, rng)
    st_s, m_s = jax.jit(make_train_step(cfg_s, *models))(state, bank, batch, rng)

    np.testing.assert_allclose(
        float(m_f["loss"]), float(m_s["loss"]), rtol=2e-5
    )
    for name in ("bert_params", "darknet_params", "vln_params"):
        fs, _ = jax.tree_util.tree_flatten(getattr(st_f, name))
        ss, _ = jax.tree_util.tree_flatten(getattr(st_s, name))
        for xf, xs in zip(fs, ss):
            np.testing.assert_allclose(
                np.asarray(xf), np.asarray(xs), atol=5e-5, rtol=1e-4,
                err_msg=name,
            )


def test_remat_with_fused_teacher_matches():
    """--remat rematerialises the student rollout only; the fused teacher
    half is unaffected by the policy and the step still matches the all-scan
    remat step numerically."""
    world, cfg, models, state, batch = build_tiny("et", max_action_len=3)
    bank = jnp.asarray(world.map_bank)
    cfg_r = dataclasses.replace(cfg, remat=True, fused_teacher=True)
    cfg_s = dataclasses.replace(cfg, remat=True, fused_teacher=False)
    rng = jax.random.PRNGKey(4)
    _, m_r = jax.jit(make_train_step(cfg_r, *models))(state, bank, batch, rng)
    _, m_s = jax.jit(make_train_step(cfg_s, *models))(state, bank, batch, rng)
    np.testing.assert_allclose(
        float(m_r["loss"]), float(m_s["loss"]), rtol=2e-5
    )


def test_eval_rollout_builder_uses_fused():
    """make_eval_rollout(teacher=True) — the human-attention eval — goes
    through the fused path and matches the scan path."""
    world, cfg, models, state, batch = build_tiny("et", max_action_len=3)
    bank = jnp.asarray(world.map_bank)
    rng = jax.random.PRNGKey(5)
    cfg_f = dataclasses.replace(cfg, fused_teacher=True)
    cfg_s = dataclasses.replace(cfg, fused_teacher=False)
    ev_f = jax.jit(make_eval_rollout(cfg_f, *models, teacher=True,
                                     collect_ha=True))
    ev_s = jax.jit(make_eval_rollout(cfg_s, *models, teacher=True,
                                     collect_ha=True))
    out_f = ev_f(state, bank, batch, rng)
    out_s = ev_s(state, bank, batch, rng)
    _assert_outputs_match(out_s, out_f)
