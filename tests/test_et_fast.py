"""Eval-only ET trunk reformulations (models/et_fast.py) vs the flax module.

Pins the two exactness claims:

* ``teacher_onepass`` — ONE causal full-history pass reproduces every
  step-t output of the step-masked re-encode, including the batch-max
  readout quirk and items that end mid-episode (frozen lengths);
* the incremental KV decode (``make_lang_cache`` + ``decode_step``) wired
  into ``make_et_step`` reproduces the full re-encode scan step for step,
  teacher- and student-forced.

All in deterministic (eval) mode — train mode keeps the full re-encode.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avdn_tpu.models.et import ETConfig, HAATransformer
from avdn_tpu.models import et_fast
from avdn_tpu.rollout import RolloutConfig
from avdn_tpu.rollout.engine import rollout, make_et_step
from avdn_tpu.rollout.fused import rollout_teacher_fused
from avdn_tpu.train.step import _darknet_channels

from tests.test_train_step import build_tiny
from tests.test_fused_teacher import _episode, _assert_outputs_match


def _ragged_inputs(cfg, B=3, T=4, L=7, C=8, seed=0):
    rng = np.random.default_rng(seed)
    lang = jnp.asarray(rng.normal(size=(B, L, cfg.demb)).astype(np.float32))
    lang_cls = jnp.asarray(rng.normal(size=(B, 49)).astype(np.float32))
    frames = jnp.asarray(rng.normal(size=(B, T, C, 49)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(B, T, 2)).astype(np.float32))
    # item0 alive throughout; item1 ends after step 1; item2 after step 0
    alive = np.array(
        [[1, 1, 1], [1, 1, 0], [1, 0, 0], [1, 0, 0]], bool
    )[:T, :B]
    lengths_steps = jnp.asarray(np.cumsum(alive, axis=0).astype(np.int32))
    mask = np.ones((B, L), bool)
    mask[1, L - 2 :] = False  # some padding for the mask_lang_padding case
    return lang, lang_cls, frames, dirs, lengths_steps, jnp.asarray(mask)


@pytest.mark.parametrize("mask_lang", [False, True])
def test_teacher_onepass_matches_per_step_module(mask_lang):
    """One causal pass == T step-masked module calls, ragged endings and
    batch-max readout included."""
    cfg = ETConfig(demb=64, encoder_heads=4, encoder_layers=2,
                   mask_lang_padding=mask_lang)
    model = HAATransformer(cfg)
    lang, lang_cls, frames, dirs, lengths_steps, mask = _ragged_inputs(cfg)
    T = frames.shape[1]
    params = model.init(
        jax.random.PRNGKey(0), lang, lang_cls, frames, dirs,
        lengths_steps[-1], mask,
    )

    ref_actions, ref_sal = [], []
    for t in range(T):
        keep = jnp.arange(T) <= t
        a, s = model.apply(
            params, lang, lang_cls,
            jnp.where(keep[None, :, None, None], frames, 0.0),
            jnp.where(keep[None, :, None], dirs, 0.0),
            lengths_steps[t], mask, deterministic=True,
        )
        ref_actions.append(a)
        ref_sal.append(s)

    fast_a, fast_s = et_fast.teacher_onepass(
        params, cfg, lang, lang_cls, frames, dirs, lengths_steps, mask
    )
    np.testing.assert_allclose(
        np.asarray(fast_a), np.stack([np.asarray(a) for a in ref_actions]),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(fast_s), np.stack([np.asarray(s) for s in ref_sal]),
        atol=1e-5, rtol=1e-5,
    )


def test_decode_chain_matches_per_step_module():
    """Incremental KV decode == full re-encode, step by step, with items
    ending mid-episode (their cached tokens stay frozen exactly as the full
    call would recompute them)."""
    cfg = ETConfig(demb=64, encoder_heads=4, encoder_layers=2)
    model = HAATransformer(cfg)
    lang, lang_cls, frames, dirs, lengths_steps, mask = _ragged_inputs(cfg)
    T = frames.shape[1]
    B = lang.shape[0]
    params = model.init(
        jax.random.PRNGKey(0), lang, lang_cls, frames, dirs,
        lengths_steps[-1], mask,
    )

    lang_kv = et_fast.make_lang_cache(params, cfg, lang, mask)
    cache = et_fast.init_cache(cfg, B, T)
    for t in range(T):
        keep = jnp.arange(T) <= t
        ref_a, ref_s = model.apply(
            params, lang, lang_cls,
            jnp.where(keep[None, :, None, None], frames, 0.0),
            jnp.where(keep[None, :, None], dirs, 0.0),
            lengths_steps[t], mask, deterministic=True,
        )
        cache, a, s = et_fast.decode_step(
            params, cfg, lang_kv, cache, lang_cls, frames[:, t], dirs[:, t],
            jnp.int32(t), lengths_steps[t], mask,
        )
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(ref_a), atol=1e-5, rtol=1e-5,
            err_msg=f"action step {t}",
        )
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(ref_s), atol=1e-5, rtol=1e-5,
            err_msg=f"saliency step {t}",
        )


def _run_engine(fast: bool, teacher: bool):
    world, cfg, (bert, dk, vln), state, batch = build_tiny(
        "et", batch_size=3, max_action_len=3
    )
    ep = _episode(world, batch)
    bank = jnp.asarray(world.map_bank)
    roll = RolloutConfig(
        max_action_len=cfg.max_action_len,
        teacher_forcing=teacher,
        train=False,
        collect_ha_metrics=True,
        collect_saliency=True,
        et_decode_trunk=fast,
    )
    dk_vars = {"params": state.darknet_params, "batch_stats": state.batch_stats}
    vln_vars = {"params": state.vln_params}
    step, init_state = make_et_step(dk, vln, dk_vars, vln_vars, ep, roll)
    init = init_state(_darknet_channels(dk), 49)
    out, _ = jax.jit(
        lambda b, r: rollout(map_bank=b, batch=ep, cfg=roll, model_step=step,
                             init_model_state=init, rng=r)
    )(bank, jax.random.PRNGKey(3))
    return out


@pytest.mark.parametrize("teacher", [True, False])
def test_engine_decode_matches_full_reencode(teacher):
    out_fast = _run_engine(fast=True, teacher=teacher)
    out_full = _run_engine(fast=False, teacher=teacher)
    _assert_outputs_match(out_full, out_fast)
    np.testing.assert_allclose(
        np.asarray(out_full.pred_sal), np.asarray(out_fast.pred_sal),
        atol=1e-5,
    )


def test_fused_teacher_onepass_matches_vmap():
    world, cfg, (bert, dk, vln), state, batch = build_tiny(
        "et", batch_size=3, max_action_len=3
    )
    ep = _episode(world, batch)
    bank = jnp.asarray(world.map_bank)
    dk_vars = {"params": state.darknet_params, "batch_stats": state.batch_stats}
    vln_vars = {"params": state.vln_params}

    def run(fast):
        roll = RolloutConfig(
            max_action_len=cfg.max_action_len, teacher_forcing=True,
            train=False, collect_ha_metrics=True, collect_saliency=True,
            fast_eval_trunk=fast,
        )
        out, _ = jax.jit(
            lambda b, r: rollout_teacher_fused(
                map_bank=b, batch=ep, cfg=roll, family="et",
                darknet_model=dk, vln_model=vln, dk_vars=dk_vars,
                vln_vars=vln_vars, rng=r,
            )
        )(bank, jax.random.PRNGKey(5))
        return out

    out_fast, out_vmap = run(True), run(False)
    _assert_outputs_match(out_vmap, out_fast)
    np.testing.assert_allclose(
        np.asarray(out_vmap.pred_sal), np.asarray(out_fast.pred_sal),
        atol=1e-5,
    )


def test_bf16_decode_matches_bf16_module():
    """bf16 towers: the pure-function decode mirrors the module's dtype
    casts; agreement at bf16-appropriate tolerance."""
    cfg = ETConfig(demb=64, encoder_heads=4, encoder_layers=2)
    model32 = HAATransformer(cfg)
    model16 = HAATransformer(cfg, dtype=jnp.bfloat16)
    lang, lang_cls, frames, dirs, lengths_steps, mask = _ragged_inputs(cfg)
    T = frames.shape[1]
    params = model32.init(
        jax.random.PRNGKey(0), lang, lang_cls, frames, dirs,
        lengths_steps[-1], mask,
    )
    t = T - 1
    ref_a, _ = model16.apply(
        params, lang, lang_cls, frames, dirs, lengths_steps[t], mask,
        deterministic=True,
    )
    fast_a, _ = et_fast.teacher_onepass(
        params, cfg, lang, lang_cls, frames, dirs, lengths_steps, mask,
        dtype=jnp.bfloat16,
    )
    np.testing.assert_allclose(
        np.asarray(fast_a[t], np.float32), np.asarray(ref_a, np.float32),
        atol=0.02, rtol=0.02,
    )


class TestAttendTwo:
    """Direct unit pins for the two-softmax merge (et_fast._attend_two)."""

    def _rand(self, shape, seed):
        return jnp.asarray(
            np.random.default_rng(seed).normal(size=shape).astype(np.float32))

    def test_matches_concat_attend(self):
        B, H, Q, K1, K2, hd = 2, 3, 5, 7, 4, 8
        q = self._rand((B, H, Q, hd), 0)
        k1, v1 = self._rand((B, H, K1, hd), 1), self._rand((B, H, K1, hd), 2)
        k2, v2 = self._rand((B, H, K2, hd), 3), self._rand((B, H, K2, hd), 4)
        bias1 = jnp.where(
            jnp.asarray(np.random.default_rng(5).random((B, 1, Q, K1)) < 0.3),
            -jnp.inf, 0.0)
        bias2 = jnp.zeros((B, 1, Q, K2))
        got = et_fast._attend_two(q, k1, v1, bias1, k2, v2, bias2)
        ref = et_fast._attend(
            q, jnp.concatenate([k1, k2], 2), jnp.concatenate([v1, v2], 2),
            jnp.concatenate([jnp.broadcast_to(bias1, (B, 1, Q, K1)),
                             bias2], -1))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_fully_masked_rows_are_zero(self):
        B, H, Q, K, hd = 1, 2, 3, 4, 8
        q = self._rand((B, H, Q, hd), 0)
        k, v = self._rand((B, H, K, hd), 1), self._rand((B, H, K, hd), 2)
        neg = jnp.full((B, 1, Q, K), -jnp.inf)
        out = et_fast._attend_two(q, k, v, neg, k, v, neg)
        np.testing.assert_array_equal(np.asarray(out), 0.0)

    def test_inf_logit_on_masked_position_no_nan(self):
        """A +inf logit landing on a -inf-masked position (bf16 overflow
        scenario) must not poison the row with NaN (ADVICE r4)."""
        B, H, Q, K, hd = 1, 1, 2, 3, 4
        q = jnp.full((B, H, Q, hd), 1e38)          # logits overflow to +inf
        k = jnp.ones((B, H, K, hd))
        v = self._rand((B, H, K, hd), 0)
        # mask out position 0 of source 1 -> l = inf + (-inf) = NaN there
        bias1 = jnp.asarray([[[[-jnp.inf, 0.0, 0.0]] * Q]])
        k2 = jnp.zeros((B, H, K, hd))              # finite logits
        v2 = self._rand((B, H, K, hd), 1)
        bias2 = jnp.zeros((B, 1, Q, K))
        out = et_fast._attend_two(q, k, v, bias1, k2, v2, bias2)
        assert np.all(np.isfinite(np.asarray(out)))
