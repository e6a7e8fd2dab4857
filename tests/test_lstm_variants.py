"""Rollouts with the HAA-LSTM ablation variants (vision-only / lang-only)."""

import numpy as np
import jax
import jax.numpy as jnp

from avdn_tpu.data.synthetic import synthetic_world
from avdn_tpu.models import Darknet, DarknetConfig
from avdn_tpu.models.lstm import (
    HAALSTMVisionOnly, HAALSTMLangOnly, LSTMConfig, init_lstm_state,
)
from avdn_tpu.rollout import RolloutConfig, rollout
from avdn_tpu.rollout.engine import (
    make_lstm_vision_only_step,
    make_lstm_lang_only_step,
)


def test_vision_only_rollout():
    world = synthetic_world(batch_size=2, map_px=256, lang_dim=16, seed=5)
    dk = Darknet(DarknetConfig.tiny())
    dk_vars = dk.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)),
                      train=False)
    cfg_l = LSTMConfig(hidden_size=64, dir_hidden=16, vis_hidden=48)
    m = HAALSTMVisionOnly(cfg_l)
    st = init_lstm_state(2, cfg_l)
    params = m.init(jax.random.PRNGKey(1), jnp.zeros((2, 1)),
                    jnp.zeros((2, 64, 49)), st)
    cfg = RolloutConfig(max_action_len=3, teacher_forcing=False,
                        stop_threshold=0.25)
    step, init_state = make_lstm_vision_only_step(
        dk, m, dk_vars, params, world.batch, cfg
    )
    out, _ = rollout(
        map_bank=jnp.asarray(world.map_bank), batch=world.batch, cfg=cfg,
        model_step=step, init_model_state=init_state(),
        rng=jax.random.PRNGKey(2),
    )
    assert np.isfinite(np.asarray(out.actions_wp)).all()
    assert not np.asarray(out.alive_post)[-1].any()


def test_lang_only_rollout():
    world = synthetic_world(batch_size=2, map_px=256, lang_dim=64, seed=6)
    cfg_l = LSTMConfig(hidden_size=64)
    m = HAALSTMLangOnly(cfg_l)
    st = (jnp.zeros((2, 64)), jnp.zeros((2, 64)))
    params = m.init(jax.random.PRNGKey(1), jnp.zeros((2, 1)),
                    world.batch.lang_feat, st)
    cfg = RolloutConfig(max_action_len=3, teacher_forcing=False,
                        stop_threshold=0.25)
    step, init_state = make_lstm_lang_only_step(m, params, world.batch, cfg)
    out, _ = rollout(
        map_bank=jnp.asarray(world.map_bank), batch=world.batch, cfg=cfg,
        model_step=step, init_model_state=init_state(),
        rng=jax.random.PRNGKey(2),
    )
    assert np.isfinite(np.asarray(out.actions_wp)).all()
