"""Learning smoke test: a tiny agent trained on one synthetic world gets
measurably better at predicting oracle progress/waypoints (the training
signal actually flows end-to-end through render → darknet → ET → losses)."""

import pytest

pytestmark = pytest.mark.e2e  # compile-heavy driver flow (tiered suite, README)

import numpy as np
import jax
import jax.numpy as jnp

from avdn_tpu.metrics import assemble_trajectories, eval_metrics

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from test_train_step import build_tiny


def _eval_loss(cfg, models, state, batch, bank):
    from avdn_tpu.train import make_eval_rollout

    bert, dk, vln = models
    fn = jax.jit(make_eval_rollout(cfg, bert, dk, vln, teacher=True))
    out = fn(state, bank, batch, jax.random.PRNGKey(99))
    return float(out.loss)


def test_training_reduces_teacher_forced_error():
    world, cfg, models, state, batch = build_tiny("et", batch_size=3, seed=11,
                                                  max_action_len=3)
    from avdn_tpu.train import make_train_step

    bert, dk, vln = models
    bank = jnp.asarray(world.map_bank)
    before = _eval_loss(cfg, models, state, batch, bank)
    step_fn = jax.jit(make_train_step(cfg, bert, dk, vln))
    rng = jax.random.PRNGKey(0)
    for i in range(12):
        rng, r = jax.random.split(rng)
        state, metrics = step_fn(state, bank, batch, r)
    after = _eval_loss(cfg, models, state, batch, bank)
    # teacher-forced supervision error on the training batch must drop
    # (12 AdamW steps at the reference's 1e-5 lr → ~18% observed)
    assert after < before * 0.9, (before, after)
