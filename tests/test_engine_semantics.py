"""Rollout-engine semantic edge cases the reference defines implicitly:
losses accumulate for ended items; trajectories stop logging at the stop
step; teacher-forced stops happen at progress > 0.5 (agent.py:663-771)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avdn_tpu.data.synthetic import synthetic_world
from avdn_tpu.rollout import RolloutConfig, rollout


def constant_model_step(action_value):
    """Model stub: constant action, zero saliency."""

    def step(state, x, dir_feat, t, ended, rng):
        B = x.shape[0]
        action = jnp.tile(jnp.asarray(action_value, jnp.float32)[None], (B, 1))
        return state, action, jnp.zeros((B, 224, 224))

    return step


@pytest.fixture(scope="module")
def world():
    return synthetic_world(batch_size=2, map_px=256, lang_dim=16, seed=9)


def run(world, cfg, action):
    out, _ = rollout(
        map_bank=jnp.asarray(world.map_bank),
        batch=world.batch,
        cfg=cfg,
        model_step=constant_model_step(action),
        init_model_state={},
        rng=jax.random.PRNGKey(0),
    )
    return out


class TestStopSemantics:
    def test_student_stop_on_progress(self, world):
        # predicted progress 0.9 > 0.5 → every item stops at step 0
        cfg = RolloutConfig(max_action_len=4, teacher_forcing=False)
        out = run(world, cfg, [0.3, 0.3, 0.5, 0.9])
        alive_post = np.asarray(out.alive_post)
        assert not alive_post[0].any()
        # but the model was still called at step 0 for everyone
        assert np.asarray(out.alive_pre)[0].all()

    def test_student_threshold_boundary(self, world):
        # progress 0.5 is NOT > 0.5 → nobody stops early
        cfg = RolloutConfig(max_action_len=3, teacher_forcing=False)
        out = run(world, cfg, [0.3, 0.3, 0.5, 0.5])
        alive_post = np.asarray(out.alive_post)
        assert alive_post[0].all() and alive_post[1].all()
        assert not alive_post[2].any()  # T-1 force stop

    def test_lstm_threshold(self, world):
        cfg = RolloutConfig(max_action_len=3, teacher_forcing=False,
                            stop_threshold=0.25)
        out = run(world, cfg, [0.3, 0.3, 0.5, 0.3])
        assert not np.asarray(out.alive_post)[0].any()  # 0.3 > 0.25

    def test_losses_accumulate_for_ended_items(self, world):
        """An all-stopped batch still accrues loss on the next step only if
        someone is alive at entry — and the loop-break rule zeroes later
        steps (agent.py:771)."""
        cfg = RolloutConfig(max_action_len=4, teacher_forcing=False)
        out_all_stop = run(world, cfg, [0.3, 0.3, 0.5, 0.9])
        # loss only from step 0 (everyone entered alive), steps 1-3 all-ended
        cfg1 = RolloutConfig(max_action_len=1, teacher_forcing=False)
        out_one = run(world, cfg1, [0.3, 0.3, 0.5, 0.9])
        # rng folding differs per step count only after step 0; step-0 loss
        # must match, and the 4-step loss must equal the 1-step loss
        assert float(out_all_stop.loss) == pytest.approx(
            float(out_one.loss), rel=1e-5
        )

    def test_trajectory_logging_stops(self, world):
        cfg = RolloutConfig(max_action_len=4, teacher_forcing=False)
        out = run(world, cfg, [0.2, 0.1, 0.5, 0.9])
        # alive_pre True only at step 0; actions after that are masked out
        assert np.asarray(out.alive_pre)[1:].sum() == 0

    def test_gt_progress_logged_matches_final_iou(self, world):
        """The last alive-step gt_progress is the IoU of the FINAL corners
        (the stop decision step), which metrics consume as scores['iou']."""
        cfg = RolloutConfig(max_action_len=3, teacher_forcing=False)
        out = run(world, cfg, [0.1, 0.1, 0.5, 0.0])  # never stops early
        alive = np.asarray(out.alive_pre)
        assert alive.all()  # 3 steps all alive (progress 0 < 0.5)
        prog = np.asarray(out.gt_progress)
        assert np.isfinite(prog).all()
