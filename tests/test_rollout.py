"""Rollout-engine tests: scan mechanics, ended semantics, loss behaviour,
trajectory assembly, metrics plumbing — on tiny models over synthetic worlds."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avdn_tpu.data.synthetic import synthetic_world
from avdn_tpu.models import Darknet, DarknetConfig, HAATransformer, HAALSTM
from avdn_tpu.models.et import ETConfig
from avdn_tpu.models.lstm import LSTMConfig
from avdn_tpu.rollout import RolloutConfig, rollout
from avdn_tpu.rollout.engine import make_et_step, make_lstm_step
from avdn_tpu.metrics import assemble_trajectories, eval_metrics


def tiny_models(world, lang_dim=64, seed=0):
    dk_cfg = DarknetConfig.tiny()
    dk = Darknet(dk_cfg)
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    dk_vars = dk.init(k1, jnp.zeros((1, 224, 224, 3)), train=False)
    et_cfg = ETConfig(demb=lang_dim, encoder_heads=4, encoder_layers=1)
    et = HAATransformer(et_cfg)
    B = world.batch.lang_feat.shape[0]
    T = 4
    et_params = et.init(
        k2,
        world.batch.lang_feat,
        world.batch.lang_cls,
        jnp.zeros((B, T, 64, 49)),
        jnp.zeros((B, T, 2)),
        jnp.ones((B,), jnp.int32),
        world.batch.lang_mask,
    )
    return dk, dk_vars, et, et_params


@pytest.fixture(scope="module")
def world():
    return synthetic_world(batch_size=3, map_px=256, lang_dim=64, seed=1)


@pytest.fixture(scope="module")
def et_rollout_result(world):
    dk, dk_vars, et, et_params = tiny_models(world)
    cfg = RolloutConfig(max_action_len=4, teacher_forcing=True, train=False,
                        collect_ha_metrics=True)
    step, init_state = make_et_step(dk, et, dk_vars, et_params, world.batch, cfg)
    out, _ = rollout(
        map_bank=jnp.asarray(world.map_bank),
        batch=world.batch,
        cfg=cfg,
        model_step=step,
        init_model_state=init_state(64, 49),
        rng=jax.random.PRNGKey(0),
    )
    return out


class TestETRollout:
    def test_shapes(self, world, et_rollout_result):
        out = et_rollout_result
        T, B = 4, 3
        assert out.actions_wp.shape == (T, B, 2)
        assert out.corners.shape == (T, B, 4, 2)
        assert np.isfinite(float(out.loss))

    def test_ended_monotonic(self, et_rollout_result):
        alive = np.asarray(et_rollout_result.alive_post)
        # once an item dies it stays dead
        for i in range(alive.shape[1]):
            seq = alive[:, i].astype(int)
            assert all(seq[t] >= seq[t + 1] for t in range(len(seq) - 1))

    def test_all_end_by_last_step(self, et_rollout_result):
        assert not np.any(np.asarray(et_rollout_result.alive_post)[-1])

    def test_waypoint_in_inf_ball(self, et_rollout_result):
        wp = np.asarray(et_rollout_result.actions_wp)
        assert np.all(np.abs(wp) <= 1.0 + 1e-5)

    def test_altitude_clipped(self, et_rollout_result):
        alt = np.asarray(et_rollout_result.actions_alt)
        assert np.all((alt >= 0) & (alt <= 1))

    def test_teacher_forcing_tracks_gt_path(self, world):
        """Teacher-forced rollout should climb in GT progress (the oracle
        drives the agent along the GT polyline toward the goal)."""
        dk, dk_vars, et, et_params = tiny_models(world)
        cfg = RolloutConfig(max_action_len=6, teacher_forcing=True)
        step, init_state = make_et_step(dk, et, dk_vars, et_params, world.batch, cfg)
        out, _ = rollout(
            map_bank=jnp.asarray(world.map_bank), batch=world.batch, cfg=cfg,
            model_step=step, init_model_state=init_state(64, 49),
            rng=jax.random.PRNGKey(0),
        )
        prog = np.asarray(out.gt_progress)
        alive = np.asarray(out.alive_pre)
        for i in range(prog.shape[1]):
            steps = prog[alive[:, i], i]
            if len(steps) >= 2:
                assert steps[-1] >= steps[0] - 1e-3, steps

    def test_trajectory_assembly_and_metrics(self, world, et_rollout_result):
        preds = assemble_trajectories(et_rollout_result, world.episodes_meta)
        assert len(preds) == 3
        avg, metrics = eval_metrics(preds)
        for key in ("lengths", "sr", "oracle_sr", "spl", "gp", "oracle_gp",
                    "gt_length", "iou"):
            assert key in avg and np.isfinite(avg[key])
        # SPL <= SR (scaled), both in [0, 100]
        assert 0 <= avg["spl"] <= avg["sr"] + 1e-9 <= 100.0
        ha_avg, _ = eval_metrics(preds, human_att_eval=True)
        assert set(ha_avg) == {"HA_precision", "HA_recall", "nss"}

    def test_student_mode_runs(self, world):
        dk, dk_vars, et, et_params = tiny_models(world)
        cfg = RolloutConfig(max_action_len=4, teacher_forcing=False)
        step, init_state = make_et_step(dk, et, dk_vars, et_params, world.batch, cfg)
        out, _ = rollout(
            map_bank=jnp.asarray(world.map_bank), batch=world.batch, cfg=cfg,
            model_step=step, init_model_state=init_state(64, 49),
            rng=jax.random.PRNGKey(0),
        )
        assert np.isfinite(float(out.loss))

    def test_train_mode_has_grad(self, world):
        """Loss must be differentiable end-to-end through the scan."""
        dk, dk_vars, et, et_params = tiny_models(world)
        cfg = RolloutConfig(max_action_len=3, teacher_forcing=True, train=True)

        def loss_fn(params):
            step, init_state = make_et_step(dk, et, dk_vars, params,
                                            world.batch, cfg)
            out, _ = rollout(
                map_bank=jnp.asarray(world.map_bank), batch=world.batch,
                cfg=cfg, model_step=step, init_model_state=init_state(64, 49),
                rng=jax.random.PRNGKey(1),
            )
            return out.loss

        g = jax.grad(lambda p: loss_fn(p))(et_params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
        assert total > 0.0


class TestLSTMRollout:
    def test_runs_and_finite(self, world):
        dk_cfg = DarknetConfig.tiny()
        dk = Darknet(dk_cfg)
        key = jax.random.PRNGKey(2)
        dk_vars = dk.init(key, jnp.zeros((1, 224, 224, 3)), train=False)
        # tiny LSTM matching the tiny darknet's 64-channel output and the
        # synthetic world's 64-d language features
        cfg_l = LSTMConfig(hidden_size=64, dir_hidden=16, vis_hidden=48)
        lstm = HAALSTM(cfg_l)
        B = 3
        from avdn_tpu.models.lstm import init_lstm_state
        state0 = init_lstm_state(B, cfg_l)
        lstm_params = lstm.init(
            jax.random.PRNGKey(3),
            jnp.zeros((B, 1)),
            jnp.zeros((B, 64, 49)),
            world.batch.lang_cls,
            world.batch.lang_feat,
            state0,
        )
        cfg = RolloutConfig(max_action_len=4, teacher_forcing=False,
                            stop_threshold=0.25)
        step, init_state = make_lstm_step(dk, lstm, dk_vars, lstm_params,
                                          world.batch, cfg)
        st = init_state()
        st["lstm"] = state0
        out, _ = rollout(
            map_bank=jnp.asarray(world.map_bank), batch=world.batch, cfg=cfg,
            model_step=step, init_model_state=st, rng=jax.random.PRNGKey(4),
        )
        assert np.isfinite(float(out.loss))
        assert not np.any(np.asarray(out.alive_post)[-1])
