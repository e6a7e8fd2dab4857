"""Train-step tests: loss decreases under repeated steps on one batch, DP
sharding over a virtual 8-device CPU mesh produces replica-identical params."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.compile  # full grad compiles, minutes each (tiered suite)

from avdn_tpu.data.synthetic import synthetic_world
from avdn_tpu.models import (
    BertConfig,
    BertLanguageEncoder,
    Darknet,
    DarknetConfig,
    HAATransformer,
    HAALSTM,
)
from avdn_tpu.models.et import ETConfig
from avdn_tpu.models.lstm import LSTMConfig, init_lstm_state
from avdn_tpu.train import (
    TrainConfig,
    TrainBatch,
    create_train_state,
    make_train_step,
    make_eval_rollout,
)
from avdn_tpu.parallel import make_mesh, shard_episode_batch, replicated_sharding


def build_tiny(family="et", batch_size=3, seed=0, max_action_len=3):
    bert_cfg = BertConfig.tiny()  # hidden 128
    world = synthetic_world(batch_size=batch_size, map_px=256,
                            lang_dim=bert_cfg.hidden_size, seed=seed)
    bert = BertLanguageEncoder(bert_cfg)
    dk = Darknet(DarknetConfig.tiny())
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    L = 12
    ids = np.random.default_rng(seed).integers(0, 1000, (batch_size, L)).astype(np.int32)
    mask = np.ones((batch_size, L), np.int32)
    bert_vars = bert.init(ks[0], jnp.asarray(ids), jnp.asarray(mask))
    dk_vars = dk.init(ks[1], jnp.zeros((1, 224, 224, 3)), train=False)

    if family == "et":
        vln_cfg = ETConfig(demb=bert_cfg.hidden_size, encoder_heads=4,
                           encoder_layers=1)
        vln = HAATransformer(vln_cfg)
        vln_vars = vln.init(
            ks[2],
            jnp.zeros((batch_size, L, bert_cfg.hidden_size)),
            jnp.zeros((batch_size, 49)),
            jnp.zeros((batch_size, max_action_len, 64, 49)),
            jnp.zeros((batch_size, max_action_len, 2)),
            jnp.ones((batch_size,), jnp.int32),
        )
        cfg = TrainConfig(family="et", max_action_len=max_action_len,
                          nss_w=0.1)
    else:
        vln_cfg = LSTMConfig(hidden_size=bert_cfg.hidden_size, dir_hidden=32,
                             vis_hidden=bert_cfg.hidden_size - 32)
        vln = HAALSTM(vln_cfg)
        st = init_lstm_state(batch_size, vln_cfg)
        vln_vars = vln.init(
            ks[2],
            jnp.zeros((batch_size, 1)),
            jnp.zeros((batch_size, 64, 49)),
            jnp.zeros((batch_size, 49)),
            jnp.zeros((batch_size, L, bert_cfg.hidden_size)),
            st,
        )
        cfg = TrainConfig(family="lstm", max_action_len=max_action_len,
                          student_stop=0.25, darknet_in_vln=True, nss_w=0.0)

    state = create_train_state(cfg, bert_vars, dk_vars, vln_vars)
    batch = TrainBatch(
        episode=world.batch,
        ids_instr=jnp.asarray(ids),
        mask_instr=jnp.asarray(mask),
        ids_dialog=jnp.asarray(ids),
        mask_dialog=jnp.asarray(mask),
    )
    return world, cfg, (bert, dk, vln), state, batch


class TestTrainStepET:
    def test_loss_decreases(self):
        world, cfg, (bert, dk, vln), state, batch = build_tiny("et")
        step_fn = jax.jit(make_train_step(cfg, bert, dk, vln))
        bank = jnp.asarray(world.map_bank)
        losses = []
        rng = jax.random.PRNGKey(0)
        for i in range(8):
            rng, r = jax.random.split(rng)
            state, metrics = step_fn(state, bank, batch, r)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        # same batch repeatedly → loss should trend down
        assert losses[-1] < losses[0], losses

    def test_grad_norms_finite(self):
        world, cfg, (bert, dk, vln), state, batch = build_tiny("et")
        step_fn = jax.jit(make_train_step(cfg, bert, dk, vln))
        bank = jnp.asarray(world.map_bank)
        state, metrics = step_fn(state, bank, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["grad_norm_vln"]))
        assert float(metrics["grad_norm_bert"]) > 0

    def test_eval_rollout(self):
        world, cfg, (bert, dk, vln), state, batch = build_tiny("et")
        eval_fn = jax.jit(make_eval_rollout(cfg, bert, dk, vln, teacher=False))
        out = eval_fn(state, jnp.asarray(world.map_bank), batch,
                      jax.random.PRNGKey(2))
        assert np.isfinite(np.asarray(out.actions_wp)).all()


class TestRemat:
    def test_remat_matches_baseline_exactly(self):
        """--remat recomputes scan-step activations under AD; the math is
        identical, so loss AND grads must match the non-remat step."""
        import dataclasses as dc

        world, cfg, (bert, dk, vln), state, batch = build_tiny("et")
        bank = jnp.asarray(world.map_bank)
        r = jax.random.PRNGKey(0)
        _, m0 = jax.jit(make_train_step(cfg, bert, dk, vln))(
            state, bank, batch, r
        )
        cfg_r = dc.replace(cfg, remat=True)
        _, m1 = jax.jit(make_train_step(cfg_r, bert, dk, vln))(
            state, bank, batch, r
        )
        assert abs(float(m0["loss"]) - float(m1["loss"])) < 1e-5
        assert abs(float(m0["grad_norm_vln"]) - float(m1["grad_norm_vln"])) < 1e-3
        assert abs(float(m0["grad_norm_bert"]) - float(m1["grad_norm_bert"])) < 1e-3

    def test_remat_dots_policy_matches_baseline(self):
        """--remat_policy dots saves matmul/conv outputs and recomputes only
        elementwise ops — still the same math as no remat."""
        import dataclasses as dc

        world, cfg, (bert, dk, vln), state, batch = build_tiny("et")
        bank = jnp.asarray(world.map_bank)
        r = jax.random.PRNGKey(0)
        _, m0 = jax.jit(make_train_step(cfg, bert, dk, vln))(
            state, bank, batch, r
        )
        cfg_r = dc.replace(cfg, remat=True, remat_policy="dots")
        _, m1 = jax.jit(make_train_step(cfg_r, bert, dk, vln))(
            state, bank, batch, r
        )
        assert abs(float(m0["loss"]) - float(m1["loss"])) < 1e-5
        assert abs(float(m0["grad_norm_vln"]) - float(m1["grad_norm_vln"])) < 1e-3


class TestGradAccum:
    def test_accum_trains_and_matches_scale(self):
        """grad_accum=2 on B=4: runs and learns. The loss is NOT expected to
        match the full-batch step exactly: the engine's any-alive loss gating
        is batch-scoped (reference semantics — agent.py:663-669 accumulates
        for ended items until the whole batch ends, and the loop break at
        agent.py:771 is batch-wide), and dropout rngs/BN stats are per-micro.
        Accumulation therefore behaves like running K smaller reference
        batches with full-batch normalisation — same order of magnitude."""
        import dataclasses as dc

        world, cfg, (bert, dk, vln), state, batch = build_tiny(
            "et", batch_size=4, seed=3
        )
        cfg2 = dc.replace(cfg, grad_accum=2)
        step1 = jax.jit(make_train_step(cfg, bert, dk, vln))
        step2 = jax.jit(make_train_step(cfg2, bert, dk, vln))
        bank = jnp.asarray(world.map_bank)
        r = jax.random.PRNGKey(0)
        _, m1 = step1(state, bank, batch, r)
        _, m2 = step2(state, bank, batch, r)
        l1, l2 = float(m1["loss"]), float(m2["loss"])
        assert np.isfinite(l1) and np.isfinite(l2)
        assert 0.5 < l2 / l1 < 2.0, (l1, l2)

        # and it learns
        st = state
        losses = []
        rng = jax.random.PRNGKey(1)
        for _ in range(6):
            rng, rr = jax.random.split(rng)
            st, m = step2(st, bank, batch, rr)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], losses


class TestTrainStepLSTM:
    def test_loss_decreases(self):
        world, cfg, (bert, dk, vln), state, batch = build_tiny("lstm")
        step_fn = jax.jit(make_train_step(cfg, bert, dk, vln))
        bank = jnp.asarray(world.map_bank)
        losses = []
        rng = jax.random.PRNGKey(3)
        for i in range(6):
            rng, r = jax.random.split(rng)
            state, metrics = step_fn(state, bank, batch, r)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses


class TestDataParallel:
    def test_sharded_step_runs_on_mesh(self):
        n_dev = len(jax.devices())
        assert n_dev >= 8, "conftest should expose 8 virtual CPU devices"
        world, cfg, (bert, dk, vln), state, batch = build_tiny(
            "et", batch_size=8, seed=4
        )
        mesh = make_mesh(8)
        rep = replicated_sharding(mesh)
        state = jax.device_put(state, rep)
        bank = jax.device_put(jnp.asarray(world.map_bank), rep)
        batch = shard_episode_batch(batch, mesh)
        step_fn = jax.jit(make_train_step(cfg, bert, dk, vln))
        new_state, metrics = step_fn(state, bank, batch, jax.random.PRNGKey(5))
        assert np.isfinite(float(metrics["loss"]))
        # params stay replicated (gradient psum happened inside)
        leaf = jax.tree_util.tree_leaves(new_state.vln_params)[0]
        assert len(leaf.sharding.device_set) == 8

    def test_sharded_step_with_twopass_and_remat(self):
        """The fast-mode combo (--render_twopass --remat) must partition
        over the DP mesh: per-item dynamic bank slices + jax.checkpoint
        under a sharded batch."""
        import dataclasses as dc

        world, cfg, (bert, dk, vln), state, batch = build_tiny(
            "et", batch_size=8, seed=9, max_action_len=2
        )
        cfg = dc.replace(cfg, render_twopass=True, render_crop=128,
                         remat=True)
        mesh = make_mesh(8)
        rep = replicated_sharding(mesh)
        state = jax.device_put(state, rep)
        bank = jax.device_put(jnp.asarray(world.map_bank), rep)
        batch = shard_episode_batch(batch, mesh)
        step_fn = jax.jit(make_train_step(cfg, bert, dk, vln))
        new_state, metrics = step_fn(state, bank, batch, jax.random.PRNGKey(10))
        assert np.isfinite(float(metrics["loss"]))
        leaf = jax.tree_util.tree_leaves(new_state.vln_params)[0]
        assert len(leaf.sharding.device_set) == 8

    def test_dp_matches_single_device(self):
        """The sharded step must produce the same params as the unsharded
        step (same global batch, replicated params → identical math)."""
        world, cfg, (bert, dk, vln), state, batch = build_tiny(
            "et", batch_size=8, seed=6, max_action_len=2
        )
        bank = jnp.asarray(world.map_bank)
        step_fn = jax.jit(make_train_step(cfg, bert, dk, vln))
        s_single, m_single = step_fn(state, bank, batch, jax.random.PRNGKey(7))

        mesh = make_mesh(8)
        rep = replicated_sharding(mesh)
        state_r = jax.device_put(state, rep)
        bank_r = jax.device_put(bank, rep)
        batch_r = shard_episode_batch(batch, mesh)
        s_shard, m_shard = step_fn(state_r, bank_r, batch_r, jax.random.PRNGKey(7))
        assert float(m_single["loss"]) == pytest.approx(
            float(m_shard["loss"]), rel=1e-4
        )
        a = jax.tree_util.tree_leaves(s_single.vln_params)
        b = jax.tree_util.tree_leaves(s_shard.vln_params)
        for x, y in zip(a, b):
            # sharded all-reduce changes summation order; tiny float drift ok
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-4)


class TestDetachedSimulatorFeedback:
    def test_student_grads_do_not_flow_through_simulator(self, monkeypatch):
        """The reference detaches actions to host numpy before the env step
        (agent.py:724-755): step t's loss never backprops into step t-1's
        action through the next view/oracle. The engine must match — so the
        one-step update must be IDENTICAL when the whole simulator
        transition is additionally wrapped in stop_gradient. (Before the
        round-3 fix, grads leaked through the un-rounded move distance
        ``a_dist = |wp|·half_edge`` into render/oracle of later steps.)"""
        import avdn_tpu.rollout.engine as engine

        world, cfg, (bert, dk, vln), state, batch = build_tiny(
            "et", batch_size=2, seed=3, max_action_len=3
        )
        bank = jnp.asarray(world.map_bank)
        rng = jax.random.PRNGKey(11)

        step_fn = jax.jit(make_train_step(cfg, bert, dk, vln))
        s_real, m_real = step_fn(state, bank, batch, rng)

        orig = engine.dynamics_update

        def fully_detached(corners, directions, act_wp, act_alt, prog_stop,
                           thresh, t, T, extent):
            args = jax.lax.stop_gradient(
                (corners, directions, act_wp, act_alt, prog_stop, extent))
            return orig(args[0], args[1], args[2], args[3], args[4],
                        thresh, t, T, args[5])

        monkeypatch.setattr(engine, "dynamics_update", fully_detached)
        step_fn2 = jax.jit(make_train_step(cfg, bert, dk, vln))
        s_det, m_det = step_fn2(state, bank, batch, rng)

        assert float(m_real["loss"]) == pytest.approx(
            float(m_det["loss"]), abs=0)  # forward identical by construction
        for name in ("bert_params", "darknet_params", "vln_params"):
            a = jax.tree_util.tree_leaves(getattr(s_real, name))
            b = jax.tree_util.tree_leaves(getattr(s_det, name))
            for x, y in zip(a, b):
                np.testing.assert_allclose(
                    np.asarray(x), np.asarray(y), rtol=0, atol=1e-6)
