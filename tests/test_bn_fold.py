"""Eval-mode BN folding (models.darknet.fold_darknet_params): the inference
transform must reproduce the unfolded eval path exactly (up to float
reassociation) at both the module level and through the full eval rollout."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avdn_tpu.models.darknet import Darknet, DarknetConfig, fold_darknet_params


def _randomized_dk(seed=0):
    """Tiny darknet with NON-trivial BN params/stats (random γ/β and
    running stats updated by a train-mode pass)."""
    cfg = DarknetConfig.tiny()
    dk = Darknet(cfg)
    rng = jax.random.PRNGKey(seed)
    x0 = jax.random.normal(rng, (4, 224, 224, 3))
    variables = dk.init(rng, x0, train=False)
    # randomize γ/β away from the trivial (1, 0) init
    ks = jax.random.split(rng, 64)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.3 * jax.random.normal(ks[hash(p.shape) % 64], p.shape),
        variables["params"],
    )
    # push running stats off (0, 1)
    _, upd = dk.apply({"params": params,
                       "batch_stats": variables["batch_stats"]},
                      x0, train=True, mutable=["batch_stats"])
    return dk, params, upd["batch_stats"]


class TestFoldParity:
    def test_module_fold_matches_eval_bn(self):
        dk, params, stats = _randomized_dk()
        folded = Darknet(dk.cfg, folded=True)
        fp = fold_darknet_params(dk.cfg, params, stats)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3))
        ref = dk.apply({"params": params, "batch_stats": stats}, x,
                       train=False)
        got = folded.apply({"params": fp}, x, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_input_std_fuses_into_first_conv(self):
        """Only the /std scale folds (it commutes with the conv's zero
        padding); the caller feeds mean-subtracted views."""
        from avdn_tpu.rollout.engine import RGB_MEAN, RGB_STD

        dk, params, stats = _randomized_dk()
        folded = Darknet(dk.cfg, folded=True)
        fp = fold_darknet_params(dk.cfg, params, stats, input_std=RGB_STD)
        raw = jax.random.uniform(jax.random.PRNGKey(2), (2, 224, 224, 3),
                                 minval=0.0, maxval=255.0)
        ref = dk.apply({"params": params, "batch_stats": stats},
                       (raw - RGB_MEAN) / RGB_STD, train=False)
        got = folded.apply({"params": fp}, raw - RGB_MEAN, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_input_mean_fold_rejected(self):
        dk, params, stats = _randomized_dk()
        with pytest.raises(ValueError, match="border"):
            fold_darknet_params(dk.cfg, params, stats,
                                input_mean=np.zeros(3), input_std=np.ones(3))

    def test_eval_rollout_fold_vs_unfold(self):
        """The full student-forced eval rollout with fold_bn_eval on vs off
        must agree on actions/progress/loss — trajectory decisions must
        never flip."""
        import dataclasses
        import sys, os
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import __graft_entry__ as g
        from avdn_tpu.train import make_eval_rollout

        world, cfg, (bert, dk, et), state, batch = g._flagship(
            batch_size=2, map_px=256, max_action_len=3, demb=128,
            encoder_layers=1, darknet="tiny",
        )
        # non-trivial BN stats: one train-mode darknet pass
        x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 224, 224, 3))
        _, upd = dk.apply({"params": state.darknet_params,
                           "batch_stats": state.batch_stats},
                          x0, train=True, mutable=["batch_stats"])
        state = state.replace(batch_stats=upd["batch_stats"])
        rng = jax.random.PRNGKey(3)
        bank = jnp.asarray(world.map_bank)
        outs = {}
        for fold in (False, True):
            c = dataclasses.replace(cfg, fold_bn_eval=fold)
            fn = jax.jit(make_eval_rollout(c, bert, dk, et, teacher=False))
            outs[fold] = jax.device_get(fn(state, bank, batch, rng))
        np.testing.assert_allclose(outs[True].actions_wp,
                                   outs[False].actions_wp,
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(outs[True].pred_progress,
                                   outs[False].pred_progress,
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(outs[True].loss, outs[False].loss,
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_array_equal(outs[True].alive_post,
                                      outs[False].alive_post)
