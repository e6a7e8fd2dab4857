"""Analytic model-FLOP counts (utils/flops.py) cross-checked against XLA's
cost analysis on loop-free jitted forwards — the one place cost_analysis is
trustworthy (it counts while-loop bodies once, so scan paths can't be
checked this way; that blind spot is exactly why the analytic counts
exist)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avdn_tpu.models.bert import BertConfig, BertLanguageEncoder
from avdn_tpu.models.darknet import Darknet, DarknetConfig
from avdn_tpu.models.et import ETConfig, HAATransformer
from avdn_tpu.utils import flops as F


def _xla_flops(fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    f = float(ca.get("flops", 0.0))
    if f <= 0:
        pytest.skip("backend exposes no cost model")
    return f


def _assert_close_enough(analytic, xla, low=0.65, high=1.1):
    """Analytic counts contractions only; XLA also counts elementwise ops,
    so analytic <= xla (up to fusion accounting noise), but must capture
    the bulk of the work."""
    ratio = analytic / xla
    assert low <= ratio <= high, (
        f"analytic {analytic:.3e} vs XLA {xla:.3e} (ratio {ratio:.3f})"
    )


class TestAnalyticVsXLA:
    def test_darknet_default_tower(self):
        cfg = DarknetConfig.default()
        model = Darknet(cfg)
        x = jnp.zeros((2, 224, 224, 3))
        vs = model.init(jax.random.PRNGKey(0), x, train=False)
        xla = _xla_flops(lambda v, x: model.apply(v, x, train=False), vs, x)
        # conv-dominated: analytic tracks XLA within ~10% (XLA reports
        # post-optimization HLO, which can land slightly below the naive
        # 2·MAC count on rewritten convs — measured ratio 1.075 on CPU)
        _assert_close_enough(F.darknet_forward_flops(cfg, batch=2), xla,
                             low=0.9, high=1.15)

    def test_darknet_tiny_with_route_shortcut(self):
        cfg = DarknetConfig.tiny()
        model = Darknet(cfg)
        x = jnp.zeros((1, 224, 224, 3))
        vs = model.init(jax.random.PRNGKey(0), x, train=False)
        xla = _xla_flops(lambda v, x: model.apply(v, x, train=False), vs, x)
        _assert_close_enough(F.darknet_forward_flops(cfg, batch=1), xla,
                             low=0.8, high=1.05)

    def test_bert_base(self):
        cfg = BertConfig()
        model = BertLanguageEncoder(cfg)
        B, L = 2, 48
        ids = jnp.zeros((B, L), jnp.int32)
        mask = jnp.ones((B, L), jnp.int32)
        vs = model.init(jax.random.PRNGKey(0), ids, mask)
        xla = _xla_flops(
            lambda v, i, m: model.apply(v, i, m, deterministic=True),
            vs, ids, mask)
        _assert_close_enough(F.bert_forward_flops(cfg, B, L), xla)

    def test_et_trunk(self):
        cfg = ETConfig()
        model = HAATransformer(cfg)
        B, L, T, C = 2, 24, 5, 512
        args = (jnp.zeros((B, L, cfg.demb)), jnp.zeros((B, 49)),
                jnp.zeros((B, T, C, 49)), jnp.zeros((B, T, 2)),
                jnp.ones((B,), jnp.int32))
        vs = model.init(jax.random.PRNGKey(0), *args)
        xla = _xla_flops(lambda v, *a: model.apply(v, *a), vs, *args)
        _assert_close_enough(
            F.et_trunk_flops(cfg, B, L, T, feat_ch=C), xla)


class TestPipelineCounts:
    def test_eval_vs_train_relationships(self):
        """Structural sanity: train = 3x(bert + 2 rollouts); the one-pass
        trunk saves (T-1) trunk passes; LSTM accepted too."""
        b, d, e = BertConfig.tiny(), DarknetConfig.tiny(), ETConfig(
            demb=128, encoder_heads=4, encoder_layers=1)
        B, T, L = 4, 5, 24
        ev = F.eval_rollout_flops(b, d, e, B, T, L, dialog_len=48,
                                  feat_ch=64)
        ev1 = F.eval_rollout_flops(b, d, e, B, T, L, dialog_len=48,
                                   feat_ch=64, one_pass_trunk=True)
        saved = (T - 1) * F.et_trunk_flops(e, B, L, T, feat_ch=64)
        np.testing.assert_allclose(ev - ev1, saved, rtol=1e-12)
        tr = F.train_step_flops(b, d, e, B, T, L, dialog_len=48, feat_ch=64)
        bert2 = (F.bert_forward_flops(b, B, L)
                 + F.bert_forward_flops(b, B, 48))
        roll = T * (F.darknet_forward_flops(d, B)
                    + F.et_trunk_flops(e, B, L, T, feat_ch=64))
        np.testing.assert_allclose(tr, 3 * (bert2 + 2 * roll), rtol=1e-12)

    def test_lstm_family_counts(self):
        from avdn_tpu.models.lstm import LSTMConfig

        b, d = BertConfig.tiny(), DarknetConfig.tiny()
        l = LSTMConfig(hidden_size=128)
        got = F.eval_rollout_flops(b, d, l, 2, 3, 16, dialog_len=32,
                                   feat_ch=64)
        want = (F.bert_forward_flops(b, 2, 16)
                + F.bert_forward_flops(b, 2, 32)
                + 3 * (F.darknet_forward_flops(d, 2)
                       + F.lstm_step_flops(l, 2, 16, feat_ch=64)))
        np.testing.assert_allclose(got, want, rtol=1e-12)
