"""int8 quantized eval tower: parity bounds vs the folded fp32 tower.

The quantizer consumes the BN-folded conv form (models/darknet.py
fold_darknet_params) and replaces each conv with per-channel-int8 weights ×
per-tensor-dynamic-int8 activations (models/darknet_quant.py). These tests
bound the approximation on random weights (a *harder* case than trained
weights, whose activation distributions are tamer) and pin the wiring
through make_eval_rollout. Metric-level equivalence on the fixture dataset
is gated separately in tests/test_render_mode_goldens.py ('twopass_int8').
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from avdn_tpu.models.darknet import Darknet, DarknetConfig, fold_darknet_params
from avdn_tpu.models.darknet_quant import (
    QuantDarknet,
    quant_forward,
    quantize_darknet_params,
)


@pytest.fixture(scope="module")
def folded_tiny():
    cfg = DarknetConfig.tiny()
    dk = Darknet(cfg)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 224, 224, 3))
    variables = dk.init(key, x0, train=True)
    folded = fold_darknet_params(cfg, variables["params"],
                                 variables["batch_stats"])
    return cfg, folded


class TestQuantTowerParity:
    def test_forward_close_to_fp32(self, folded_tiny):
        cfg, folded = folded_tiny
        qp = quantize_darknet_params(cfg, folded)
        # int8 storage really is int8
        for p in qp.values():
            assert p["kernel_q"].dtype == jnp.int8
            assert p["scale"].ndim == 1  # per output channel
        dk_f = Darknet(cfg, folded=True)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 224, 224, 3))
        ref = np.asarray(dk_f.apply({"params": folded}, x, train=False))
        got = np.asarray(quant_forward(cfg, qp, x))
        assert got.shape == ref.shape
        # per-tensor relative error bound: random weights + dynamic
        # activation scales; each conv contributes ~1/2 LSB ≈ 0.4% —
        # compounding stays well under 5% on the tiny tower
        denom = np.maximum(np.abs(ref).max(), 1e-6)
        rel = np.abs(got - ref).max() / denom
        assert rel < 0.05, f"max rel err {rel:.4f}"
        corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
        assert corr > 0.995, corr

    def test_weight_roundtrip_exact_for_pow2(self, folded_tiny):
        # weights that are exact multiples of the scale reconstruct exactly
        cfg, folded = folded_tiny
        name = next(iter(folded))
        k = folded[name]["kernel"]
        # per-output-channel scale, same axes as the quantizer
        scale = jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0
        exact = jnp.round(k / scale) * scale
        qp = quantize_darknet_params(
            cfg, {name: {"kernel": exact, "bias": folded[name]["bias"]}})
        recon = (qp[name]["kernel_q"].astype(jnp.float32)
                 * qp[name]["scale"])
        np.testing.assert_allclose(np.asarray(recon), np.asarray(exact),
                                   rtol=0, atol=1e-5)

    def test_adapter_matches_pure_function(self, folded_tiny):
        cfg, folded = folded_tiny
        qp = quantize_darknet_params(cfg, folded)
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 224, 224, 3))
        a = QuantDarknet(cfg).apply({"params": qp}, x, train=False)
        b = quant_forward(cfg, qp, x)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_train_mode_rejected(self, folded_tiny):
        cfg, folded = folded_tiny
        qp = quantize_darknet_params(cfg, folded)
        with pytest.raises(AssertionError):
            QuantDarknet(cfg).apply({"params": qp},
                                    jnp.zeros((1, 224, 224, 3)), train=True)


class TestEvalRolloutWiring:
    def test_quant_requires_fold(self):
        import dataclasses

        from avdn_tpu.train import TrainConfig
        from avdn_tpu.train.step import make_eval_rollout

        cfg = dataclasses.replace(TrainConfig(), quant="int8",
                                  fold_bn_eval=False)
        with pytest.raises(ValueError, match="fold_bn_eval"):
            make_eval_rollout(cfg, None, Darknet(DarknetConfig.tiny()), None,
                              teacher=False)

    def test_unknown_mode_rejected(self):
        import dataclasses

        from avdn_tpu.train import TrainConfig
        from avdn_tpu.train.step import make_eval_rollout

        cfg = dataclasses.replace(TrainConfig(), quant="fp4")
        with pytest.raises(ValueError, match="fp4"):
            make_eval_rollout(cfg, None, Darknet(DarknetConfig.tiny()), None,
                              teacher=False)

    def test_quant_eval_rollout_runs(self):
        """End-to-end: the student eval rollout with --quant int8 produces
        finite outputs whose actions stay close to the fp32 tower's."""
        import dataclasses

        import __graft_entry__ as g
        from avdn_tpu.train import make_eval_rollout

        world, cfg, (bert, dk, et), state, batch = g._flagship(
            batch_size=2, map_px=256, max_action_len=2, demb=64,
            encoder_layers=1, darknet="tiny", seed=0)
        bank = jnp.asarray(world.map_bank)
        rng = jax.random.PRNGKey(0)
        outs = {}
        for mode in ("none", "int8"):
            ecfg = dataclasses.replace(cfg, quant=mode)
            fn = jax.jit(make_eval_rollout(ecfg, bert, dk, et,
                                           teacher=False))
            outs[mode] = fn(state, bank, batch, rng)
        a_ref = np.asarray(outs["none"].actions_wp)
        a_q = np.asarray(outs["int8"].actions_wp)
        assert np.all(np.isfinite(a_q))
        # same ballpark decisions: the int8 tower feeds the same trunk
        assert np.max(np.abs(a_q - a_ref)) < 0.15, (
            np.max(np.abs(a_q - a_ref)))


def test_activation_quantization_is_batch_invariant(folded_tiny):
    """Per-example activation scales (ADVICE r4): an episode's quantized
    result must not depend on which other episodes share its batch."""
    cfg, folded = folded_tiny
    qp = quantize_darknet_params(cfg, folded)
    x1 = jax.random.normal(jax.random.PRNGKey(3), (1, 224, 224, 3))
    # co-batch with a 100x-hotter image; per-tensor scales would be blown out
    x_hot = 100.0 * jax.random.normal(jax.random.PRNGKey(4), (1, 224, 224, 3))
    solo = np.asarray(quant_forward(cfg, qp, x1))
    batched = np.asarray(quant_forward(
        cfg, qp, jnp.concatenate([x1, x_hot], axis=0)))[:1]
    np.testing.assert_allclose(batched, solo, rtol=1e-5, atol=1e-5)
