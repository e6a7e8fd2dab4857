"""End-to-end parity vs the ACTUAL reference torch modules.

Unlike tests/test_models.py (which checks sublayers against hand-written
torch twins), these tests import /root/reference/src/models directly,
random-init the real ``ET`` (ET_haa.py:77-184), ``ViT_LSTM``
(vln_model.py:163-250), and ``CustomBERTModel`` (vln_model.py:128-159),
push their ``state_dict()`` through ``avdn_tpu.compat.torch_import``, and
assert full-forward agreement ≤1e-4 on fixed inputs — the strongest
checkpoint-layout evidence obtainable without the released weights.
"""

import argparse
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from avdn_tpu.compat.torch_import import (
    bert_params_from_torch,
    darknet_params_from_torch,
    et_params_from_torch,
    lstm_params_from_torch,
)
from avdn_tpu.models import (
    BertConfig,
    BertLanguageEncoder,
    Darknet,
    DarknetConfig,
    HAATransformer,
)
from avdn_tpu.models.et import ETConfig
from avdn_tpu.models.lstm import HAALSTM, init_lstm_state

from reference_loader import load_reference_models, torch_state_dict_to_numpy


def _ref_args(**kw):
    """Reference parser defaults relevant to the models
    (src/xview_et/parser.py:44-51)."""
    ns = argparse.Namespace(
        demb=768, encoder_heads=12, encoder_layers=2,
        dropout_transformer_encoder=0.1, num_input_actions=1, dropout_emb=0.0,
    )
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


@pytest.fixture(scope="module")
def ref():
    return load_reference_models()


class TestCustomBERTParity:
    """CustomBERTModel (HF bert-base layout + 768→64→49 head) vs
    BertLanguageEncoder through bert_params_from_torch."""

    def test_full_forward(self, ref):
        from transformers import BertConfig as HFBertConfig
        from transformers import BertModel

        torch.manual_seed(0)
        hf_cfg = HFBertConfig(attn_implementation="eager")  # bert-base-uncased
        bert_backbone = BertModel(hf_cfg)

        # Build the real CustomBERTModel class without the hub download:
        # AutoModel.from_pretrained('bert-base-uncased') → our random-init
        # backbone with the identical architecture/state_dict layout.
        orig = ref.vln.AutoModel.from_pretrained
        ref.vln.AutoModel.from_pretrained = staticmethod(lambda *a, **k: bert_backbone)
        try:
            model = ref.vln.CustomBERTModel()
        finally:
            ref.vln.AutoModel.from_pretrained = orig
        model.eval()

        B, L = 3, 24
        rng = np.random.default_rng(1)
        ids = rng.integers(0, hf_cfg.vocab_size, (B, L)).astype(np.int64)
        lens = np.array([24, 9, 17])
        mask = (np.arange(L)[None, :] < lens[:, None]).astype(np.int64)

        with torch.no_grad():
            seq_t, head_t, pooled_t = model(
                torch.from_numpy(ids), torch.from_numpy(mask)
            )

        sd = torch_state_dict_to_numpy(model)
        variables = bert_params_from_torch(sd, num_layers=hf_cfg.num_hidden_layers)
        ours = BertLanguageEncoder(BertConfig())
        seq_j, head_j, pooled_j = ours.apply(
            variables, jnp.asarray(ids), jnp.asarray(mask), deterministic=True
        )

        np.testing.assert_allclose(
            np.asarray(seq_j), seq_t.numpy(), atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(pooled_j), pooled_t.numpy(), atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(head_j), head_t.numpy(), atol=1e-4, rtol=1e-4
        )


class TestETParity:
    """The real ET (ET_haa.py:77-184) vs HAATransformer via
    et_params_from_torch: ragged lenths, two-layer trunk, both readout heads
    and the 8×8→224 saliency path."""

    def test_full_forward_ragged(self, ref):
        torch.manual_seed(2)
        args = _ref_args()
        model = ref.et.ET(args)
        model.eval()

        B, L, C = 3, 11, 512
        lenths = np.array([1, 3, 2])
        T = int(lenths.max())  # the reference history buffer is always (B, max(lenths), ...)
        rng = np.random.default_rng(3)
        lang = rng.standard_normal((B, L, 768)).astype(np.float32)
        lang_cls = rng.standard_normal((B, 49)).astype(np.float32)
        frames = rng.standard_normal((B, T, C, 49)).astype(np.float32)
        directions = rng.standard_normal((B, T, 2)).astype(np.float32)

        with torch.no_grad():
            out_t, sal_t = model(
                lang=torch.from_numpy(lang),
                lang_cls=torch.from_numpy(lang_cls),
                frames=torch.from_numpy(frames),
                directions=torch.from_numpy(directions),
                lenths=lenths,
            )

        variables = et_params_from_torch(torch_state_dict_to_numpy(model))
        ours = HAATransformer(ETConfig())
        act_j, sal_j = ours.apply(
            variables,
            jnp.asarray(lang), jnp.asarray(lang_cls), jnp.asarray(frames),
            jnp.asarray(directions), jnp.asarray(lenths, jnp.int32),
            deterministic=True,
        )

        np.testing.assert_allclose(
            np.asarray(act_j), out_t.numpy(), atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(sal_j), sal_t.numpy()[:, 0], atol=1e-4, rtol=1e-4
        )

    def test_full_forward_uniform_lengths(self, ref):
        """All items at max history (the late-rollout regime)."""
        torch.manual_seed(4)
        model = ref.et.ET(_ref_args())
        model.eval()
        B, L, C, T = 2, 7, 512, 4
        lenths = np.array([4, 4])
        rng = np.random.default_rng(5)
        lang = rng.standard_normal((B, L, 768)).astype(np.float32)
        lang_cls = rng.standard_normal((B, 49)).astype(np.float32)
        frames = rng.standard_normal((B, T, C, 49)).astype(np.float32)
        directions = rng.standard_normal((B, T, 2)).astype(np.float32)
        with torch.no_grad():
            out_t, sal_t = model(
                lang=torch.from_numpy(lang), lang_cls=torch.from_numpy(lang_cls),
                frames=torch.from_numpy(frames),
                directions=torch.from_numpy(directions), lenths=lenths,
            )
        variables = et_params_from_torch(torch_state_dict_to_numpy(model))
        act_j, sal_j = HAATransformer(ETConfig()).apply(
            variables, jnp.asarray(lang), jnp.asarray(lang_cls),
            jnp.asarray(frames), jnp.asarray(directions),
            jnp.asarray(lenths, jnp.int32), deterministic=True,
        )
        np.testing.assert_allclose(np.asarray(act_j), out_t.numpy(),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(sal_j), sal_t.numpy()[:, 0],
                                   atol=1e-4, rtol=1e-4)


class TestViTLSTMParity:
    """The real ViT_LSTM (vln_model.py:163-250) — including its embedded
    reference Darknet — vs our Darknet + HAALSTM, threaded over two steps."""

    def test_two_steps(self, ref, tmp_path):
        torch.manual_seed(6)
        cfg = DarknetConfig.tiny()
        cfg_path = tmp_path / "tiny.cfg"
        cfg_path.write_text(_blocks_to_cfg_text(cfg.block_dicts()))

        ref_dk = ref.darknet.Darknet(str(cfg_path), img_size=224)
        model = ref.vln.ViT_LSTM(_ref_args(), ref_dk)
        model.eval()

        B, L = 2, 9
        rng = np.random.default_rng(7)
        images = rng.standard_normal((B, 3, 224, 224)).astype(np.float32)
        cls_hidden = rng.standard_normal((B, 49)).astype(np.float32)
        lang = rng.standard_normal((B, L, 768)).astype(np.float32)
        dir1 = rng.uniform(0, 360, (B, 1)).astype(np.float32)
        dir2 = rng.uniform(0, 360, (B, 1)).astype(np.float32)

        with torch.no_grad():
            h1, c1, hh1, cc1, out1_t, sal1_t = model(
                torch.from_numpy(dir1), torch.from_numpy(images), None,
                torch.from_numpy(cls_hidden), torch.from_numpy(lang),
            )
            h2, c2, hh2, cc2, out2_t, sal2_t = model(
                torch.from_numpy(dir2), torch.from_numpy(images), None,
                torch.from_numpy(cls_hidden), torch.from_numpy(lang),
                h_0=h1, c_0=c1, hh_0=hh1, cc_0=cc1,
            )

        dk_vars = darknet_params_from_torch(
            torch_state_dict_to_numpy(model, strip_prefix="vision_model."),
            cfg.block_dicts(),
        )
        lstm_vars = lstm_params_from_torch(torch_state_dict_to_numpy(model))

        dk = Darknet(cfg)
        feats = dk.apply(
            dk_vars, jnp.asarray(images.transpose(0, 2, 3, 1)), train=False
        )
        cell = HAALSTM()
        state = init_lstm_state(B)
        state, act1_j, sal1_j = cell.apply(
            lstm_vars, jnp.asarray(dir1), feats, jnp.asarray(cls_hidden),
            jnp.asarray(lang), state, deterministic=True,
        )
        np.testing.assert_allclose(np.asarray(state[0]), h1.numpy(),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(state[2]), hh1.numpy(),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(act1_j), out1_t.numpy(),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(sal1_j), sal1_t.numpy()[:, 0],
                                   atol=1e-4, rtol=1e-4)

        state, act2_j, sal2_j = cell.apply(
            lstm_vars, jnp.asarray(dir2), feats, jnp.asarray(cls_hidden),
            jnp.asarray(lang), state, deterministic=True,
        )
        np.testing.assert_allclose(np.asarray(state[1]), c2.numpy(),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(state[3]), cc2.numpy(),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(act2_j), out2_t.numpy(),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(sal2_j), sal2_t.numpy()[:, 0],
                                   atol=1e-4, rtol=1e-4)


def _blocks_to_cfg_text(block_dicts):
    """Serialize parsed cfg blocks back to darknet cfg text (so the reference
    parser, which only reads files, can consume our generated configs)."""
    lines = []
    for b in block_dicts:
        b = dict(b)
        lines.append(f"[{b.pop('type')}]")
        lines.extend(f"{k}={v}" for k, v in b.items())
        lines.append("")
    return "\n".join(lines)
