"""Model parity tests vs PyTorch.

Each test builds the torch twin of a flax (sub)module, random-initialises it,
imports its weights through ``avdn_tpu.compat.torch_import``, and compares
outputs in eval/deterministic mode. This validates both the architectures and
the checkpoint importers against released reference weights' layouts.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from avdn_tpu.models import (
    BertConfig,
    BertLanguageEncoder,
    DarknetConfig,
    Darknet,
    HAATransformer,
    HAALSTM,
)
from avdn_tpu.models.et import ETConfig
from avdn_tpu.models.lstm import LSTMConfig, init_lstm_state, TorchLSTMCell
from avdn_tpu.models.layers import (
    SoftDotAttention,
    TransformerEncoderLayer,
    saliency_upsample,
    haa_attention_mask,
)
from avdn_tpu.compat import (
    bert_params_from_torch,
    darknet_params_from_torch,
    et_params_from_torch,
    lstm_params_from_torch,
)

torch.manual_seed(0)


def sd_np(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


class TestSaliencyUpsample:
    def test_matches_torch_interpolate(self):
        x = np.random.default_rng(0).normal(size=(2, 8, 8)).astype(np.float32)
        want = F.interpolate(
            torch.from_numpy(x).unsqueeze(1), size=(224, 224), mode="bilinear",
            align_corners=False,
        ).squeeze(1).numpy()
        got = np.asarray(saliency_upsample(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TorchSoftDot(tnn.Module):
    """Minimal torch twin of Luong soft-dot attention for parity testing."""

    def __init__(self, dim):
        super().__init__()
        self.linear_in = tnn.Linear(dim, dim, bias=False)
        self.linear_out = tnn.Linear(dim * 2, dim, bias=False)

    def forward(self, h, ctx):
        scores = torch.bmm(ctx, self.linear_in(h).unsqueeze(2)).squeeze(2)
        w = torch.softmax(scores, dim=1)
        mixed = torch.bmm(w.unsqueeze(1), ctx).squeeze(1)
        return torch.tanh(self.linear_out(torch.cat([mixed, h], 1))), w


class TestSoftDot:
    def test_parity(self):
        dim, B, L = 49, 3, 17
        tm = TorchSoftDot(dim).eval()
        rng = np.random.default_rng(1)
        h = rng.normal(size=(B, dim)).astype(np.float32)
        ctx = rng.normal(size=(B, L, dim)).astype(np.float32)
        with torch.no_grad():
            want, want_w = tm(torch.from_numpy(h), torch.from_numpy(ctx))
        m = SoftDotAttention(dim)
        sd = sd_np(tm)
        params = {
            "params": {
                "linear_in": {"kernel": sd["linear_in.weight"].T},
                "linear_out": {"kernel": sd["linear_out.weight"].T},
            }
        }
        got, got_w = m.apply(params, jnp.asarray(h), jnp.asarray(ctx))
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_w), want_w.numpy(), atol=1e-5)


class TestTransformerLayer:
    def test_parity_with_masks(self):
        d, heads, B = 64, 4, 2
        L, T = 5, 3
        S = L + 2 * T
        tl = tnn.TransformerEncoderLayer(d, heads, dim_feedforward=d, dropout=0.0).eval()
        rng = np.random.default_rng(2)
        x = rng.normal(size=(B, S, d)).astype(np.float32)
        attn_mask = np.asarray(haa_attention_mask(L, T))
        lengths = np.array([3, 2])
        key_pad = np.zeros((B, S), bool)
        for i, l in enumerate(lengths):
            key_pad[i, L + l : L + T] = True
            key_pad[i, L + T + l :] = True
        with torch.no_grad():
            want = tl(
                torch.from_numpy(x).transpose(0, 1),
                torch.from_numpy(attn_mask),
                torch.from_numpy(key_pad),
            ).transpose(0, 1).numpy()
        sd = sd_np(tl)
        params = {
            "params": {
                "in_proj": {"kernel": sd["self_attn.in_proj_weight"].T,
                            "bias": sd["self_attn.in_proj_bias"]},
                "out_proj": {"kernel": sd["self_attn.out_proj.weight"].T,
                             "bias": sd["self_attn.out_proj.bias"]},
                "linear1": {"kernel": sd["linear1.weight"].T, "bias": sd["linear1.bias"]},
                "linear2": {"kernel": sd["linear2.weight"].T, "bias": sd["linear2.bias"]},
                "norm1": {"scale": sd["norm1.weight"], "bias": sd["norm1.bias"]},
                "norm2": {"scale": sd["norm2.weight"], "bias": sd["norm2.bias"]},
            }
        }
        m = TransformerEncoderLayer(d_model=d, num_heads=heads, ff_dim=d, dropout=0.0)
        got = m.apply(
            params, jnp.asarray(x), jnp.asarray(attn_mask), jnp.asarray(key_pad), True
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


class TestLSTMCell:
    def test_parity(self):
        tm = tnn.LSTMCell(49, 576).eval()
        rng = np.random.default_rng(3)
        x = rng.normal(size=(4, 49)).astype(np.float32)
        h = rng.normal(size=(4, 576)).astype(np.float32)
        c = rng.normal(size=(4, 576)).astype(np.float32)
        with torch.no_grad():
            th, tc = tm(torch.from_numpy(x), (torch.from_numpy(h), torch.from_numpy(c)))
        sd = sd_np(tm)
        params = {
            "params": {
                "ih": {"kernel": sd["weight_ih"].T, "bias": sd["bias_ih"]},
                "hh": {"kernel": sd["weight_hh"].T, "bias": sd["bias_hh"]},
            }
        }
        m = TorchLSTMCell(576)
        gh, gc = m.apply(params, jnp.asarray(x), (jnp.asarray(h), jnp.asarray(c)))
        np.testing.assert_allclose(np.asarray(gh), th.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gc), tc.numpy(), atol=1e-5)


class TestBert:
    def test_parity_small(self):
        from transformers import BertModel, BertConfig as HFBertConfig

        hf_cfg = HFBertConfig(
            vocab_size=1024, hidden_size=128, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=256,
            max_position_embeddings=128, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
        tm = BertModel(hf_cfg).eval()
        head = tnn.Sequential(
            tnn.Linear(128, 64), tnn.ReLU(), tnn.Dropout(0.2),
            tnn.Linear(64, 49), tnn.ReLU(),
        ).eval()
        rng = np.random.default_rng(4)
        ids = rng.integers(0, 1024, (2, 11)).astype(np.int32)
        mask = np.ones((2, 11), np.int32)
        mask[1, 8:] = 0
        with torch.no_grad():
            out = tm(torch.from_numpy(ids).long(), attention_mask=torch.from_numpy(mask).long())
            want_seq = out.last_hidden_state.numpy()
            want_pool = out.pooler_output.numpy()
            want_head = head(out.pooler_output).numpy()

        sd = {("bert." + k): v.detach().numpy() for k, v in tm.state_dict().items()}
        for k, v in head.state_dict().items():
            sd["linears." + k] = v.detach().numpy()
        cfg = BertConfig.tiny()
        params = bert_params_from_torch(sd, num_layers=2)
        m = BertLanguageEncoder(cfg)
        seq, head49, pooled = m.apply(params, jnp.asarray(ids), jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(seq), want_seq, atol=2e-4)
        np.testing.assert_allclose(np.asarray(pooled), want_pool, atol=2e-4)
        np.testing.assert_allclose(np.asarray(head49), want_head, atol=2e-4)


def build_torch_darknet(block_dicts):
    """Generic torch builder for darknet cfg blocks (test harness)."""
    mods = tnn.ModuleList()
    out_ch = [int(block_dicts[0]["channels"])]
    for i, b in enumerate(block_dicts[1:]):
        seq = tnn.Sequential()
        if b["type"] == "convolutional":
            bn = int(b.get("batch_normalize", "0"))
            f = int(b["filters"])
            k = int(b["size"])
            pad = (k - 1) // 2 if int(b["pad"]) else 0
            seq.add_module(f"conv_{i}", tnn.Conv2d(out_ch[-1], f, k,
                                                   int(b["stride"]), pad, bias=not bn))
            if bn:
                seq.add_module(f"batch_norm_{i}", tnn.BatchNorm2d(f))
            if b.get("activation") == "leaky":
                seq.add_module(f"leaky_{i}", tnn.LeakyReLU())
            ch = f
        elif b["type"] == "shortcut":
            ch = out_ch[int(b["from"])]
            seq.add_module(f"shortcut_{i}", tnn.Identity())
        elif b["type"] == "route":
            ch = sum(out_ch[int(x)] for x in b["layers"].split(","))
            seq.add_module(f"route_{i}", tnn.Identity())
        else:
            raise ValueError(b["type"])
        mods.append(seq)
        out_ch.append(ch)
    return mods


def torch_darknet_forward(mods, block_dicts, x):
    outs = []
    for i, b in enumerate(block_dicts[1:]):
        if b["type"] == "convolutional":
            x = mods[i](x)
        elif b["type"] == "shortcut":
            x = outs[-1] + outs[int(b["from"])]
        elif b["type"] == "route":
            x = torch.cat([outs[int(v)] for v in b["layers"].split(",")], 1)
        outs.append(x)
    return x


ROUTE_CFG = """
[net]
channels=3
height=224
width=224

[convolutional]
batch_normalize=1
filters=16
size=3
stride=8
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=0
filters=16
size=1
stride=1
pad=1
activation=linear

[route]
layers=-1,-2

[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=leaky
"""


class TestDarknetRoute:
    def test_route_concat_parity(self):
        from avdn_tpu.models.darknet import DarknetConfig as DC

        cfg = DC.from_text(ROUTE_CFG)
        blocks = cfg.block_dicts()
        tmods = build_torch_darknet(blocks)
        tmods.eval()
        rng = np.random.default_rng(9)
        x = rng.normal(size=(2, 3, 224, 224)).astype(np.float32)
        with torch.no_grad():
            want = torch_darknet_forward(tmods, blocks, torch.from_numpy(x))
            want = want.reshape(2, want.shape[1], -1).numpy()
        sd = {f"module_list.{k}": v.detach().numpy()
              for k, v in tmods.state_dict().items()}
        variables = darknet_params_from_torch(sd, blocks)
        got = Darknet(cfg).apply(
            variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

    def test_upsample_nearest(self):
        from avdn_tpu.models.darknet import DarknetConfig as DC

        txt = """
[net]
channels=3
height=224
width=224

[convolutional]
batch_normalize=0
filters=8
size=1
stride=2
pad=1
activation=linear

[upsample]
stride=2
"""
        cfg = DC.from_text(txt)
        m = Darknet(cfg)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), train=False)
        out = m.apply(v, jnp.ones((1, 8, 8, 3)), train=False)
        assert out.shape == (1, 8, 64)  # back to 8x8 after stride-2 + x2 up


class TestDarknet:
    def test_parity_tiny_cfg(self):
        cfg = DarknetConfig.tiny()
        blocks = cfg.block_dicts()
        tmods = build_torch_darknet(blocks)
        tmods.eval()
        # randomise BN stats so eval-mode normalisation is non-trivial
        with torch.no_grad():
            for m in tmods.modules():
                if isinstance(m, tnn.BatchNorm2d):
                    m.running_mean.uniform_(-0.5, 0.5)
                    m.running_var.uniform_(0.5, 1.5)
        rng = np.random.default_rng(5)
        x = rng.normal(size=(2, 3, 224, 224)).astype(np.float32)
        with torch.no_grad():
            want = torch_darknet_forward(tmods, blocks, torch.from_numpy(x))
            want = want.reshape(2, want.shape[1], -1).numpy()
        sd = {f"module_list.{k}": v.detach().numpy()
              for k, v in tmods.state_dict().items()}
        variables = darknet_params_from_torch(sd, blocks)
        m = Darknet(cfg)
        got = m.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


class TestETForward:
    def test_shapes_and_determinism(self):
        cfg = ETConfig(demb=64, encoder_heads=4, encoder_layers=2, spatial_dim=49)
        m = HAATransformer(cfg)
        rng = np.random.default_rng(6)
        B, L, T, C = 2, 7, 5, 32
        lang = rng.normal(size=(B, L, 64)).astype(np.float32)
        cls49 = rng.normal(size=(B, 49)).astype(np.float32)
        frames = rng.normal(size=(B, T, C, 49)).astype(np.float32)
        dirs = rng.normal(size=(B, T, 2)).astype(np.float32)
        lengths = np.array([3, 5], np.int32)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(lang), jnp.asarray(cls49),
                        jnp.asarray(frames), jnp.asarray(dirs), jnp.asarray(lengths))
        act, sal = m.apply(params, jnp.asarray(lang), jnp.asarray(cls49),
                           jnp.asarray(frames), jnp.asarray(dirs), jnp.asarray(lengths))
        assert act.shape == (B, 4)
        assert sal.shape == (B, 224, 224)
        assert np.all(np.isfinite(np.asarray(act)))

    def test_padding_invariance(self):
        """Extending the padded horizon must not change outputs for the same
        valid history (guards the scan-with-static-T design)."""
        cfg = ETConfig(demb=64, encoder_heads=4, encoder_layers=1)
        m = HAATransformer(cfg)
        rng = np.random.default_rng(7)
        B, L, C = 2, 6, 16
        lang = rng.normal(size=(B, L, 64)).astype(np.float32)
        cls49 = rng.normal(size=(B, 49)).astype(np.float32)
        lengths = np.array([2, 2], np.int32)
        frames3 = rng.normal(size=(B, 3, C, 49)).astype(np.float32)
        dirs3 = rng.normal(size=(B, 3, 2)).astype(np.float32)
        frames6 = np.concatenate([frames3, rng.normal(size=(B, 3, C, 49)).astype(np.float32)], 1)
        dirs6 = np.concatenate([dirs3, rng.normal(size=(B, 3, 2)).astype(np.float32)], 1)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(lang), jnp.asarray(cls49),
                        jnp.asarray(frames3), jnp.asarray(dirs3), jnp.asarray(lengths))
        a3, s3 = m.apply(params, jnp.asarray(lang), jnp.asarray(cls49),
                         jnp.asarray(frames3), jnp.asarray(dirs3), jnp.asarray(lengths))
        a6, s6 = m.apply(params, jnp.asarray(lang), jnp.asarray(cls49),
                         jnp.asarray(frames6), jnp.asarray(dirs6), jnp.asarray(lengths))
        np.testing.assert_allclose(np.asarray(a3), np.asarray(a6), atol=1e-5)
        np.testing.assert_allclose(np.asarray(s3), np.asarray(s6), atol=1e-5)


class TestHAALSTMForward:
    def test_step_and_state(self):
        cfg = LSTMConfig()
        m = HAALSTM(cfg)
        rng = np.random.default_rng(8)
        B, L = 2, 9
        d = rng.uniform(0, 360, (B, 1)).astype(np.float32)
        feat = rng.normal(size=(B, 512, 49)).astype(np.float32)
        cls49 = rng.normal(size=(B, 49)).astype(np.float32)
        lang = rng.normal(size=(B, L, 768)).astype(np.float32)
        state = init_lstm_state(B)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(d), jnp.asarray(feat),
                        jnp.asarray(cls49), jnp.asarray(lang), state)
        new_state, act, sal = m.apply(params, jnp.asarray(d), jnp.asarray(feat),
                                      jnp.asarray(cls49), jnp.asarray(lang), state)
        assert act.shape == (B, 4)
        assert sal.shape == (B, 224, 224)
        assert all(s.shape == ref.shape for s, ref in zip(new_state, state))
        # state actually evolves
        assert not np.allclose(np.asarray(new_state[0]), 0.0)
