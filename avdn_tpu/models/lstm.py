"""HAA-LSTM model family — single-step recurrent cells.

Re-design of ``ViT_LSTM`` and its ablation variants
(src/models/vln_model.py:163-413). The Darknet tower runs *outside* the cell
in this framework (the rollout engine owns it for both model families —
the reference embeds it inside ViT_LSTM only, src/models/vln_model.py:216);
the cell consumes the (B, C, 49) feature map directly.

State layout: ``(h_dir, c_dir, h_vis, c_vis)`` with sizes (192, 192, 576, 576)
matching the reference's two LSTMCells (vln_model.py:184, 187).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from avdn_tpu.models.layers import SoftDotAttention, MLPHead, saliency_upsample

_PI_REF = 3.14159  # reference constant (vln_model.py:229)


class TorchLSTMCell(nn.Module):
    """LSTM cell with torch ``nn.LSTMCell`` parameterisation (two bias
    vectors, gate order i, f, g, o) so released checkpoints import 1:1."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, state):
        h, c = state
        gates = nn.Dense(4 * self.features, name="ih", dtype=self.dtype)(x) + nn.Dense(
            4 * self.features, name="hh", dtype=self.dtype
        )(h)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        new_c = f * c + i * g
        new_h = o * jnp.tanh(new_c)
        return new_h, new_c


@dataclasses.dataclass(frozen=True)
class LSTMConfig:
    hidden_size: int = 768
    spatial_dim: int = 49
    dir_embed: int = 32
    dir_hidden: int = 192
    vis_hidden: int = 576
    saliency_hw: int = 224


def init_lstm_state(batch: int, cfg: LSTMConfig = LSTMConfig(), dtype=jnp.float32):
    return (
        jnp.zeros((batch, cfg.dir_hidden), dtype),
        jnp.zeros((batch, cfg.dir_hidden), dtype),
        jnp.zeros((batch, cfg.vis_hidden), dtype),
        jnp.zeros((batch, cfg.vis_hidden), dtype),
    )


class HAALSTM(nn.Module):
    """Full HAA-LSTM cell (vln_model.py:163-250).

    ``__call__(direction_deg (B,1), im_feature (B,C,49), lang_cls (B,49),
    lang (B,L,768), state)`` → ``(new_state, action (B,4), saliency)``.
    """

    cfg: LSTMConfig = LSTMConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, direction_deg, im_feature, lang_cls, lang, state,
                 deterministic: bool = True):
        c = self.cfg
        h_dir, c_dir, h_vis, c_vis = state

        pooled, _ = SoftDotAttention(c.spatial_dim, name="vision_attention",
                                     dtype=self.dtype)(lang_cls, im_feature)
        dropped = nn.Dropout(0.2)(pooled, deterministic=deterministic)
        h_vis, c_vis = TorchLSTMCell(c.vis_hidden, name="vision_lstm",
                                     dtype=self.dtype)(dropped, (h_vis, c_vis))

        rad = direction_deg / 180.0 * _PI_REF
        dir_feat = jnp.concatenate([jnp.sin(rad), jnp.cos(rad)], axis=-1)
        dir_emb = nn.Dense(c.dir_embed, name="direction_embedding",
                           dtype=self.dtype)(dir_feat)
        h_dir, c_dir = TorchLSTMCell(c.dir_hidden, name="direction_lstm",
                                     dtype=self.dtype)(dir_emb, (h_dir, c_dir))

        joint = jnp.concatenate([h_dir, h_vis], axis=-1)  # (B, 768)
        attended, _ = SoftDotAttention(c.hidden_size, name="lang_attention",
                                       dtype=self.dtype)(joint, lang)
        action = MLPHead((256, 32, 4), dropout=0.2, name="action_head",
                         dtype=self.dtype)(attended, deterministic=deterministic)

        sal = MLPHead((128, 64), dropout=0.2, relu_last=True,
                      name="saliency_head", dtype=self.dtype)(
            pooled, deterministic=deterministic
        )
        saliency = saliency_upsample(sal.reshape(-1, 8, 8), c.saliency_hw)
        return (h_dir, c_dir, h_vis, c_vis), action, saliency


class HAALSTMVisionOnly(nn.Module):
    """Vision-only ablation (vln_model.py:255-343): the spatial-attention
    query comes from the hidden state instead of language, and the action
    reads the joint hidden state directly."""

    cfg: LSTMConfig = LSTMConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, direction_deg, im_feature, state, deterministic=True):
        c = self.cfg
        h_dir, c_dir, h_vis, c_vis = state
        joint0 = jnp.concatenate([h_dir, h_vis], axis=-1)
        query = nn.Dense(c.spatial_dim, name="state_query", dtype=self.dtype)(joint0)
        query = nn.relu(query)
        pooled, _ = SoftDotAttention(c.spatial_dim, name="vision_attention",
                                     dtype=self.dtype)(query, im_feature)
        dropped = nn.Dropout(0.2)(pooled, deterministic=deterministic)
        h_vis, c_vis = TorchLSTMCell(c.vis_hidden, name="vision_lstm",
                                     dtype=self.dtype)(dropped, (h_vis, c_vis))
        rad = direction_deg / 180.0 * _PI_REF
        dir_feat = jnp.concatenate([jnp.sin(rad), jnp.cos(rad)], axis=-1)
        dir_emb = nn.Dense(c.dir_embed, name="direction_embedding",
                           dtype=self.dtype)(dir_feat)
        h_dir, c_dir = TorchLSTMCell(c.dir_hidden, name="direction_lstm",
                                     dtype=self.dtype)(dir_emb, (h_dir, c_dir))
        joint = jnp.concatenate([h_dir, h_vis], axis=-1)
        action = MLPHead((256, 32, 4), dropout=0.2, name="action_head",
                         dtype=self.dtype)(joint, deterministic=deterministic)
        sal = MLPHead((128, 64), dropout=0.2, relu_last=True,
                      name="saliency_head", dtype=self.dtype)(
            pooled, deterministic=deterministic
        )
        saliency = saliency_upsample(sal.reshape(-1, 8, 8), c.saliency_hw)
        return (h_dir, c_dir, h_vis, c_vis), action, saliency


class HAALSTMLangOnly(nn.Module):
    """Language-only ablation (vln_model.py:349-412): a single direction LSTM
    whose hidden state attends over language tokens."""

    cfg: LSTMConfig = LSTMConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, direction_deg, lang, state, deterministic=True):
        c = self.cfg
        h, cc = state
        rad = direction_deg / 180.0 * _PI_REF
        dir_feat = jnp.concatenate([jnp.sin(rad), jnp.cos(rad)], axis=-1)
        dir_emb = nn.Dense(c.dir_embed, name="direction_embedding",
                           dtype=self.dtype)(dir_feat)
        h, cc = TorchLSTMCell(c.hidden_size, name="direction_lstm",
                              dtype=self.dtype)(dir_emb, (h, cc))
        attended, _ = SoftDotAttention(c.hidden_size, name="lang_attention",
                                       dtype=self.dtype)(h, lang)
        action = MLPHead((256, 32, 4), dropout=0.2, name="action_head",
                         dtype=self.dtype)(attended, deterministic=deterministic)
        return (h, cc), action
