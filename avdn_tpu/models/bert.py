"""BERT-base language tower, from scratch in flax.

The reference wraps HuggingFace ``bert-base-uncased`` and fine-tunes it
end-to-end, with a small 768→64→49 ReLU head on the pooler output
(``CustomBERTModel``, src/models/vln_model.py:128-159). Here the full encoder
is implemented natively (no torch at runtime); released HF/torch weights are
imported through ``avdn_tpu.compat.torch_import``.

Returns the same triple the reference returns: token features (B, L, 768),
the 49-d head output (queries the visual spatial attention), and the pooler
vector (B, 768).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from avdn_tpu.models.layers import MLPHead


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    layer_norm_eps: float = 1e-12
    head_dims: tuple = (64, 49)  # the CustomBERTModel extra head
    head_dropout: float = 0.2

    @staticmethod
    def tiny():
        """Small config for tests: same topology, 2 layers, 128 wide."""
        return BertConfig(
            vocab_size=1024, hidden_size=128, num_layers=2, num_heads=4,
            intermediate_size=256, max_position=128,
        )


class BertSelfAttention(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask, deterministic=True):
        c = self.cfg
        D = c.hidden_size
        H = c.num_heads
        hd = D // H
        q = nn.Dense(D, name="query", dtype=self.dtype)(x)
        k = nn.Dense(D, name="key", dtype=self.dtype)(x)
        v = nn.Dense(D, name="value", dtype=self.dtype)(x)
        B, S, _ = x.shape

        def heads(t):
            return t.reshape(B, S, H, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.float32(hd))
        if pad_mask is not None:
            # HF convention: (1 - mask) * -10000-ish additive bias
            bias = jnp.where(pad_mask[:, None, None, :], 0.0, -1e9)
            logits = logits + bias
        probs = jax.nn.softmax(logits, axis=-1)
        probs = nn.Dropout(c.attention_dropout)(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return out.transpose(0, 2, 1, 3).reshape(B, S, D)


class BertLayer(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pad_mask, deterministic=True):
        c = self.cfg
        attn = BertSelfAttention(c, self.dtype, name="attention")(
            x, pad_mask, deterministic
        )
        attn = nn.Dense(c.hidden_size, name="attention_output", dtype=self.dtype)(attn)
        attn = nn.Dropout(c.hidden_dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, name="attention_norm", dtype=self.dtype
        )(x + attn)
        ff = nn.Dense(c.intermediate_size, name="intermediate", dtype=self.dtype)(x)
        ff = jax.nn.gelu(ff, approximate=False)
        ff = nn.Dense(c.hidden_size, name="output", dtype=self.dtype)(ff)
        ff = nn.Dropout(c.hidden_dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(
            epsilon=c.layer_norm_eps, name="output_norm", dtype=self.dtype
        )(x + ff)


class BertLanguageEncoder(nn.Module):
    """BERT encoder + pooler + the reference's 49-d head.

    ``__call__(input_ids (B, L), attention_mask (B, L))`` →
    ``(sequence (B, L, 768), head49 (B, 49), pooled (B, 768))`` — the triple
    of ``CustomBERTModel.forward`` (src/models/vln_model.py:148-159).
    """

    cfg: BertConfig = BertConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, deterministic=True):
        c = self.cfg
        B, L = input_ids.shape
        pos_ids = jnp.arange(L)[None, :]
        x = (
            nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings",
                     dtype=self.dtype)(input_ids)
            + nn.Embed(c.max_position, c.hidden_size, name="position_embeddings",
                       dtype=self.dtype)(pos_ids)
            + nn.Embed(c.type_vocab_size, c.hidden_size, name="token_type_embeddings",
                       dtype=self.dtype)(jnp.zeros_like(input_ids))
        )
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="embeddings_norm",
                         dtype=self.dtype)(x)
        x = nn.Dropout(c.hidden_dropout)(x, deterministic=deterministic)
        pad = attention_mask.astype(bool) if attention_mask is not None else None
        for i in range(c.num_layers):
            x = BertLayer(c, self.dtype, name=f"layer_{i}")(x, pad, deterministic)
        pooled = jnp.tanh(
            nn.Dense(c.hidden_size, name="pooler", dtype=self.dtype)(x[:, 0])
        )
        head49 = MLPHead(
            c.head_dims, dropout=c.head_dropout, relu_last=True,
            name="cls_head", dtype=self.dtype,
        )(pooled, deterministic=deterministic)
        return x, head49, pooled
