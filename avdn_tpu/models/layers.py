"""Shared model layers for the HAA model families.

Flax re-designs of the building blocks the reference models share:
SoftDotAttention (src/models/vln_model.py:12-47), the sinusoidal positional
encoding (src/models/encodings.py:7-49), the structural attention mask
(src/models/model_util.py:204-241), and the 4-way action-readout MLP used by
both model families.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


class SoftDotAttention(nn.Module):
    """Luong-style soft dot attention.

    ``h`` (B, dim) attends over ``context`` (B, L, dim):
    ``attn = softmax(context · W_in h)``;
    output ``tanh(W_out [attn·context ; h])`` plus the attention weights.
    Matches the reference module (src/models/vln_model.py:12-47): both
    projections are bias-free.
    """

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, context, mask=None):
        target = nn.Dense(self.dim, use_bias=False, name="linear_in", dtype=self.dtype)(h)
        attn = jnp.einsum("bld,bd->bl", context, target)
        if mask is not None:
            attn = jnp.where(mask, -jnp.inf, attn)
        attn = jax.nn.softmax(attn, axis=-1)
        weighted = jnp.einsum("bl,bld->bd", attn, context)
        out = nn.Dense(
            self.dim, use_bias=False, name="linear_out", dtype=self.dtype
        )(jnp.concatenate([weighted, h], axis=-1))
        return jnp.tanh(out), attn


class MLPHead(nn.Module):
    """ReLU/Dropout MLP head, e.g. the action decoder 768→256→32→4
    (src/models/ET_haa.py:98-108) or the BERT 768→64→49 head
    (src/models/vln_model.py:140-146).

    ``relu_last`` appends a final ReLU (the BERT head has one, the action
    decoder does not).
    """

    features: Sequence[int]
    dropout: float = 0.2
    relu_last: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        n = len(self.features)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, name=f"dense_{i}", dtype=self.dtype)(x)
            last = i == n - 1
            if not last:
                x = nn.relu(x)
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
            elif self.relu_last:
                x = nn.relu(x)
        return x


def sinusoidal_pos_encoding(max_len: int, d_model: int) -> jnp.ndarray:
    """Standard transformer sinusoidal table (max_len, d_model)
    (src/models/encodings.py:12-20)."""
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-jnp.log(10000.0) / d_model)
    )
    ang = position * div
    pe = jnp.zeros((max_len, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(ang))
    pe = pe.at[:, 1::2].set(jnp.cos(ang))
    return pe


def add_haa_pos_encoding(emb_lang, emb_frames, emb_directions, pe):
    """Add the (1/√d scaled) positional encoding with the reference's index
    scheme: language gets positions [0, L); frames AND directions share
    positions [L, L+T) (src/models/encodings.py:22-49)."""
    d = emb_lang.shape[-1]
    L = emb_lang.shape[1]
    T = emb_frames.shape[1]
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    lang = emb_lang + pe[:L][None] * scale
    step_pe = pe[L : L + T][None] * scale
    return lang, emb_frames + step_pe, emb_directions + step_pe


def haa_attention_mask(len_lang: int, len_steps: int, dtype=jnp.float32) -> jnp.ndarray:
    """Structural attention mask (additive, -inf blocked) for the
    [lang | frames | directions] sequence (src/models/model_util.py:213-241):

    * language attends only to language;
    * frames/directions attend to ALL language plus causally (<= t) to both
      frames and directions.
    Shape: (L + 2T, L + 2T).
    """
    L, T = len_lang, len_steps
    neg = jnp.float32(-jnp.inf)
    total = L + 2 * T
    i = jnp.arange(total)[:, None]
    j = jnp.arange(total)[None, :]
    is_lang_q = i < L
    is_lang_k = j < L
    # step index of a key/query position (frames and directions share clocks)
    q_step = jnp.where(i < L + T, i - L, i - L - T)
    k_step = jnp.where(j < L + T, j - L, j - L - T)
    lang_row_ok = is_lang_k  # lang → lang only
    step_row_ok = is_lang_k | (k_step <= q_step)  # causal over both blocks
    ok = jnp.where(is_lang_q, lang_row_ok, step_row_ok)
    return jnp.where(ok, jnp.float32(0), neg).astype(dtype)


def saliency_upsample(x8: jnp.ndarray, out_hw: int = 224) -> jnp.ndarray:
    """(B, 8, 8) → (B, out, out) bilinear upsample with half-pixel centers
    (torch ``interpolate(..., align_corners=False)`` semantics,
    src/models/ET_haa.py:166-167)."""
    b = x8.shape[0]
    return jax.image.resize(x8, (b, out_hw, out_hw), method="bilinear")


class TransformerEncoderLayer(nn.Module):
    """Post-LN transformer encoder layer with torch
    ``nn.TransformerEncoderLayer`` semantics (the reference trunk,
    src/models/enc_vl.py:16-22): MHA → dropout → add → LN, then
    FF(relu) → dropout → add → LN. ``ff_dim`` equals ``d_model`` in the
    reference configuration.
    """

    d_model: int
    num_heads: int
    ff_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None, key_pad_mask=None, deterministic=True):
        # attn_mask: (S, S) additive; key_pad_mask: (B, S) True=masked
        bias = jnp.zeros((1, 1, x.shape[1], x.shape[1]), self.dtype)
        if attn_mask is not None:
            bias = bias + attn_mask[None, None]
        if key_pad_mask is not None:
            bias = bias + jnp.where(key_pad_mask, -jnp.inf, 0.0)[:, None, None, :]
        attn_out = self._mha(x, bias, deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=self.dtype)(
            x + nn.Dropout(self.dropout)(attn_out, deterministic=deterministic)
        )
        ff = nn.Dense(self.ff_dim, name="linear1", dtype=self.dtype)(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        ff = nn.Dense(self.d_model, name="linear2", dtype=self.dtype)(ff)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=self.dtype)(
            x + nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        )
        return x

    def _mha(self, x, bias, deterministic):
        """Explicit MHA so the parameter layout maps 1:1 onto torch's
        in_proj/out_proj for checkpoint import."""
        B, S, D = x.shape
        H = self.num_heads
        hd = D // H
        qkv = nn.Dense(3 * D, name="in_proj", dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, S, H, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.float32(hd))
        logits = logits + bias
        # guard fully-masked rows (all -inf) against NaN softmax
        probs = jax.nn.softmax(logits, axis=-1)
        probs = jnp.where(jnp.isnan(probs), 0.0, probs)
        probs = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, D)
        return nn.Dense(D, name="out_proj", dtype=self.dtype)(out)
