"""HAA-Transformer ("ET") — the flagship episodic-transformer model family.

Re-design of the reference ET (src/models/ET_haa.py:77-184) + EncoderVL
trunk (src/models/enc_vl.py:8-83) as one fixed-shape flax module:

* history is padded to a static ``max_steps`` (lax.scan friendly) instead of
  growing python-side each step;
* the per-step language-conditioned spatial attention over Darknet features
  is vectorised over time (the reference loops in python,
  src/models/ET_haa.py:139-142);
* readout positions follow the reference exactly: the *visual* token at the
  last valid step feeds the saliency head and the *direction* token at the
  last valid step feeds the action head (src/models/ET_haa.py:157-167).

Outputs: action (B, 4) = (Δx ratio, Δy ratio, altitude, progress) and
saliency (B, 224, 224).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from avdn_tpu.models.layers import (
    SoftDotAttention,
    MLPHead,
    TransformerEncoderLayer,
    sinusoidal_pos_encoding,
    add_haa_pos_encoding,
    haa_attention_mask,
    saliency_upsample,
)


@dataclasses.dataclass(frozen=True)
class ETConfig:
    demb: int = 768
    encoder_heads: int = 12
    encoder_layers: int = 2
    dropout_transformer: float = 0.1
    dropout_emb: float = 0.0
    spatial_dim: int = 49  # 7x7 darknet grid
    pos_max_len: int = 1250
    saliency_hw: int = 224
    mask_lang_padding: bool = False
    # ^ the reference never masks language padding in the trunk
    #   (src/models/enc_vl.py:49-55 masks only frames/directions); flip on
    #   for better behaviour with static-shape padding (documented deviation).


class HAATransformer(nn.Module):
    cfg: ETConfig = ETConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        lang,          # (B, L, demb) BERT token features
        lang_cls,      # (B, 49) BERT 49-d head (spatial attention query)
        frames,        # (B, T, C, 49) darknet features, channel-major
        directions,    # (B, T, 2) (sin, cos) headings
        lengths,       # (B,) valid history length per item (>= 1)
        lang_mask=None,  # (B, L) True for valid language tokens
        deterministic: bool = True,
    ):
        c = self.cfg
        B, T = frames.shape[0], frames.shape[1]
        L = lang.shape[1]

        # ---- language-conditioned spatial pooling of each history frame ----
        vis_attn = SoftDotAttention(c.spatial_dim, name="vision_attention",
                                    dtype=self.dtype)
        flat_frames = frames.reshape(B * T, frames.shape[2], c.spatial_dim)
        flat_query = jnp.repeat(lang_cls, T, axis=0)
        pooled, _ = vis_attn(flat_query, flat_frames)  # (B*T, 49)
        emb_frames = nn.Dense(c.demb, name="frame_proj", dtype=self.dtype)(
            pooled
        ).reshape(B, T, c.demb)

        emb_dirs = nn.Dense(c.demb, name="direction_embedding", dtype=self.dtype)(
            directions
        )

        # ---- positional encoding + trunk input ----
        pe = sinusoidal_pos_encoding(c.pos_max_len, c.demb).astype(self.dtype)
        lang_pe, emb_frames, emb_dirs = add_haa_pos_encoding(
            lang, emb_frames, emb_dirs, pe
        )
        seq = jnp.concatenate([lang_pe, emb_frames, emb_dirs], axis=1)
        seq = nn.LayerNorm(epsilon=1e-5, name="input_norm", dtype=self.dtype)(seq)
        seq = nn.Dropout(c.dropout_emb)(seq, deterministic=deterministic)

        # ---- masks ----
        attn_mask = haa_attention_mask(L, T, self.dtype)
        step_idx = jnp.arange(T)[None, :]
        step_pad = step_idx >= lengths[:, None]  # True = padded step
        if c.mask_lang_padding and lang_mask is not None:
            lang_pad = ~lang_mask.astype(bool)
        else:
            lang_pad = jnp.zeros((B, L), bool)
        key_pad = jnp.concatenate([lang_pad, step_pad, step_pad], axis=1)

        for i in range(c.encoder_layers):
            seq = TransformerEncoderLayer(
                d_model=c.demb,
                num_heads=c.encoder_heads,
                ff_dim=c.demb,
                dropout=c.dropout_transformer,
                name=f"encoder_layer_{i}",
                dtype=self.dtype,
            )(seq, attn_mask, key_pad, deterministic)

        # ---- readout at the batch-max valid step (ET_haa.py:157-158) ----
        max_len = jnp.max(lengths)
        vis_tok = jnp.take(seq, L + max_len - 1, axis=1)
        dir_tok = jnp.take(seq, L + T + max_len - 1, axis=1)

        action = MLPHead((256, 32, 4), dropout=0.2, name="action_head",
                         dtype=self.dtype)(dir_tok, deterministic=deterministic)

        sal = nn.Dense(64, name="saliency_proj", dtype=self.dtype)(vis_tok)
        sal = nn.Dropout(0.2)(sal, deterministic=deterministic)
        sal = nn.relu(sal)
        saliency = saliency_upsample(sal.reshape(B, 8, 8), c.saliency_hw)
        return action, saliency
