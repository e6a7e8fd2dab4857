"""Eval-only fast formulations of the HAA-Transformer trunk.

The flax module (`models/et.py`) re-encodes the FULL padded history every
step — the reference's O(T²) semantics (src/xview_et/agent.py:605-630,
src/models/ET_haa.py:121-184), kept verbatim for the train path where
dropout makes every step's trunk pass genuinely distinct. In deterministic
(eval/serving) mode the trunk's structural masks make most of that work
redundant, and two exact reformulations apply:

1. **Single-pass teacher trunk** (`teacher_onepass`). The attention mask is
   causal over the frame and direction blocks (src/models/model_util.py:
   213-241): the token at step position j attends language plus steps ≤ j.
   Combined with the per-item key padding (``step >= lengths[b]`` masked,
   src/models/enc_vl.py:49-55) the attention support of position j in a
   full-history pass equals its support in the step-t incremental call for
   every t ≥ j:

   * item alive at step t (``lengths_t[b] = t+1``): causality already
     restricts keys to ``s ≤ j ≤ t < lengths``, so neither call's padding
     binds;
   * item ended at step e < t (``lengths_t[b] = e+1`` frozen): both calls
     mask ``s ≥ e+1`` identically (lengths stop growing at the end step).

   By induction over layers every token at position j is therefore
   identical across all calls with t ≥ j, so ONE pass with the final
   lengths produces every step's readout token — the per-step outputs are
   gathers at the reference's batch-max readout positions
   (``max(lengths_t) − 1``, src/models/ET_haa.py:157-158). A T× cut of
   trunk work for the time-fused teacher rollout (rollout/fused.py).

2. **Incremental KV decode** (`make_lang_cache` + `decode_step`). The same
   argument makes every token step-invariant once computed, so the student
   scan can decode autoregressively: language positions attend language
   only (their per-layer keys/values are episode constants, computed once),
   and each step processes ONLY the two new tokens (frame t, direction t)
   against the cached keys/values. Per-step trunk cost drops from
   O((L+2T)²) attention + O(L+2T) token FFN to O(L+2T) attention rows +
   O(1) token FFN. The readout gathers the cached last-layer token at the
   batch-max position (it may lag t once items end — the cache holds every
   previously computed token, frozen exactly like the full call would
   recompute it).

Both formulations are pure functions over the module's parameter pytree —
the flax module stays the single source of truth for training (its dropout
rng paths are untouched) and tests/test_et_fast.py pins equality in eval
mode. Dropout layers are identity in deterministic mode, so they do not
appear here.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import flax.struct

from avdn_tpu.models.et import ETConfig
from avdn_tpu.models.layers import (
    haa_attention_mask,
    saliency_upsample,
    sinusoidal_pos_encoding,
)

_NEG = -jnp.inf


# --------------------------------------------------------------------------
# Primitive ops mirroring the flax modules (deterministic mode)
# --------------------------------------------------------------------------


def _dense(p, x, dtype):
    y = x.astype(dtype) @ p["kernel"].astype(dtype)
    if "bias" in p:
        y = y + p["bias"].astype(dtype)
    return y


def _layernorm(p, x, dtype, eps=1e-5):
    """flax LayerNorm semantics: fast variance, stats in float32."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean2 = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    var = mean2 - jnp.square(mean)
    mul = jax.lax.rsqrt(var + eps) * p["scale"].astype(jnp.float32)
    y = (xf - mean) * mul + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def _softdot_pool(p, h, context, dtype):
    """SoftDotAttention (models/layers.py:19-43): h (B, d) over context
    (B, S, d); returns the pooled tanh output only."""
    target = h.astype(dtype) @ p["linear_in"]["kernel"].astype(dtype)
    attn = jax.nn.softmax(jnp.einsum("bld,bd->bl", context.astype(dtype), target))
    weighted = jnp.einsum("bl,bld->bd", attn, context.astype(dtype))
    out = jnp.concatenate([weighted, h.astype(dtype)], axis=-1) @ p[
        "linear_out"
    ]["kernel"].astype(dtype)
    return jnp.tanh(out)


def _mlp_head(p, x, dtype):
    """MLPHead deterministic forward (dense→relu per hidden, linear last)."""
    n = len(p)
    for i in range(n):
        x = _dense(p[f"dense_{i}"], x, dtype)
        if i != n - 1:
            x = jax.nn.relu(x)
    return x


def _split_heads(x, H):
    B, S, D = x.shape
    return x.reshape(B, S, H, D // H).transpose(0, 2, 1, 3)


def _merge_heads(x):
    B, H, S, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, S, H * hd)


def _attend(q, k, v, bias):
    """Scaled dot-product with the module's NaN guard for fully-masked rows
    (models/layers.py:182-186)."""
    hd = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.float32(hd)).astype(
        q.dtype
    )
    logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1)
    probs = jnp.where(jnp.isnan(probs), 0.0, probs).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _attend_two(q, k1, v1, bias1, k2, v2, bias2):
    """Softmax attention over TWO key/value sources without concatenating
    them: ``softmax([l1; l2])`` decomposes into per-source exponentials
    under a shared max shift, renormalised by the joint sum. Numerically
    equal to ``_attend(q, concat(k1,k2), concat(v1,v2), concat(bias))`` up
    to float reassociation (pinned at 1e-5 by tests/test_et_fast.py), and
    keeps the episode-constant language cache OUT of the scan body — the
    per-step (B, H, L+2T, hd) concat was pure data movement and the reason
    the KV decode measured SLOWER at L=100 (PERF.md 'Eval-trunk
    reformulations'). Fully-masked rows produce joint-sum 0 and output 0,
    matching ``_attend``'s NaN guard."""
    hd = q.shape[-1]
    scale = jnp.sqrt(jnp.float32(hd)).astype(q.dtype)
    l1 = jnp.einsum("bhqd,bhkd->bhqk", q, k1) / scale + bias1
    l2 = jnp.einsum("bhqd,bhkd->bhqk", q, k2) / scale + bias2
    m = jnp.maximum(
        jnp.max(l1, axis=-1, keepdims=True),
        jnp.max(l2, axis=-1, keepdims=True),
    )
    m = jnp.where(jnp.isfinite(m), m, 0.0).astype(q.dtype)
    e1 = jnp.exp(l1 - m)   # -inf bias entries exp to exactly 0
    e2 = jnp.exp(l2 - m)
    # a logit that overflowed to +inf (possible in bf16) on a -inf-masked
    # position yields l = NaN -> e = NaN; zero it like _attend's NaN guard
    # so it cannot poison the joint sum
    e1 = jnp.where(jnp.isnan(e1), 0.0, e1)
    e2 = jnp.where(jnp.isnan(e2), 0.0, e2)
    s = jnp.sum(e1, axis=-1, keepdims=True) + jnp.sum(
        e2, axis=-1, keepdims=True
    )
    o = jnp.einsum("bhqk,bhkd->bhqd", e1, v1) + jnp.einsum(
        "bhqk,bhkd->bhqd", e2, v2
    )
    # s == +inf means an UNMASKED logit overflowed; _attend zeroes such rows
    # (its softmax NaNs out and the guard catches it) — match that here
    return jnp.where((s > 0) & jnp.isfinite(s), o / s, 0.0).astype(q.dtype)


def _layer_forward(p, x, bias, H, dtype):
    """TransformerEncoderLayer deterministic forward (post-LN torch
    semantics, models/layers.py:148-190)."""
    qkv = _dense(p["in_proj"], x, dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    attn = _attend(_split_heads(q, H), _split_heads(k, H), _split_heads(v, H), bias)
    attn = _dense(p["out_proj"], _merge_heads(attn), dtype)
    x = _layernorm(p["norm1"], x + attn, dtype)
    ff = _dense(p["linear2"], jax.nn.relu(_dense(p["linear1"], x, dtype)), dtype)
    return _layernorm(p["norm2"], x + ff, dtype)


def _params(tree):
    return tree["params"] if "params" in tree else tree


def _lang_pad(cfg: ETConfig, lang_mask, B, L):
    if cfg.mask_lang_padding and lang_mask is not None:
        return ~lang_mask.astype(bool)
    return jnp.zeros((B, L), bool)


def _embed_heads(params, cfg: ETConfig, lang, dtype):
    """Positionally-encoded language tokens (models/et.py:88-93 preamble,
    language part) — shared by both formulations."""
    pe = sinusoidal_pos_encoding(cfg.pos_max_len, cfg.demb).astype(dtype)
    scale = (1.0 / jnp.sqrt(jnp.float32(cfg.demb))).astype(dtype)
    L = lang.shape[1]
    lang_pe = lang.astype(dtype) + pe[:L][None] * scale
    return pe, scale, lang_pe


# --------------------------------------------------------------------------
# 1. Single-pass teacher trunk
# --------------------------------------------------------------------------


def teacher_onepass(
    et_vars: Dict[str, Any],
    cfg: ETConfig,
    lang,             # (B, L, D)
    lang_cls,         # (B, 49)
    frames,           # (B, T, C, 49) full unmasked history buffer
    dirs,             # (B, T, 2)
    lengths_steps,    # (T, B) cumulative alive counts per step
    lang_mask=None,   # (B, L)
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All T per-step (action, saliency) outputs from ONE trunk pass.

    Equal (deterministic mode) to vmapping the module over T step-masked
    history views — see the module docstring for the argument; pinned by
    tests/test_et_fast.py. Returns ``action (T, B, 4)`` and
    ``saliency (T, B, hw, hw)``.
    """
    p = _params(et_vars)
    B, T = frames.shape[0], frames.shape[1]
    L = lang.shape[1]

    # ---- embeddings (models/et.py:73-94) ----
    flat_frames = frames.reshape(B * T, frames.shape[2], cfg.spatial_dim)
    flat_query = jnp.repeat(lang_cls, T, axis=0)
    pooled = _softdot_pool(p["vision_attention"], flat_query, flat_frames, dtype)
    emb_frames = _dense(p["frame_proj"], pooled, dtype).reshape(B, T, cfg.demb)
    emb_dirs = _dense(p["direction_embedding"], dirs, dtype)

    pe, scale, lang_pe = _embed_heads(p, cfg, lang, dtype)
    step_pe = pe[L : L + T][None] * scale
    seq = jnp.concatenate(
        [lang_pe, emb_frames + step_pe, emb_dirs + step_pe], axis=1
    )
    seq = _layernorm(p["input_norm"], seq, dtype)

    # ---- masks with the FINAL lengths ----
    lengths_final = lengths_steps[-1]
    attn_mask = haa_attention_mask(L, T, dtype)
    step_pad = jnp.arange(T)[None, :] >= lengths_final[:, None]
    key_pad = jnp.concatenate(
        [_lang_pad(cfg, lang_mask, B, L), step_pad, step_pad], axis=1
    )
    bias = attn_mask[None, None] + jnp.where(key_pad, _NEG, 0.0)[:, None, None, :].astype(dtype)

    for i in range(cfg.encoder_layers):
        seq = _layer_forward(p[f"encoder_layer_{i}"], seq, bias, cfg.encoder_heads, dtype)

    # ---- per-step readouts: batch-max positions (models/et.py:116-119) ----
    m = jnp.max(lengths_steps, axis=1) - 1            # (T,)
    vis_tok = jnp.take(seq, L + m, axis=1)            # (B, T, D)
    dir_tok = jnp.take(seq, L + T + m, axis=1)        # (B, T, D)

    action = _mlp_head(p["action_head"], dir_tok, dtype)          # (B, T, 4)
    sal = jax.nn.relu(_dense(p["saliency_proj"], vis_tok, dtype))  # (B, T, 64)
    saliency = saliency_upsample(
        sal.reshape(B * T, 8, 8).astype(jnp.float32), cfg.saliency_hw
    ).reshape(B, T, cfg.saliency_hw, cfg.saliency_hw)
    return (
        jnp.moveaxis(action, 0, 1),    # (T, B, 4)
        jnp.moveaxis(saliency, 0, 1),  # (T, B, hw, hw)
    )


# --------------------------------------------------------------------------
# 2. Incremental KV decode for the student scan
# --------------------------------------------------------------------------


@flax.struct.dataclass
class ETFastCache:
    """Scan-carried decode state. Language K/V are NOT here — they are
    episode constants captured by the step closure (scan-invariant)."""

    step_k: jnp.ndarray      # (layers, B, H, 2T, hd) keys of step tokens
    step_v: jnp.ndarray      # (layers, B, H, 2T, hd)
    out_frames: jnp.ndarray  # (B, T, D) last-layer frame tokens
    out_dirs: jnp.ndarray    # (B, T, D) last-layer direction tokens


def init_cache(cfg: ETConfig, B: int, T: int, dtype=jnp.float32) -> ETFastCache:
    H = cfg.encoder_heads
    hd = cfg.demb // H
    nl = cfg.encoder_layers
    return ETFastCache(
        step_k=jnp.zeros((nl, B, H, 2 * T, hd), dtype),
        step_v=jnp.zeros((nl, B, H, 2 * T, hd), dtype),
        out_frames=jnp.zeros((B, T, cfg.demb), dtype),
        out_dirs=jnp.zeros((B, T, cfg.demb), dtype),
    )


def make_lang_cache(
    et_vars: Dict[str, Any],
    cfg: ETConfig,
    lang,            # (B, L, D)
    lang_mask=None,
    dtype=jnp.float32,
) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Per-layer language keys/values — episode constants.

    Language queries attend language only (haa_attention_mask), so the
    language token stack is closed: run it once, caching each layer's
    input-token K/V (what step queries attend to).
    """
    p = _params(et_vars)
    B, L = lang.shape[0], lang.shape[1]
    H = cfg.encoder_heads
    _, _, x = _embed_heads(p, cfg, lang, dtype)
    x = _layernorm(p["input_norm"], x, dtype)
    pad = _lang_pad(cfg, lang_mask, B, L)
    bias = jnp.where(pad, _NEG, 0.0)[:, None, None, :].astype(dtype)
    caches = []
    for i in range(cfg.encoder_layers):
        lp = p[f"encoder_layer_{i}"]
        qkv = _dense(lp["in_proj"], x, dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        kh, vh = _split_heads(k, H), _split_heads(v, H)
        caches.append((kh, vh))
        attn = _attend(_split_heads(q, H), kh, vh, bias)
        attn = _dense(lp["out_proj"], _merge_heads(attn), dtype)
        x = _layernorm(lp["norm1"], x + attn, dtype)
        ff = _dense(
            lp["linear2"], jax.nn.relu(_dense(lp["linear1"], x, dtype)), dtype
        )
        x = _layernorm(lp["norm2"], x + ff, dtype)
    return caches


def decode_step(
    et_vars: Dict[str, Any],
    cfg: ETConfig,
    lang_kv: List[Tuple[jnp.ndarray, jnp.ndarray]],
    cache: ETFastCache,
    lang_cls,        # (B, 49)
    feats_t,         # (B, C, 49) darknet features of THIS step's view
    dir_feat_t,      # (B, 2) (sin, cos)
    t,               # scalar step index (traced)
    lengths,         # (B,) cumulative alive counts AFTER this step's update
    lang_mask=None,
    dtype=jnp.float32,
) -> Tuple[ETFastCache, jnp.ndarray, jnp.ndarray]:
    """One incremental trunk step: embed + decode the two new tokens, then
    read out at the batch-max position. Equal to the module's full-history
    call at step t (deterministic mode) — tests/test_et_fast.py.

    Masking note: for a query at position t, the full call's causal mask
    (s ≤ t) plus key padding (s < lengths[b]) collapse to just
    ``s < lengths[b]`` (lengths ≤ t+1 always), which is what we apply here;
    not-yet-written cache slots (s > t) are masked by the same term.
    """
    p = _params(et_vars)
    B = lang_cls.shape[0]
    T = cache.out_frames.shape[1]
    L = lang_kv[0][0].shape[2]
    H = cfg.encoder_heads

    # ---- embed the two new tokens (models/et.py:73-94, single position) ----
    pooled = _softdot_pool(p["vision_attention"], lang_cls, feats_t, dtype)
    f_tok = _dense(p["frame_proj"], pooled, dtype)
    d_tok = _dense(p["direction_embedding"], dir_feat_t, dtype)
    pe = sinusoidal_pos_encoding(cfg.pos_max_len, cfg.demb).astype(dtype)
    scale = (1.0 / jnp.sqrt(jnp.float32(cfg.demb))).astype(dtype)
    pos = pe[L + t] * scale
    x = jnp.stack([f_tok + pos, d_tok + pos], axis=1)  # (B, 2, D)
    x = _layernorm(p["input_norm"], x, dtype)

    # ---- key validity: language + written steps below each item's length ----
    step_valid = jnp.arange(T)[None, :] < lengths[:, None]          # (B, T)
    lang_bias = jnp.where(
        ~_lang_pad(cfg, lang_mask, B, L), 0.0, _NEG
    )[:, None, None, :].astype(dtype)
    step_bias = jnp.where(
        jnp.concatenate([step_valid, step_valid], axis=1), 0.0, _NEG
    )[:, None, None, :].astype(dtype)

    step_k, step_v = cache.step_k, cache.step_v
    for i in range(cfg.encoder_layers):
        lp = p[f"encoder_layer_{i}"]
        qkv = _dense(lp["in_proj"], x, dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        qh, kh, vh = _split_heads(q, H), _split_heads(k, H), _split_heads(v, H)
        # write the new frame/direction K/V at sequence slots t and T+t
        sk = jax.lax.dynamic_update_slice_in_dim(step_k[i], kh[:, :, 0:1], t, axis=2)
        sk = jax.lax.dynamic_update_slice_in_dim(sk, kh[:, :, 1:2], T + t, axis=2)
        sv = jax.lax.dynamic_update_slice_in_dim(step_v[i], vh[:, :, 0:1], t, axis=2)
        sv = jax.lax.dynamic_update_slice_in_dim(sv, vh[:, :, 1:2], T + t, axis=2)
        step_k = step_k.at[i].set(sk)
        step_v = step_v.at[i].set(sv)
        # two-softmax merge: attend the (scan-invariant) language cache and
        # the carried step cache separately — no per-step concat
        attn = _attend_two(qh, lang_kv[i][0], lang_kv[i][1], lang_bias,
                           sk, sv, step_bias)
        attn = _dense(lp["out_proj"], _merge_heads(attn), dtype)
        x = _layernorm(lp["norm1"], x + attn, dtype)
        ff = _dense(
            lp["linear2"], jax.nn.relu(_dense(lp["linear1"], x, dtype)), dtype
        )
        x = _layernorm(lp["norm2"], x + ff, dtype)

    out_frames = jax.lax.dynamic_update_slice_in_dim(
        cache.out_frames, x[:, 0:1], t, axis=1
    )
    out_dirs = jax.lax.dynamic_update_slice_in_dim(
        cache.out_dirs, x[:, 1:2], t, axis=1
    )
    new_cache = ETFastCache(
        step_k=step_k, step_v=step_v, out_frames=out_frames, out_dirs=out_dirs
    )

    # ---- readout at the batch-max valid step (models/et.py:116-119) ----
    m = jnp.max(lengths) - 1
    vis_tok = jnp.take(out_frames, m, axis=1)
    dir_tok = jnp.take(out_dirs, m, axis=1)
    action = _mlp_head(p["action_head"], dir_tok, dtype)
    sal = jax.nn.relu(_dense(p["saliency_proj"], vis_tok, dtype))
    saliency = saliency_upsample(
        sal.reshape(B, 8, 8).astype(jnp.float32), cfg.saliency_hw
    )
    return new_cache, action, saliency
