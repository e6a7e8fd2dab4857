"""PyTorch checkpoint → flax parameter importers.

Converts the reference's released weights into this framework's parameter
trees:

* ``best.pt`` — Darknet vision tower (loaded with key filtering in the
  reference, src/xview_et/agent.py:136-141),
* ``best_val_unseen`` — the 3-submodel agent checkpoint
  ``{lang_model, vision_model, vln_model}`` each with
  ``{epoch, state_dict, optimizer}`` (src/xview_et/agent.py:899-916).

All functions accept plain ``{name: np.ndarray}`` dicts so torch is only
required to *read* ``.pt`` files (``load_reference_checkpoint``), never at
model runtime.
"""

from __future__ import annotations

from typing import Dict, Any

import numpy as np
import jax.numpy as jnp


def _t(w):  # torch Linear weight (out, in) -> flax kernel (in, out)
    return jnp.asarray(np.asarray(w).T)


def _a(w):
    return jnp.asarray(np.asarray(w))


def _conv(w):  # torch OIHW -> flax HWIO
    return jnp.asarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def load_reference_checkpoint(path: str) -> Dict[str, Any]:
    """Read a torch ``.pt``/checkpoint file into numpy dicts (host-side)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)

    def to_np(obj):
        if isinstance(obj, dict):
            return {k: to_np(v) for k, v in obj.items()}
        if hasattr(obj, "detach"):
            return obj.detach().cpu().numpy()
        return obj

    return to_np(blob)


# ---------------------------------------------------------------- BERT ----


def bert_params_from_torch(sd: Dict[str, np.ndarray], num_layers: int = 12):
    """Map a ``CustomBERTModel`` state_dict (HF ``bert.*`` + ``linears.*``
    head, src/models/vln_model.py:128-146) onto ``BertLanguageEncoder``."""
    p: Dict[str, Any] = {}
    emb = "bert.embeddings."
    p["word_embeddings"] = {"embedding": _a(sd[emb + "word_embeddings.weight"])}
    p["position_embeddings"] = {"embedding": _a(sd[emb + "position_embeddings.weight"])}
    p["token_type_embeddings"] = {
        "embedding": _a(sd[emb + "token_type_embeddings.weight"])
    }
    p["embeddings_norm"] = {
        "scale": _a(sd[emb + "LayerNorm.weight"]),
        "bias": _a(sd[emb + "LayerNorm.bias"]),
    }
    for i in range(num_layers):
        pre = f"bert.encoder.layer.{i}."
        p[f"layer_{i}"] = {
            "attention": {
                "query": {
                    "kernel": _t(sd[pre + "attention.self.query.weight"]),
                    "bias": _a(sd[pre + "attention.self.query.bias"]),
                },
                "key": {
                    "kernel": _t(sd[pre + "attention.self.key.weight"]),
                    "bias": _a(sd[pre + "attention.self.key.bias"]),
                },
                "value": {
                    "kernel": _t(sd[pre + "attention.self.value.weight"]),
                    "bias": _a(sd[pre + "attention.self.value.bias"]),
                },
            },
            "attention_output": {
                "kernel": _t(sd[pre + "attention.output.dense.weight"]),
                "bias": _a(sd[pre + "attention.output.dense.bias"]),
            },
            "attention_norm": {
                "scale": _a(sd[pre + "attention.output.LayerNorm.weight"]),
                "bias": _a(sd[pre + "attention.output.LayerNorm.bias"]),
            },
            "intermediate": {
                "kernel": _t(sd[pre + "intermediate.dense.weight"]),
                "bias": _a(sd[pre + "intermediate.dense.bias"]),
            },
            "output": {
                "kernel": _t(sd[pre + "output.dense.weight"]),
                "bias": _a(sd[pre + "output.dense.bias"]),
            },
            "output_norm": {
                "scale": _a(sd[pre + "output.LayerNorm.weight"]),
                "bias": _a(sd[pre + "output.LayerNorm.bias"]),
            },
        }
    p["pooler"] = {
        "kernel": _t(sd["bert.pooler.dense.weight"]),
        "bias": _a(sd["bert.pooler.dense.bias"]),
    }
    # Sequential(Linear, ReLU, Dropout, Linear, ReLU) -> indices 0, 3
    p["cls_head"] = {
        "dense_0": {"kernel": _t(sd["linears.0.weight"]), "bias": _a(sd["linears.0.bias"])},
        "dense_1": {"kernel": _t(sd["linears.3.weight"]), "bias": _a(sd["linears.3.bias"])},
    }
    return {"params": p}


def hf_bert_params_from_torch(sd: Dict[str, np.ndarray], num_layers: int = 12,
                              head_params=None):
    """Map a RAW HuggingFace ``bert-base-uncased`` state dict onto
    ``BertLanguageEncoder`` — the way the reference initialises its language
    tower for from-scratch training
    (``AutoModel.from_pretrained('bert-base-uncased')``,
    src/models/vln_model.py:131), where the extra 768→64→49 head starts
    RANDOM and only the BERT body is pretrained.

    Accepts both released layouts:

    * ``BertForPreTraining``-style ``pytorch_model.bin``: keys prefixed
      ``bert.`` (plus ``cls.*`` prediction heads, ignored);
    * bare ``BertModel.state_dict()``: keys like
      ``embeddings.word_embeddings.weight`` with no prefix.

    ``head_params``: the freshly initialised ``cls_head`` subtree to keep
    (pass the one from ``model.init``); defaults to zeros-shaped from the
    checkpoint dims only if omitted — callers in the training path always
    pass their random init, matching the reference's random head.
    """
    if any(k.startswith("bert.") for k in sd):
        body = {k: v for k, v in sd.items() if k.startswith("bert.")}
    else:
        body = {"bert." + k: v for k, v in sd.items()}
    # reuse the CustomBERTModel mapping with a synthetic (temporary) head,
    # then swap the head for the caller's fresh init
    d_model = np.asarray(body["bert.pooler.dense.weight"]).shape[0]
    body = dict(body)
    body.setdefault("linears.0.weight", np.zeros((64, d_model), np.float32))
    body.setdefault("linears.0.bias", np.zeros((64,), np.float32))
    body.setdefault("linears.3.weight", np.zeros((49, 64), np.float32))
    body.setdefault("linears.3.bias", np.zeros((49,), np.float32))
    out = bert_params_from_torch(body, num_layers=num_layers)
    if head_params is not None:
        out["params"]["cls_head"] = head_params
    return out


# ------------------------------------------------------------- Darknet ----


def darknet_params_from_torch(sd: Dict[str, np.ndarray], block_dicts):
    """Map a reference Darknet state_dict (``module_list.{i}.conv_{i}.*`` /
    ``batch_norm_{i}.*``, src/models/dark_net.py:17-33) onto our NHWC tower.
    Returns ``{"params": ..., "batch_stats": ...}``."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i, b in enumerate(block_dicts[1:]):
        if b["type"] != "convolutional":
            continue
        conv_key = f"module_list.{i}.conv_{i}."
        entry = {"kernel": _conv(sd[conv_key + "weight"])}
        bn = int(b.get("batch_normalize", "0"))
        if bn:
            bn_key = f"module_list.{i}.batch_norm_{i}."
            params[f"bn_{i}"] = {
                "scale": _a(sd[bn_key + "weight"]),
                "bias": _a(sd[bn_key + "bias"]),
            }
            stats[f"bn_{i}"] = {
                "mean": _a(sd[bn_key + "running_mean"]),
                "var": _a(sd[bn_key + "running_var"]),
            }
        else:
            entry["bias"] = _a(sd[conv_key + "bias"])
        params[f"conv_{i}"] = entry
    return {"params": params, "batch_stats": stats}


# ------------------------------------------------------------------ ET ----


def _mlp_head_from_seq(sd, prefix, linear_indices):
    out = {}
    for j, li in enumerate(linear_indices):
        out[f"dense_{j}"] = {
            "kernel": _t(sd[f"{prefix}.{li}.weight"]),
            "bias": _a(sd[f"{prefix}.{li}.bias"]),
        }
    return out


def et_params_from_torch(sd: Dict[str, np.ndarray], num_layers: int = 2):
    """Map the reference ET state_dict (src/models/ET_haa.py:77-119) onto
    ``HAATransformer``. Dead modules (``dec_action``, the attention module's
    unused ``c`` head) are ignored."""
    p: Dict[str, Any] = {}
    p["vision_attention"] = {
        "linear_in": {"kernel": _t(sd["attention_layer_vision.linear_in.weight"])},
        "linear_out": {"kernel": _t(sd["attention_layer_vision.linear_out.weight"])},
    }
    p["frame_proj"] = {"kernel": _t(sd["fc2.weight"]), "bias": _a(sd["fc2.bias"])}
    p["direction_embedding"] = {
        "kernel": _t(sd["direction_embedding.weight"]),
        "bias": _a(sd["direction_embedding.bias"]),
    }
    p["input_norm"] = {
        "scale": _a(sd["encoder_vl.enc_layernorm.weight"]),
        "bias": _a(sd["encoder_vl.enc_layernorm.bias"]),
    }
    for i in range(num_layers):
        pre = f"encoder_vl.enc_transformer.layers.{i}."
        p[f"encoder_layer_{i}"] = {
            "in_proj": {
                "kernel": _t(sd[pre + "self_attn.in_proj_weight"]),
                "bias": _a(sd[pre + "self_attn.in_proj_bias"]),
            },
            "out_proj": {
                "kernel": _t(sd[pre + "self_attn.out_proj.weight"]),
                "bias": _a(sd[pre + "self_attn.out_proj.bias"]),
            },
            "linear1": {
                "kernel": _t(sd[pre + "linear1.weight"]),
                "bias": _a(sd[pre + "linear1.bias"]),
            },
            "linear2": {
                "kernel": _t(sd[pre + "linear2.weight"]),
                "bias": _a(sd[pre + "linear2.bias"]),
            },
            "norm1": {
                "scale": _a(sd[pre + "norm1.weight"]),
                "bias": _a(sd[pre + "norm1.bias"]),
            },
            "norm2": {
                "scale": _a(sd[pre + "norm2.weight"]),
                "bias": _a(sd[pre + "norm2.bias"]),
            },
        }
    # Sequential(Linear, ReLU, Drop, Linear, ReLU, Drop, Linear) -> 0, 3, 6
    p["action_head"] = _mlp_head_from_seq(sd, "decoder_2_action_full", (0, 3, 6))
    # fc = Sequential(Linear, Dropout, ReLU) -> 0   (ET_haa.py:110-113)
    p["saliency_proj"] = {
        "kernel": _t(sd["fc.0.weight"]),
        "bias": _a(sd["fc.0.bias"]),
    }
    return {"params": p}


# ---------------------------------------------------------------- LSTM ----


def _lstm_cell_from_torch(sd, prefix):
    return {
        "ih": {
            "kernel": _t(sd[prefix + ".weight_ih"]),
            "bias": _a(sd[prefix + ".bias_ih"]),
        },
        "hh": {
            "kernel": _t(sd[prefix + ".weight_hh"]),
            "bias": _a(sd[prefix + ".bias_hh"]),
        },
    }


def lstm_params_from_torch(sd: Dict[str, np.ndarray]):
    """Map the reference ViT_LSTM state_dict (src/models/vln_model.py:163-210)
    onto ``HAALSTM``. The embedded Darknet (``vision_model.*`` keys) is
    imported separately via ``darknet_params_from_torch``."""
    p: Dict[str, Any] = {}
    p["vision_attention"] = {
        "linear_in": {"kernel": _t(sd["attention_layer_vision.linear_in.weight"])},
        "linear_out": {"kernel": _t(sd["attention_layer_vision.linear_out.weight"])},
    }
    p["lang_attention"] = {
        "linear_in": {"kernel": _t(sd["attention_layer_lang.linear_in.weight"])},
        "linear_out": {"kernel": _t(sd["attention_layer_lang.linear_out.weight"])},
    }
    p["vision_lstm"] = _lstm_cell_from_torch(sd, "vision_lstm")
    p["direction_lstm"] = _lstm_cell_from_torch(sd, "direct_lstm")
    p["direction_embedding"] = {
        "kernel": _t(sd["direction_embedding.weight"]),
        "bias": _a(sd["direction_embedding.bias"]),
    }
    p["action_head"] = _mlp_head_from_seq(sd, "decoder_2_action_full", (0, 3, 6))
    # fc = Sequential(Linear, ReLU, Drop, Linear, ReLU) -> 0, 3
    p["saliency_head"] = _mlp_head_from_seq(sd, "fc", (0, 3))
    return {"params": p}
