"""Flax parameters → PyTorch reference checkpoint exporters.

The exact inverse of ``compat/torch_import.py``: models trained in this
framework export to the reference's agent checkpoint format
(``{lang_model, vision_model, vln_model}`` each ``{epoch, state_dict,
optimizer}``, src/xview_et/agent.py:899-916 / src/xview_lstm/agent.py:
860-877), so a reference user can move in BOTH directions — evaluate our
weights in their torch harness, or keep serving from theirs while training
here. The reference's loader takes the key intersection
(src/xview_et/agent.py:925-934), so its dead modules (``dec_action``, the
attention module's unused ``c`` head, ET_haa.py:41-52) simply stay at their
torch init — they are never executed.

Round-trip identity ``import(export(x)) == x`` is pinned by
tests/test_checkpoint_import.py. torch is only needed by
``export_reference_agent`` (to write the ``.pt``); the state-dict builders
are pure numpy.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _tt(w):  # flax kernel (in, out) -> torch Linear weight (out, in)
    return np.asarray(w).T


def _n(w):
    return np.asarray(w)


def _conv(w):  # flax HWIO -> torch OIHW
    return np.transpose(np.asarray(w), (3, 2, 0, 1))


def _p(tree):
    return tree["params"] if "params" in tree else tree


# ---------------------------------------------------------------- BERT ----


def bert_state_dict(bert_vars: Dict[str, Any],
                    num_layers: int = 12) -> Dict[str, np.ndarray]:
    """``BertLanguageEncoder`` params → ``CustomBERTModel`` state_dict
    (inverse of torch_import.bert_params_from_torch)."""
    p = _p(bert_vars)
    sd: Dict[str, np.ndarray] = {}
    emb = "bert.embeddings."
    sd[emb + "word_embeddings.weight"] = _n(p["word_embeddings"]["embedding"])
    sd[emb + "position_embeddings.weight"] = _n(
        p["position_embeddings"]["embedding"]
    )
    sd[emb + "token_type_embeddings.weight"] = _n(
        p["token_type_embeddings"]["embedding"]
    )
    sd[emb + "LayerNorm.weight"] = _n(p["embeddings_norm"]["scale"])
    sd[emb + "LayerNorm.bias"] = _n(p["embeddings_norm"]["bias"])
    for i in range(num_layers):
        li = p[f"layer_{i}"]
        pre = f"bert.encoder.layer.{i}."
        for name in ("query", "key", "value"):
            sd[pre + f"attention.self.{name}.weight"] = _tt(
                li["attention"][name]["kernel"]
            )
            sd[pre + f"attention.self.{name}.bias"] = _n(
                li["attention"][name]["bias"]
            )
        sd[pre + "attention.output.dense.weight"] = _tt(
            li["attention_output"]["kernel"]
        )
        sd[pre + "attention.output.dense.bias"] = _n(
            li["attention_output"]["bias"]
        )
        sd[pre + "attention.output.LayerNorm.weight"] = _n(
            li["attention_norm"]["scale"]
        )
        sd[pre + "attention.output.LayerNorm.bias"] = _n(
            li["attention_norm"]["bias"]
        )
        sd[pre + "intermediate.dense.weight"] = _tt(li["intermediate"]["kernel"])
        sd[pre + "intermediate.dense.bias"] = _n(li["intermediate"]["bias"])
        sd[pre + "output.dense.weight"] = _tt(li["output"]["kernel"])
        sd[pre + "output.dense.bias"] = _n(li["output"]["bias"])
        sd[pre + "output.LayerNorm.weight"] = _n(li["output_norm"]["scale"])
        sd[pre + "output.LayerNorm.bias"] = _n(li["output_norm"]["bias"])
    sd["bert.pooler.dense.weight"] = _tt(p["pooler"]["kernel"])
    sd["bert.pooler.dense.bias"] = _n(p["pooler"]["bias"])
    # head Sequential(Linear, ReLU, Dropout, Linear, ReLU) -> indices 0, 3
    sd["linears.0.weight"] = _tt(p["cls_head"]["dense_0"]["kernel"])
    sd["linears.0.bias"] = _n(p["cls_head"]["dense_0"]["bias"])
    sd["linears.3.weight"] = _tt(p["cls_head"]["dense_1"]["kernel"])
    sd["linears.3.bias"] = _n(p["cls_head"]["dense_1"]["bias"])
    return sd


# ------------------------------------------------------------- Darknet ----


def darknet_state_dict(darknet_vars: Dict[str, Any],
                       block_dicts) -> Dict[str, np.ndarray]:
    """NHWC Darknet variables → reference ``module_list.{i}.*`` state_dict
    (src/models/dark_net.py:17-33 naming)."""
    params = darknet_vars["params"]
    stats = darknet_vars.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}
    for i, b in enumerate(block_dicts[1:]):
        if b["type"] != "convolutional":
            continue
        conv = params[f"conv_{i}"]
        sd[f"module_list.{i}.conv_{i}.weight"] = _conv(conv["kernel"])
        if int(b.get("batch_normalize", "0")):
            bn_key = f"module_list.{i}.batch_norm_{i}."
            sd[bn_key + "weight"] = _n(params[f"bn_{i}"]["scale"])
            sd[bn_key + "bias"] = _n(params[f"bn_{i}"]["bias"])
            sd[bn_key + "running_mean"] = _n(stats[f"bn_{i}"]["mean"])
            sd[bn_key + "running_var"] = _n(stats[f"bn_{i}"]["var"])
            sd[bn_key + "num_batches_tracked"] = np.asarray(0, np.int64)
        else:
            sd[f"module_list.{i}.conv_{i}.bias"] = _n(conv["bias"])
    return sd


# ------------------------------------------------------------------ ET ----


def _mlp_head_to_seq(sd, head, prefix, linear_indices):
    for j, li in enumerate(linear_indices):
        sd[f"{prefix}.{li}.weight"] = _tt(head[f"dense_{j}"]["kernel"])
        sd[f"{prefix}.{li}.bias"] = _n(head[f"dense_{j}"]["bias"])


def et_state_dict(et_vars: Dict[str, Any],
                  num_layers: int = 2) -> Dict[str, np.ndarray]:
    """``HAATransformer`` params → reference ET state_dict
    (src/models/ET_haa.py:77-119 naming; dead modules omitted — the
    reference loader's key intersection skips them)."""
    p = _p(et_vars)
    sd: Dict[str, np.ndarray] = {}
    sd["attention_layer_vision.linear_in.weight"] = _tt(
        p["vision_attention"]["linear_in"]["kernel"]
    )
    sd["attention_layer_vision.linear_out.weight"] = _tt(
        p["vision_attention"]["linear_out"]["kernel"]
    )
    sd["fc2.weight"] = _tt(p["frame_proj"]["kernel"])
    sd["fc2.bias"] = _n(p["frame_proj"]["bias"])
    sd["direction_embedding.weight"] = _tt(p["direction_embedding"]["kernel"])
    sd["direction_embedding.bias"] = _n(p["direction_embedding"]["bias"])
    sd["encoder_vl.enc_layernorm.weight"] = _n(p["input_norm"]["scale"])
    sd["encoder_vl.enc_layernorm.bias"] = _n(p["input_norm"]["bias"])
    for i in range(num_layers):
        li = p[f"encoder_layer_{i}"]
        pre = f"encoder_vl.enc_transformer.layers.{i}."
        sd[pre + "self_attn.in_proj_weight"] = _tt(li["in_proj"]["kernel"])
        sd[pre + "self_attn.in_proj_bias"] = _n(li["in_proj"]["bias"])
        sd[pre + "self_attn.out_proj.weight"] = _tt(li["out_proj"]["kernel"])
        sd[pre + "self_attn.out_proj.bias"] = _n(li["out_proj"]["bias"])
        sd[pre + "linear1.weight"] = _tt(li["linear1"]["kernel"])
        sd[pre + "linear1.bias"] = _n(li["linear1"]["bias"])
        sd[pre + "linear2.weight"] = _tt(li["linear2"]["kernel"])
        sd[pre + "linear2.bias"] = _n(li["linear2"]["bias"])
        sd[pre + "norm1.weight"] = _n(li["norm1"]["scale"])
        sd[pre + "norm1.bias"] = _n(li["norm1"]["bias"])
        sd[pre + "norm2.weight"] = _n(li["norm2"]["scale"])
        sd[pre + "norm2.bias"] = _n(li["norm2"]["bias"])
    _mlp_head_to_seq(sd, p["action_head"], "decoder_2_action_full", (0, 3, 6))
    sd["fc.0.weight"] = _tt(p["saliency_proj"]["kernel"])
    sd["fc.0.bias"] = _n(p["saliency_proj"]["bias"])
    return sd


# ---------------------------------------------------------------- LSTM ----


def _lstm_cell_to_torch(sd, cell, prefix):
    sd[prefix + ".weight_ih"] = _tt(cell["ih"]["kernel"])
    sd[prefix + ".bias_ih"] = _n(cell["ih"]["bias"])
    sd[prefix + ".weight_hh"] = _tt(cell["hh"]["kernel"])
    sd[prefix + ".bias_hh"] = _n(cell["hh"]["bias"])


def lstm_state_dict(lstm_vars: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """``HAALSTM`` params → reference ViT_LSTM state_dict
    (src/models/vln_model.py:163-210 naming; Darknet keys added separately
    by export_reference_agent under the ``vision_model.`` prefix)."""
    p = _p(lstm_vars)
    sd: Dict[str, np.ndarray] = {}
    sd["attention_layer_vision.linear_in.weight"] = _tt(
        p["vision_attention"]["linear_in"]["kernel"]
    )
    sd["attention_layer_vision.linear_out.weight"] = _tt(
        p["vision_attention"]["linear_out"]["kernel"]
    )
    sd["attention_layer_lang.linear_in.weight"] = _tt(
        p["lang_attention"]["linear_in"]["kernel"]
    )
    sd["attention_layer_lang.linear_out.weight"] = _tt(
        p["lang_attention"]["linear_out"]["kernel"]
    )
    _lstm_cell_to_torch(sd, p["vision_lstm"], "vision_lstm")
    _lstm_cell_to_torch(sd, p["direction_lstm"], "direct_lstm")
    sd["direction_embedding.weight"] = _tt(p["direction_embedding"]["kernel"])
    sd["direction_embedding.bias"] = _n(p["direction_embedding"]["bias"])
    _mlp_head_to_seq(sd, p["action_head"], "decoder_2_action_full", (0, 3, 6))
    _mlp_head_to_seq(sd, p["saliency_head"], "fc", (0, 3))
    return sd


# --------------------------------------------------------------- agent ----


def export_reference_agent(
    path: str,
    family: str,
    darknet_blocks,
    bert_vars: Dict[str, Any],
    darknet_vars: Dict[str, Any],
    vln_vars: Dict[str, Any],
    epoch: int = 0,
    bert_layers: int = 12,
    et_layers: int = 2,
) -> None:
    """Write a reference-format agent checkpoint the torch harness can
    ``agent.load()`` directly. ET family: 3 submodels; LSTM family: 2
    submodels with the Darknet nested inside vln_model
    (src/xview_lstm/agent.py:860-877)."""
    import torch

    def tensors(sd):
        # copy=True: jax buffers are read-only views, torch wants writable
        return {k: torch.from_numpy(np.array(v, copy=True))
                for k, v in sd.items()}

    def entry(sd):
        return {"epoch": epoch + 1, "state_dict": tensors(sd), "optimizer": {}}

    states = {"lang_model": entry(bert_state_dict(bert_vars, bert_layers))}
    if family == "et":
        states["vision_model"] = entry(
            darknet_state_dict(darknet_vars, darknet_blocks)
        )
        states["vln_model"] = entry(et_state_dict(vln_vars, et_layers))
    else:
        vln_sd = lstm_state_dict(vln_vars)
        dk_sd = darknet_state_dict(darknet_vars, darknet_blocks)
        vln_sd.update({f"vision_model.{k}": v for k, v in dk_sd.items()})
        states["vln_model"] = entry(vln_sd)
    torch.save(states, path)
