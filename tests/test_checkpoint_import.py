"""Reference-checkpoint import: a synthetic ``best_val_unseen``-layout torch
checkpoint (3 submodels, src/xview_et/agent.py:899-916) imports into usable
flax params for all three towers."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import jax
import jax.numpy as jnp

from avdn_tpu.models import (
    BertConfig, BertLanguageEncoder, Darknet, DarknetConfig, HAATransformer,
)
from avdn_tpu.models.et import ETConfig
from avdn_tpu.train.checkpoints import import_reference_agent, import_darknet_pretrain

DEMB = 64
HEADS = 4
ET_LAYERS = 1


def torch_bert_sd():
    from transformers import BertModel, BertConfig as HFBertConfig

    m = BertModel(HFBertConfig(
        vocab_size=1024, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=256,
        max_position_embeddings=128,
    ))
    head = tnn.Sequential(tnn.Linear(128, 64), tnn.ReLU(), tnn.Dropout(0.2),
                          tnn.Linear(64, 49), tnn.ReLU())
    sd = {("bert." + k): v for k, v in m.state_dict().items()}
    sd.update({("linears." + k): v for k, v in head.state_dict().items()})
    return sd


def torch_darknet_sd(blocks):
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_models import build_torch_darknet

    mods = build_torch_darknet(blocks)
    return {f"module_list.{k}": v for k, v in mods.state_dict().items()}


def torch_et_sd():
    """Reference-layout ET state dict (src/models/ET_haa.py:77-119 naming)."""
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    sd = {
        "attention_layer_vision.linear_in.weight": t(49, 49),
        "attention_layer_vision.linear_out.weight": t(49, 98),
        "fc2.weight": t(DEMB, 49), "fc2.bias": t(DEMB),
        "direction_embedding.weight": t(DEMB, 2), "direction_embedding.bias": t(DEMB),
        "encoder_vl.enc_layernorm.weight": torch.ones(DEMB),
        "encoder_vl.enc_layernorm.bias": torch.zeros(DEMB),
        "decoder_2_action_full.0.weight": t(256, DEMB),
        "decoder_2_action_full.0.bias": t(256),
        "decoder_2_action_full.3.weight": t(32, 256),
        "decoder_2_action_full.3.bias": t(32),
        "decoder_2_action_full.6.weight": t(4, 32),
        "decoder_2_action_full.6.bias": t(4),
        "fc.0.weight": t(8 * 8, DEMB), "fc.0.bias": t(8 * 8),
        # dead modules present in real checkpoints; must be ignored
        "dec_action.weight": t(DEMB, DEMB), "dec_action.bias": t(DEMB),
        "attention_layer_vision.c.0.weight": t(256, 768),
    }
    for i in range(ET_LAYERS):
        pre = f"encoder_vl.enc_transformer.layers.{i}."
        sd.update({
            pre + "self_attn.in_proj_weight": t(3 * DEMB, DEMB),
            pre + "self_attn.in_proj_bias": t(3 * DEMB),
            pre + "self_attn.out_proj.weight": t(DEMB, DEMB),
            pre + "self_attn.out_proj.bias": t(DEMB),
            pre + "linear1.weight": t(DEMB, DEMB), pre + "linear1.bias": t(DEMB),
            pre + "linear2.weight": t(DEMB, DEMB), pre + "linear2.bias": t(DEMB),
            pre + "norm1.weight": torch.ones(DEMB), pre + "norm1.bias": torch.zeros(DEMB),
            pre + "norm2.weight": torch.ones(DEMB), pre + "norm2.bias": torch.zeros(DEMB),
        })
    return sd


def test_full_agent_import_and_forward(tmp_path):
    dk_cfg = DarknetConfig.tiny()
    blocks = dk_cfg.block_dicts()
    blob = {
        "lang_model": {"epoch": 3, "state_dict": torch_bert_sd(), "optimizer": {}},
        "vision_model": {"epoch": 3, "state_dict": torch_darknet_sd(blocks),
                         "optimizer": {}},
        "vln_model": {"epoch": 3, "state_dict": torch_et_sd(), "optimizer": {}},
    }
    path = str(tmp_path / "best_val_unseen")
    torch.save(blob, path)

    bert_v, dk_v, vln_v, epoch = import_reference_agent(
        path, "et", blocks, bert_layers=2, et_layers=ET_LAYERS
    )
    assert epoch == 2

    # forward through all three towers with the imported params
    bert = BertLanguageEncoder(BertConfig.tiny())
    ids = np.arange(12, dtype=np.int32)[None, :] % 1000
    seq, head49, pooled = bert.apply(bert_v, jnp.asarray(ids),
                                     jnp.ones_like(jnp.asarray(ids)))
    assert seq.shape == (1, 12, 128) and head49.shape == (1, 49)

    dk = Darknet(dk_cfg)
    feats = dk.apply(dk_v, jnp.zeros((1, 224, 224, 3)), train=False)
    assert feats.shape[1:] == (64, 49)

    et = HAATransformer(ETConfig(demb=DEMB, encoder_heads=HEADS,
                                 encoder_layers=ET_LAYERS))
    act, sal = et.apply(
        vln_v,
        jnp.zeros((1, 12, DEMB)), head49[:, :49],
        jnp.zeros((1, 4, 64, 49)), jnp.zeros((1, 4, 2)),
        jnp.ones((1,), jnp.int32),
    )
    assert act.shape == (1, 4)
    assert sal.shape == (1, 224, 224)
    assert np.isfinite(np.asarray(act)).all()


def test_darknet_pretrain_import(tmp_path):
    dk_cfg = DarknetConfig.tiny()
    blocks = dk_cfg.block_dicts()
    blob = {"model": torch_darknet_sd(blocks)}
    path = str(tmp_path / "best.pt")
    torch.save(blob, path)
    dk_v = import_darknet_pretrain(path, blocks)
    dk = Darknet(dk_cfg)
    out = dk.apply(dk_v, jnp.zeros((2, 224, 224, 3)), train=False)
    assert out.shape == (2, 64, 49)
