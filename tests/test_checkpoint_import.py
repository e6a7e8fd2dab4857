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
from avdn_tpu.train.checkpoints import (
    import_bert_pretrain,
    import_darknet_pretrain,
    import_reference_agent,
)

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


@pytest.mark.parametrize("layout", ["bare", "prefixed"])
def test_bert_pretrain_import(tmp_path, layout):
    """Raw HF BERT checkpoint → language-tower init for from-scratch
    training (the reference's from_pretrained('bert-base-uncased'),
    vln_model.py:131). Both released layouts: a bare ``BertModel`` state
    dict and a ``bert.``-prefixed ``pytorch_model.bin`` (whose ``cls.*``
    pretraining heads must be ignored). Numeric parity is checked against
    the actual transformers forward; the 64/49 head must stay at the
    caller's fresh random init (the reference's head is random too)."""
    from transformers import BertModel, BertConfig as HFBertConfig

    torch.manual_seed(7)
    hf_cfg = HFBertConfig(
        vocab_size=1024, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=256,
        max_position_embeddings=128, attn_implementation="eager",
    )
    m = BertModel(hf_cfg)
    m.eval()
    sd = m.state_dict()
    if layout == "prefixed":
        sd = {("bert." + k): v for k, v in sd.items()}
        # pretraining heads present in pytorch_model.bin — must be ignored
        sd["cls.predictions.decoder.weight"] = torch.zeros(1024, 128)
        sd["cls.predictions.bias"] = torch.zeros(1024)
    path = str(tmp_path / "pytorch_model.bin")
    torch.save(sd, path)

    ours = BertLanguageEncoder(BertConfig.tiny())
    ids = (np.arange(24, dtype=np.int32)[None, :] % 1000) + 1
    mask = np.ones_like(ids)
    fresh = ours.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                      jnp.asarray(mask))
    fresh_head = fresh["params"]["cls_head"]

    vars_in = import_bert_pretrain(path, num_layers=2,
                                   head_params=fresh_head)
    seq, head49, pooled = ours.apply(vars_in, jnp.asarray(ids),
                                     jnp.asarray(mask), deterministic=True)

    with torch.no_grad():
        out = m(torch.from_numpy(ids.astype(np.int64)),
                torch.from_numpy(mask.astype(np.int64)))
    np.testing.assert_allclose(np.asarray(seq), out.last_hidden_state.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled), out.pooler_output.numpy(),
                               atol=1e-4, rtol=1e-4)
    # the head is the fresh random init, untouched
    for lname in ("dense_0", "dense_1"):
        np.testing.assert_array_equal(
            np.asarray(vars_in["params"]["cls_head"][lname]["kernel"]),
            np.asarray(fresh_head[lname]["kernel"]))
    assert np.isfinite(np.asarray(head49)).all()


def test_bert_pretrain_flag_wires_into_training_init(tmp_path, monkeypatch):
    """--bert_weight_file initialises the language tower inside
    train/loop.init_state (symmetric to --darknet_weight_file)."""
    from transformers import BertModel, BertConfig as HFBertConfig

    from avdn_tpu.config import Args, postprocess_args
    from avdn_tpu.train.loop import (
        build_models, init_state, train_config_from_args,
    )

    torch.manual_seed(11)
    m = BertModel(HFBertConfig(
        vocab_size=1024, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=256,
        max_position_embeddings=128))
    path = str(tmp_path / "pytorch_model.bin")
    torch.save(m.state_dict(), path)

    monkeypatch.chdir(tmp_path)
    args = postprocess_args(Args(
        output_dir=str(tmp_path / "o"), demb=128, bert_layers=2,
        encoder_heads=4, encoder_layers=1, max_instr_len=16,
        bert_weight_file=path, optim="adamW",
    ))
    cfg = train_config_from_args(args)
    bert, dk, vln = build_models(args)
    state = init_state(args, bert, dk, vln, cfg, jax.random.PRNGKey(0))
    want = m.state_dict()["embeddings.word_embeddings.weight"].numpy()
    got = np.asarray(state.bert_params["word_embeddings"]["embedding"])
    np.testing.assert_allclose(got, want, atol=1e-6)


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


# ------------------------------------------------------- export round-trip ----


def _init_family_vars(family):
    """Random-init flax variables for one agent family (tiny configs)."""
    from avdn_tpu.models import HAALSTM
    from avdn_tpu.models.lstm import LSTMConfig, init_lstm_state

    bert = BertLanguageEncoder(BertConfig.tiny())
    dk_cfg = DarknetConfig.tiny()
    dk = Darknet(dk_cfg)
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    ids = jnp.ones((1, 8), jnp.int32)
    bert_v = bert.init(ks[0], ids, jnp.ones_like(ids))
    dk_v = dk.init(ks[1], jnp.zeros((1, 224, 224, 3)), train=False)
    if family == "et":
        vln = HAATransformer(ETConfig(demb=128, encoder_heads=HEADS,
                                      encoder_layers=ET_LAYERS))
        vln_v = vln.init(
            ks[2], jnp.zeros((1, 8, 128)), jnp.zeros((1, 49)),
            jnp.zeros((1, 4, 64, 49)), jnp.zeros((1, 4, 2)),
            jnp.ones((1,), jnp.int32),
        )
    else:
        cfg = LSTMConfig(hidden_size=128, dir_hidden=32, vis_hidden=96)
        vln = HAALSTM(cfg)
        vln_v = vln.init(
            ks[2], jnp.zeros((1, 1)), jnp.zeros((1, 64, 49)),
            jnp.zeros((1, 49)), jnp.zeros((1, 8, 128)),
            init_lstm_state(1, cfg),
        )
    return dk_cfg.block_dicts(), bert_v, dk_v, vln_v


def _assert_trees_equal(a, b, msg):
    fa, ta = jax.tree_util.tree_flatten(a)
    fb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, f"{msg}: tree structure changed"
    for xa, xb in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb),
                                      err_msg=msg)


@pytest.mark.parametrize("family", ["et", "lstm"])
def test_export_import_roundtrip(family, tmp_path):
    """compat/torch_export inverts compat/torch_import exactly: params
    trained here survive a trip through the reference's checkpoint format
    bit-for-bit (the reference harness can agent.load() the file)."""
    from avdn_tpu.compat.torch_export import export_reference_agent

    blocks, bert_v, dk_v, vln_v = _init_family_vars(family)
    path = str(tmp_path / "exported_agent")
    export_reference_agent(
        path, family, blocks, bert_v, dk_v, vln_v,
        epoch=4, bert_layers=2, et_layers=ET_LAYERS,
    )
    bert_r, dk_r, vln_r, epoch = import_reference_agent(
        path, family, blocks, bert_layers=2, et_layers=ET_LAYERS
    )
    assert epoch == 4
    _assert_trees_equal(bert_v["params"], bert_r["params"], "bert")
    _assert_trees_equal(dk_v["params"], dk_r["params"], "darknet params")
    _assert_trees_equal(dk_v.get("batch_stats", {}), dk_r["batch_stats"],
                        "darknet batch_stats")
    _assert_trees_equal(vln_v["params"], vln_r["params"], "vln")


def test_export_tool_from_orbax_checkpoint(tmp_path):
    """tools/export_torch_ckpt.py: orbax checkpoint → reference .pt that
    imports back to the same parameters."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import write_fixture_dataset
    from test_e2e_loop import TINY_DARKNET_CFG, make_args

    root = write_fixture_dataset(str(tmp_path / "data"))
    out = str(tmp_path / "run")
    cfg_path = str(tmp_path / "tiny_yolo.cfg")
    with open(cfg_path, "w") as f:
        f.write(TINY_DARKNET_CFG)
    args = make_args(root, out, cfg_path)

    from avdn_tpu.train import checkpoints as ckpt
    from avdn_tpu.train.loop import build_models, init_state, train_config_from_args

    cfg = train_config_from_args(args)
    bert, darknet, vln = build_models(args)
    state = init_state(args, bert, darknet, vln, cfg, jax.random.PRNGKey(1))
    ckpt.save_checkpoint(args.ckpt_dir, "latest_dict_1", state)
    ckpt.wait_for_saves()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import export_torch_ckpt

    out_pt = str(tmp_path / "exported.pt")
    export_torch_ckpt.main([
        "--output", out_pt,
        "--root_dir", root, "--output_dir", out,
        "--resume_file", "latest",
        "--demb", "64", "--encoder_heads", "4", "--encoder_layers", "1",
        "--bert_layers", "2", "--max_instr_len", "32", "--dialog_pad", "64",
        "--darknet_model_file", cfg_path, "--map_bank_px", "256",
    ])
    bert_r, dk_r, vln_r, _ = import_reference_agent(
        out_pt, "et", darknet.cfg.block_dicts(), bert_layers=2, et_layers=1
    )
    _assert_trees_equal(state.bert_params, bert_r["params"], "bert")
    _assert_trees_equal(state.darknet_params, dk_r["params"], "darknet")
    _assert_trees_equal(state.vln_params, vln_r["params"], "vln")
