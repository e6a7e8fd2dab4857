from avdn_tpu.models.layers import (
    SoftDotAttention,
    MLPHead,
    sinusoidal_pos_encoding,
    haa_attention_mask,
    saliency_upsample,
)
from avdn_tpu.models.bert import BertConfig, BertLanguageEncoder
from avdn_tpu.models.darknet import (
    DarknetConfig,
    Darknet,
    parse_darknet_cfg,
    default_xview_cfg,
)
from avdn_tpu.models.et import HAATransformer
from avdn_tpu.models.lstm import HAALSTM, HAALSTMVisionOnly, HAALSTMLangOnly

__all__ = [
    "SoftDotAttention",
    "MLPHead",
    "sinusoidal_pos_encoding",
    "haa_attention_mask",
    "saliency_upsample",
    "BertConfig",
    "BertLanguageEncoder",
    "DarknetConfig",
    "Darknet",
    "parse_darknet_cfg",
    "default_xview_cfg",
    "HAATransformer",
    "HAALSTM",
    "HAALSTMVisionOnly",
    "HAALSTMLangOnly",
]
