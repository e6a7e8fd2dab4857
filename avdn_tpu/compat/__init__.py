from avdn_tpu.compat.torch_import import (
    bert_params_from_torch,
    darknet_params_from_torch,
    et_params_from_torch,
    lstm_params_from_torch,
    load_reference_checkpoint,
)

__all__ = [
    "bert_params_from_torch",
    "darknet_params_from_torch",
    "et_params_from_torch",
    "lstm_params_from_torch",
    "load_reference_checkpoint",
]
