"""Checkpointing — orbax-backed save/load + reference-checkpoint import.

The reference snapshots a dict of three submodel state_dicts + optimizers
per checkpoint file and selects the best by val_unseen SPL
(src/xview_et/agent.py:899-945, src/xview_et/main.py:200-204). Here the full
``TrainState`` (params, optimizer states, BN stats, step) is stored through
orbax with the same naming scheme (``latest_dict_{iter}``, ``best_val_unseen``)
and the same best-by-SPL policy (train.loop).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _mp_options(ocp, scope_to_self: bool = False):
    """Multi-process orbax barrier scoping. Saves run on process 0 only
    (train.loop gates the call), so the checkpointer must not wait on the
    other processes; restores run on EVERY process independently, so each
    scopes its barriers to itself with a distinct key prefix."""
    if jax.process_count() == 1:
        return None
    me = jax.process_index() if scope_to_self else 0
    return ocp.options.MultiprocessingOptions(
        primary_host=me, active_processes={me},
        barrier_sync_key_prefix=f"avdn_proc{me}",
    )


def _checkpointer(scope_to_self: bool = False):
    import orbax.checkpoint as ocp

    opts = _mp_options(ocp, scope_to_self)
    if opts is None:
        return ocp.PyTreeCheckpointer()
    return ocp.Checkpointer(ocp.PyTreeCheckpointHandler(),
                            multiprocessing_options=opts)


_async_ckptr = None


def _async_checkpointer():
    global _async_ckptr
    if _async_ckptr is None:
        import orbax.checkpoint as ocp

        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_ckptr


def save_checkpoint(ckpt_dir: str, name: str, state,
                    asynchronous: bool = False) -> str:
    """Save a TrainState pytree. Returns the checkpoint path.

    ``asynchronous=True`` snapshots to host and writes in the background
    (orbax AsyncCheckpointer) so the train loop doesn't stall on disk;
    call ``wait_for_saves()`` before reading the files back.
    """
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    if asynchronous:
        ckptr = _async_checkpointer()
        ckptr.save(path, jax.device_get(state), force=True)
        return path
    ckptr = _checkpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    return path


def wait_for_saves():
    """Block until all async checkpoint writes are durable."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def load_checkpoint(path: str, template) -> Any:
    """Restore a TrainState saved by ``save_checkpoint``. ``template`` is a
    matching TrainState (shapes/dtypes) used as the restore target."""
    import orbax.checkpoint as ocp

    ckptr = _checkpointer(scope_to_self=True)
    restored = ckptr.restore(
        os.path.abspath(path),
        item=jax.tree_util.tree_map(np.asarray, jax.device_get(template)),
    )
    return jax.tree_util.tree_map(
        lambda t, r: jax.numpy.asarray(r), template, restored
    )


def import_reference_agent(path: str, family: str, darknet_blocks,
                           bert_layers: int = 12, et_layers: int = 2):
    """Import a released reference agent checkpoint (``best_val_unseen``):
    ``{lang_model, vision_model, vln_model}`` each ``{epoch, state_dict,
    optimizer}`` (src/xview_et/agent.py:899-916). Returns
    ``(bert_vars, darknet_vars, vln_vars, epoch)``.

    For the LSTM family the Darknet lives inside vln_model (keys prefixed
    ``vision_model.``) — both layouts are handled."""
    from avdn_tpu.compat.torch_import import (
        load_reference_checkpoint,
        bert_params_from_torch,
        darknet_params_from_torch,
        et_params_from_torch,
        lstm_params_from_torch,
    )

    blob = load_reference_checkpoint(path)
    bert_vars = bert_params_from_torch(
        blob["lang_model"]["state_dict"], num_layers=bert_layers
    )
    if family == "et":
        dk_vars = darknet_params_from_torch(
            blob["vision_model"]["state_dict"], darknet_blocks
        )
        vln_vars = et_params_from_torch(
            blob["vln_model"]["state_dict"], num_layers=et_layers
        )
    else:
        vln_sd = blob["vln_model"]["state_dict"]
        dk_sd = {
            k[len("vision_model."):]: v
            for k, v in vln_sd.items()
            if k.startswith("vision_model.")
        }
        dk_vars = darknet_params_from_torch(dk_sd, darknet_blocks)
        vln_vars = lstm_params_from_torch(vln_sd)
    epoch = int(blob["vln_model"].get("epoch", 1)) - 1
    return bert_vars, dk_vars, vln_vars, epoch


def import_bert_pretrain(path: str, num_layers: int = 12, head_params=None):
    """Import a raw HuggingFace BERT checkpoint (``pytorch_model.bin`` /
    bare ``BertModel`` state dict) for from-scratch training — the
    reference's language-tower init
    (``AutoModel.from_pretrained('bert-base-uncased')``,
    src/models/vln_model.py:131). The 768→64→49 head stays at the caller's
    fresh ``head_params`` (the reference's head is random too)."""
    from avdn_tpu.compat.torch_import import (
        load_reference_checkpoint,
        hf_bert_params_from_torch,
    )

    blob = load_reference_checkpoint(path)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return hf_bert_params_from_torch(sd, num_layers=num_layers,
                                     head_params=head_params)


def import_darknet_pretrain(path: str, darknet_blocks):
    """Import the released YOLO pretrain ``best.pt`` (``{'model': sd}``)
    with key filtering like the reference (src/xview_et/agent.py:136-141)."""
    from avdn_tpu.compat.torch_import import (
        load_reference_checkpoint,
        darknet_params_from_torch,
    )

    blob = load_reference_checkpoint(path)
    sd = blob["model"] if "model" in blob else blob
    return darknet_params_from_torch(sd, darknet_blocks)
