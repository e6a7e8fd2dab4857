"""Host→device batch assembly: annotation items → TrainBatch + metadata.

Bridges the annotation/map layers to the compiled rollout: GPS coordinates
become float32-safe offsets from each map's bottom-left corner, GT paths and
attention circles are padded to static shapes, and language is tokenised in
the reference's two views (instructions-only for token features; dialog +
instructions for the CLS heads — src/xview_et/agent.py:521-538).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from avdn_tpu.rollout.engine import EpisodeBatch
from avdn_tpu.train.step import TrainBatch
from avdn_tpu.data.maps import attention_circles
from avdn_tpu.metrics.nav import count_dialog_rounds


@dataclasses.dataclass(frozen=True)
class BatcherConfig:
    max_gt_len: int = 12
    max_circles: int = 16
    instr_pad: int = 128    # pass-1 token length (instructions only)
    dialog_pad: int = 320   # pass-2 token length (dialog + instructions)
    lang_dim: int = 768
    vision_only: bool = False
    single_bert_pass: bool = False  # --train_val_on_full


def make_train_batch(
    items: List[dict],
    tokenizer,
    slot_of: Optional[dict],
    cfg: BatcherConfig = BatcherConfig(),
) -> Tuple[TrainBatch, List[dict]]:
    """Build a device TrainBatch + per-item metadata for metric assembly.

    ``slot_of`` maps map_name → bank slot (from DeviceMapBank.prepare); pass
    None to use slot 0 for all items (single-map tests)."""
    B = len(items)
    start_corners = np.zeros((B, 4, 2), np.float32)
    start_dir = np.zeros((B,), np.float32)
    extent = np.zeros((B, 2), np.float32)
    lat_ratio = np.zeros((B,), np.float32)
    gt_corners = np.zeros((B, cfg.max_gt_len, 4, 2), np.float32)
    gt_len = np.zeros((B,), np.int32)
    circles = np.zeros((B, cfg.max_circles, 3), np.float32)
    n_circles = np.zeros((B,), np.int32)
    map_idx = np.zeros((B,), np.int32)
    meta = []

    instr_texts = []
    dialog_texts = []
    for i, item in enumerate(items):
        origin = np.asarray(item["gps_botm_left"], np.float64)
        tr = np.asarray(item["gps_top_right"], np.float64)
        extent[i] = tr - origin
        lat_ratio[i] = item["lat_ratio"]
        path = item["gt_path_corners"]
        n = min(len(path), cfg.max_gt_len)
        gt_len[i] = n
        for j in range(n):
            gt_corners[i, j] = np.asarray(path[j], np.float64) - origin
        start_corners[i] = gt_corners[i, 0]
        start_dir[i] = item["angle"]
        circles[i], n_circles[i] = attention_circles(item, cfg.max_circles)
        map_idx[i] = 0 if slot_of is None else slot_of[item["map_name"]]

        instr = "" if cfg.vision_only else item["instructions"]
        dialog = item["pre_dialogs"] + item["instructions"]
        instr_texts.append(instr)
        dialog_texts.append(dialog)
        num_dia_src = instr if cfg.single_bert_pass else dialog
        meta.append(
            {
                "instr_id": item["map_name"] + "__" + item["route_index"],
                "num_dia": count_dialog_rounds(num_dia_src),
                "start_corners": start_corners[i].copy(),
                "start_dir": float(start_dir[i]),
                "gt_path_corners": [gt_corners[i, j].copy() for j in range(n)],
                "valid": not item.get("_pad", False),
            }
        )

    ids1, mask1 = tokenizer(instr_texts, max_length=cfg.instr_pad,
                            pad_to=cfg.instr_pad)
    ids2, mask2 = tokenizer(dialog_texts, max_length=cfg.dialog_pad,
                            pad_to=cfg.dialog_pad)

    episode = EpisodeBatch(
        map_idx=jnp.asarray(map_idx),
        start_corners=jnp.asarray(start_corners),
        start_dir=jnp.asarray(start_dir),
        extent=jnp.asarray(extent),
        lat_ratio=jnp.asarray(lat_ratio),
        gt_corners=jnp.asarray(gt_corners),
        gt_len=jnp.asarray(gt_len),
        circles=jnp.asarray(circles),
        n_circles=jnp.asarray(n_circles),
        lang_feat=jnp.zeros((B, cfg.instr_pad, cfg.lang_dim), jnp.float32),
        lang_cls=jnp.zeros((B, 49), jnp.float32),
        lang_mask=jnp.asarray(mask1.astype(bool)),
    )
    batch = TrainBatch(
        episode=episode,
        ids_instr=jnp.asarray(ids1),
        mask_instr=jnp.asarray(mask1),
        ids_dialog=jnp.asarray(ids2),
        mask_dialog=jnp.asarray(mask2),
    )
    return batch, meta
