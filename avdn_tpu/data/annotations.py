"""ANDH annotation loading + normalisation.

Replicates the dataset semantics of ``ANDHNavBatch.__init__``
(src/env.py:85-180): per item the heading angle is int-rounded mod 360, GT
path corners become float arrays, instructions are lowercased, and the
dialog history list is joined into one lowercase string. Shuffling is
seeded; batches are fixed-size with wrap-around refill (src/env.py:199-249).
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict, Iterator, List, Optional

import numpy as np


def load_annotations(anno_dir: str, splits: List[str]) -> List[dict]:
    data = []
    for split in splits:
        path = os.path.join(anno_dir, f"{split}_data.json")
        with open(path) as f:
            new_data = json.load(f)
        for item in new_data:
            item = dict(item)
            item["angle"] = round(item["angle"]) % 360
            item["gt_path_corners"] = [
                np.asarray(c, np.float64) for c in item["gt_path_corners"]
            ]
            item["instructions"] = item["instructions"].lower()
            item["pre_dialogs"] = " ".join(item["pre_dialogs"]).lower()
            item["split"] = split
            data.append(item)
        print(f"ANDH annotations: loaded {len(new_data)} items from split {split}")
    return data


class ANDHDataset:
    """Seeded-shuffle dataset with fixed-size wrap-around batches.

    Iterating yields lists of annotation items of exactly ``batch_size``
    (the final short batch is refilled from a reshuffle, matching
    src/env.py:203-208 — items may repeat within an epoch boundary).
    """

    def __init__(self, anno_dir: str, splits: List[str], batch_size: int,
                 seed: int = 0, data: Optional[List[dict]] = None):
        self.data = data if data is not None else load_annotations(anno_dir, splits)
        self.batch_size = batch_size
        self.seed = seed
        self._rng = random.Random(seed)
        self._rng.shuffle(self.data)

    def size(self) -> int:
        return len(self.data)

    def __iter__(self) -> Iterator[List[dict]]:
        bs = self.batch_size
        for ix in range(0, len(self.data), bs):
            batch = self.data[ix : ix + bs]
            if len(batch) < bs:
                self._rng.shuffle(self.data)
                batch = batch + self.data[: bs - len(batch)]
            yield batch

    def num_batches(self) -> int:
        return (len(self.data) + self.batch_size - 1) // self.batch_size
