"""Seeding (reference src/utils/misc.py:5-12, minus the torch/cuda calls —
JAX randomness is explicit PRNG keys, so only host-side RNGs need seeding)."""

import random

import numpy as np


def set_random_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
