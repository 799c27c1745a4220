"""Determinism helper. ref: utils/utils.py:56-61 (setup_seed).

JAX randomness is already deterministic via explicit PRNG keys; this seeds the
host-side RNGs used by data sampling so calibration window selection matches
across runs.
"""

from __future__ import annotations

import random

import numpy as np


def setup_seed(seed: int) -> None:
    np.random.seed(seed)
    random.seed(seed)
