"""Seeding. Reference: utils/seed.py:6-13 (python/numpy/torch global seeds).

JAX is functionally seeded — the framework threads explicit `jax.random` keys.
This helper seeds the *host-side* RNGs (python, numpy) used by the data
pipeline shuffles and returns a root PRNG key for the device side.
"""
from __future__ import annotations

import os
import random

import jax
import numpy as np


def seed_everything(seed: int = 21):
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.PRNGKey(seed)
