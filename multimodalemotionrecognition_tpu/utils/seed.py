"""Reproducibility helpers (reference `src/utils/seed.py:9-14`).

JAX threading of explicit PRNG keys replaces torch's global seeding; this
module seeds the remaining ambient RNGs (python `random`, numpy) used by the
host-side data pipeline, and provides the root key helper.
"""

from __future__ import annotations

import os
import random

import jax
import numpy as np

__all__ = ["set_seed", "root_key"]


def set_seed(seed: int = 42) -> None:
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def root_key(seed: int = 42) -> jax.Array:
    return jax.random.PRNGKey(seed)
