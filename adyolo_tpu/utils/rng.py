"""RNG discipline: seeding + checkpointable state capture.

Replaces the reference's 4-stream RNG bookkeeping
(``src/utils/utility.py:22-50``: python/numpy/torch/cuda + hash seed)
with three streams relevant here:

* python ``random`` — drives the epoch pool sampler and rotation
  augmentation (host-side, order-dependent, must be bit-restorable),
* numpy default RNG — host-side numeric helpers,
* a JAX PRNG key — the single functional stream for dropout/SpecAug,
  carried in the training loop and stored in checkpoints.

``get_rng_state``/``set_rng_state`` round-trip all three, giving the same
bit-reproducible resume guarantee the reference checkpoint provides
(``src/train.py:150,159,245``).
"""
from __future__ import annotations

import os
import random
from typing import Any, Dict

import jax
import numpy as np

__all__ = ["seed_init", "get_rng_state", "set_rng_state"]


def seed_init(seed: int) -> jax.Array:
    """Seed host RNGs and return the root JAX key (utility.py:22-30)."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.PRNGKey(seed)


def get_rng_state(jax_key: jax.Array) -> Dict[str, Any]:
    return {
        "rand_state": random.getstate(),
        "numpy_state": np.random.get_state(),
        "jax_key": np.asarray(jax_key),
        "os_hash_state": os.environ.get("PYTHONHASHSEED", ""),
    }


def set_rng_state(state: Dict[str, Any]) -> jax.Array:
    random.setstate(state["rand_state"])
    np.random.set_state(state["numpy_state"])
    os.environ["PYTHONHASHSEED"] = str(state["os_hash_state"])
    return jax.numpy.asarray(state["jax_key"])
