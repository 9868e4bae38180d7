"""Checkpoint / resume with the reference's exact semantics.

Two artifacts per experiment dir (reference ``src/train.py:222-248``):

* ``model_best.ckpt``  — {epoch, params, batch_stats, opt_state,
  confidence_thresh}, written whenever val SELD improves;
* ``model_ckpt.ckpt``  — {next epoch, params, batch_stats, opt_state,
  conf_thresh, full RNG state, best_log, remaining train-file pool},
  written every epoch; restoring it resumes training bit-reproducibly
  (train.py:145-159).

Arrays are serialized with ``flax.serialization`` (msgpack); host python
state (RNG tuples, file lists, best log) with pickle, bundled in one
file.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
from flax import serialization

from ..parallel.train_step import TrainState

__all__ = ["save_checkpoint", "load_checkpoint", "state_to_bytes", "state_from_bytes"]


def state_to_bytes(state: TrainState) -> bytes:
    return serialization.to_bytes(
        {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
    )


def state_from_bytes(template: TrainState, blob: bytes) -> TrainState:
    tree = serialization.from_bytes(
        {
            "params": template.params,
            "batch_stats": template.batch_stats,
            "opt_state": template.opt_state,
            "step": template.step,
        },
        blob,
    )
    return TrainState(tree["params"], tree["batch_stats"], tree["opt_state"],
                      jax.numpy.asarray(tree["step"]))


def save_checkpoint(path: str, state: TrainState, host_state: Dict[str, Any]) -> None:
    payload = {"arrays": state_to_bytes(state), "host": host_state}
    tmp = f"{path}.{os.getpid()}.tmp"  # pid-unique: concurrent writers on a
    # shared FS (multi-host) never interleave into one temp file
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)  # atomic vs. preemption mid-write


def load_checkpoint(path: str, template: TrainState):
    """Returns (TrainState, host_state dict)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return state_from_bytes(template, payload["arrays"]), payload["host"]
