"""Device mesh + sharding helpers.

The reference trains on a single ``cuda:0`` device (SURVEY.md §2.3); this
framework data-parallelizes over a ``jax.sharding.Mesh``:

* a 1-D ``data`` axis shards the batch (and the padded AD-YOLO target
  tensor) across chips; parameters/optimizer state are replicated;
* a ``model`` axis is reserved in the mesh layout for future tensor
  parallelism (model is ~10 M params, so TP is configured off by default).

Gradient all-reduce is inserted by XLA from the sharding annotations
(jit over sharded inputs with replicated outputs) and rides ICI — no
hand-written collectives needed at this scale.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch"]


def make_mesh(cfg: MeshConfig, devices=None, batch_size: Optional[int] = None) -> Mesh:
    """Build the (data, model) mesh.  When ``batch_size`` is given, the data
    axis is trimmed to the largest divisor of the batch size so per-shard
    batches stay integral (surplus devices are left idle rather than
    crashing the run)."""
    devices = list(devices if devices is not None else jax.devices())
    mp = max(1, cfg.model_parallel)
    assert len(devices) % mp == 0, (len(devices), mp)
    n_data = len(devices) // mp
    if batch_size is not None:
        while n_data > 1 and batch_size % n_data != 0:
            n_data -= 1
    devices = devices[: n_data * mp]
    arr = np.array(devices).reshape(n_data, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh, axis: Optional[str] = None) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    axis = axis or mesh.axis_names[0]
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place every leaf of a host batch with its leading axis sharded over
    the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def shard_batch_multihost(batch: Any, mesh: Mesh) -> Any:
    """Multi-host input placement: each process contributes its local shard
    of the global batch (``jax.make_array_from_process_local_data``), so
    hosts read disjoint file subsets and no cross-host gather happens on
    the input path.  Single-process setups degrade to :func:`shard_batch`.
    """
    if jax.process_count() == 1:
        return shard_batch(batch, mesh)
    sh = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, x), batch)
