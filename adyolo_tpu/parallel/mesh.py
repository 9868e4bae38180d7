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

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch",
           "place_multihost", "globalize_yolo_targets"]


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


def place_multihost(x: Any, sharding: NamedSharding) -> Any:
    """Multi-host input placement for one leaf: this process's host array is
    its local shard of the global array
    (``jax.make_array_from_process_local_data``), so hosts read disjoint
    file subsets and no cross-host gather happens on the input path.  For a
    replicated sharding every process passes the identical full array."""
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def globalize_yolo_targets(targets: np.ndarray, mask: np.ndarray,
                           rank: int, num_shards: int, local_batch: int,
                           allgather=None):
    """Make per-host padded AD-YOLO target rows globally consistent under
    multi-host DP.

    Each host encodes targets against its *local* batch rows; the loss
    evaluates them against the *global* batch (rows address grid cells by
    batch coordinate, train_step.batch_shardings_for keeps them
    replicated).  So: offset each host's batch-index column by its global
    row offset, then all-gather rows + masks across processes — every host
    ends up with the identical ``(P·M, 7)`` replicated tensor.
    Single-process is the identity.  ``allgather`` is injectable for
    single-process testing.
    """
    if num_shards <= 1:
        return targets, mask
    if allgather is None:  # pragma: no cover - needs a real multi-host run
        from jax.experimental import multihost_utils

        allgather = multihost_utils.process_allgather
    t = np.array(targets, np.float32, copy=True)
    t[:, 0] += rank * local_batch  # padding rows are masked; offset is inert
    gt = np.asarray(allgather(t))  # (P, M, 7), process-ordered
    gm = np.asarray(allgather(np.asarray(mask)))  # (P, M)
    return gt.reshape(-1, t.shape[-1]), gm.reshape(-1)
