"""Device mesh + sharding helpers.

The reference trains on a single ``cuda:0`` device (SURVEY.md §2.3); this
framework data-parallelizes over a ``jax.sharding.Mesh``:

* a ``data`` axis shards the batch (and the padded AD-YOLO target
  tensor) across chips; under pure DP parameters/optimizer state are
  replicated;
* a ``model`` axis provides Megatron-style tensor parallelism of the
  conformer FFN/MHSA (``state_shardings`` below; ``--model_parallel N``
  on the CLI).  The models are ~25 M params, so TP is off by default —
  it exists for the serving/scale story and is parity-tested on the
  virtual mesh (tests/test_tp_mesh.py).

Gradient all-reduce (DP) and the row-parallel psums (TP) are inserted by
XLA from the sharding annotations and ride ICI — no hand-written
collectives needed at this scale.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch",
           "place_multihost", "globalize_yolo_targets", "state_shardings"]


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


# ---------------------------------------------------------------------------
# Tensor parallelism over the ``model`` axis (Megatron-style pairing).
#
# Sharding is declarative: these PartitionSpecs annotate the parameter /
# optimizer-state leaves and XLA's SPMD partitioner propagates them through
# the computation and inserts the collectives (an all-reduce after each
# row-parallel matmul) — no hand-written comms.
#
# v1 scope (chosen so every split boundary aligns with a shard boundary):
#   * conformer FFN:   Dense_0 column-parallel (kernel (d, 4d) sharded on
#     the 4d output; its bias and the hidden activations follow), Dense_1
#     row-parallel (kernel (4d, d) sharded on the 4d input; XLA inserts the
#     psum).  The intervening swish+dropout run on the sharded hidden.
#   * conformer MHSA:  query/key/value column-parallel — the 256-wide
#     output dim shards across heads (tp must divide the head count) —
#     and the output ``linear`` row-parallel.
#   * everything else replicated: the ResNet conv front (frequency-packed
#     layouts), the GLU pointwise convs (a 2-way feature split whose halves
#     must pair elementwise — sharding them needs interleaved layouts), the
#     GRU (3 concatenated gates, same issue), norms, heads.
# The fused MHSA Pallas kernel has no SPMD partitioning rule — set
# ADYOLO_FLASH_MHSA=0 when model_parallel > 1 (the XLA attention path
# shards cleanly).
# ---------------------------------------------------------------------------

# (module-name, param-name) -> partition pattern; "col" shards the last
# dim, "row" the first, "vec" a 1-D bias that follows a column-parallel out
_TP_RULES = {
    ("query", "kernel"): "col", ("key", "kernel"): "col",
    ("value", "kernel"): "col",
    ("query", "bias"): "vec", ("key", "bias"): "vec", ("value", "bias"): "vec",
    ("linear", "kernel"): "row",
    ("Dense_0", "kernel"): "col", ("Dense_0", "bias"): "vec",
    ("Dense_1", "kernel"): "row",
    # conformer conv module: pw1 column-parallel puts each GLU half
    # wholly on one shard (the a*sigmoid(b) gate costs one regather,
    # inserted by GSPMD); the depthwise conv and bn2 stay channel-sharded
    # and pw2 closes row-parallel with a psum
    ("conv", "dw_kernel"): "col", ("conv", "dw_bias"): "vec",
    ("pw1", "kernel"): "col", ("pw1", "bias"): "vec",
    ("bn1", "scale"): "vec", ("bn1", "bias"): "vec",
    ("bn2", "scale"): "vec", ("bn2", "bias"): "vec",
    ("bn1", "mean"): "vec", ("bn1", "var"): "vec",
    ("bn2", "mean"): "vec", ("bn2", "var"): "vec",
    ("pw2", "kernel"): "row",
}
# rules only fire inside these module scopes (SE-ResNet's attention-pool
# 'W', the ResNet-block bn1/bn2, or a head Dense must not match by
# accident — 'conv' only matches the conformer blocks' conv module
# because the scope test requires an enclosing conformer/mhsa/ffn name)
_TP_SCOPES = ("mhsa", "ffn", "conformer")


def _tp_spec(path_keys, leaf, axis: str, tp: int):
    """PartitionSpec for one state leaf from its tree path (works for the
    params tree and for optimizer moments, whose subtrees repeat the same
    path tail)."""
    names = [getattr(k, "key", getattr(k, "name", None)) for k in path_keys]
    names = [n for n in names if isinstance(n, str)]
    if len(names) >= 2 and any(any(s.startswith(scope) for scope in _TP_SCOPES)
                               for s in names):
        kind = _TP_RULES.get((names[-2], names[-1]))
        shape = getattr(leaf, "shape", ())
        if kind == "col" and len(shape) == 2 and shape[1] % tp == 0:
            return P(None, axis)
        if kind == "row" and len(shape) == 2 and shape[0] % tp == 0:
            return P(axis, None)
        if kind == "vec" and len(shape) == 1 and shape[0] % tp == 0:
            return P(axis)
    return P()


def state_shardings(state: Any, mesh: Mesh) -> Any:
    """NamedShardings for a TrainState pytree: replicated under pure DP;
    under ``model_parallel > 1`` the TP rules above shard the matching
    parameter AND optimizer-moment leaves (their paths share the tail)."""
    model_axis = mesh.axis_names[1] if len(mesh.axis_names) > 1 else None
    tp = mesh.shape.get(model_axis, 1) if model_axis else 1
    if tp <= 1:
        repl = NamedSharding(mesh, P())
        return jax.tree.map(lambda _: repl, state)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, _tp_spec(path, leaf, model_axis, tp)), state)


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
