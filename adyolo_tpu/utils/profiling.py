"""Tracing / profiling harness.

The reference has no profiling beyond coarse ``time.time()`` phase timers
(SURVEY.md §5); this module provides:

* :func:`trace` — context manager wrapping ``jax.profiler`` so any phase
  of training/eval can be captured for TensorBoard/Perfetto inspection;
* :class:`PhaseTimer` — the coarse per-phase wall-clock timing the
  reference prints (train.py:172-174,209-215), structured;
* :func:`throughput_audio_s` — the BASELINE headline metric
  (audio-seconds per wall-clock second) from a timed step.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Iterator, Optional

__all__ = ["trace", "PhaseTimer", "throughput_audio_s", "benchmark",
           "compiled_flops", "device_peak_flops", "mfu"]

# Dense peak FLOP/s by device kind (bf16 MXU peak — the number MFU is
# conventionally quoted against; f32-precision matmuls use multi-pass
# bf16 and land proportionally lower).
_PEAK_FLOPS = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
}


def device_peak_flops(device=None) -> Optional[float]:
    """Dense bf16 peak FLOP/s of the device, or None when unknown."""
    import jax

    device = device or jax.devices()[0]
    return _PEAK_FLOPS.get(getattr(device, "device_kind", ""), None)


def compiled_flops(jitted, *args, **kwargs) -> Optional[float]:
    """Analytic FLOPs of one invocation from XLA's compiled cost analysis.

    The *optimized* program's analysis is the honest numerator for MFU
    (pre-lowering counts include ops that fuse or DCE away).  The AOT
    compile here is a second compilation of the program the caller is
    about to run, but the persistent compilation cache (enabled by
    bench/cli entry points) makes it a cache hit."""
    try:
        ca = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax returns [dict]
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def mfu(flops_per_step: Optional[float], step_seconds: float,
        device=None) -> Optional[float]:
    """Model FLOPs utilization: achieved/peak, or None when either side
    is unknown."""
    peak = device_peak_flops(device)
    if not flops_per_step or not peak:
        return None
    return flops_per_step / step_seconds / peak


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into ``logdir`` (no-op when None)."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates wall-clock seconds per named phase."""

    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        return ", ".join(f"{k}: {v:0.2f}s" for k, v in self.totals.items())


def _trace_device_seconds(logdir: str) -> Optional[float]:
    """Total device-side execution seconds of top-level XLA programs in a
    jax.profiler trace directory (sums ``jit_*`` / entry-computation events
    on device lanes).  Returns None when the trace has no device events
    (e.g. CPU backend)."""
    import glob
    import gzip
    import json

    paths = glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        return None
    with gzip.open(sorted(paths)[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {e["pid"]: e.get("args", {}).get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu_pids = sorted(p for p, n in pid_names.items()
                      if "TPU" in n or "GPU" in n.upper())
    if not tpu_pids:
        return None
    # one device lane only: with multiple participating devices every lane
    # carries its own copy of the top-level program event, and summing
    # across lanes would overcount by the device count
    pid0 = tpu_pids[0]
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") != pid0:
            continue
        name = e.get("name", "")
        # top-level executable events carry the jit program name
        if name.startswith("jit_") or name.startswith("jit("):
            total += e.get("dur", 0.0)
    return total * 1e-6 if total > 0 else None


def benchmark(fn: Callable, *args, iters: int = 20, warmup: int = 3) -> float:
    """Steady-state seconds/call, measured honestly.

    On this TPU stack ``block_until_ready`` can return before device
    execution finishes (remote-tunneled PJRT), so wall-clock around a call
    loop under-reports arbitrarily.  The ground truth is the device
    timeline: run the loop under a ``jax.profiler`` trace and sum the
    top-level program durations.  Falls back to wall-clock when the trace
    has no device events (CPU backend) — where blocking semantics hold.
    """
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    def sync(x):
        # a host fetch is the only operation guaranteed to drain the device
        # queue on this stack; fetch one tiny reduced scalar
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(jnp.sum(leaf))

    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    with tempfile.TemporaryDirectory() as logdir:
        jax.profiler.start_trace(logdir)
        try:
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            sync(out)
            wall = (time.perf_counter() - t0) / iters
        finally:
            jax.profiler.stop_trace()
        dev = _trace_device_seconds(logdir)
    if dev is not None:
        return dev / iters
    if jax.default_backend() != "cpu":
        # On a device backend an empty trace means the event-name matching
        # broke (profiler format drift) — falling back to wall-clock would
        # silently publish numbers this stack under-reports by orders of
        # magnitude, so fail loudly instead.
        raise RuntimeError(
            "benchmark(): no device program events matched in the profiler "
            "trace on a non-CPU backend; refusing to report wall-clock")
    return wall


def throughput_audio_s(batch: int, clip_seconds: float, step_seconds: float) -> float:
    return batch * clip_seconds / step_seconds
