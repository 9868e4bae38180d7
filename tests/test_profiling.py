"""utils/profiling.py: trace-derived device seconds + MFU accounting."""
import gzip
import json
import os

import numpy as np

from adyolo_tpu.utils.profiling import _trace_device_seconds, mfu, benchmark


def _write_trace(tmp_path, events):
    d = os.path.join(str(tmp_path), "plugins", "profile", "2026_01_01_00_00_00")
    os.makedirs(d)
    with gzip.open(os.path.join(d, "vm.trace.json.gz"), "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_trace_device_seconds_sums_top_level_jit_events(tmp_path):
    events = [
        {"ph": "M", "name": "process_name", "pid": 1,
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "name": "process_name", "pid": 2,
         "args": {"name": "/host:CPU"}},
        # two top-level programs on the TPU lane: 1500 + 500 us
        {"ph": "X", "pid": 1, "name": "jit_step(123)", "dur": 1500.0},
        {"ph": "X", "pid": 1, "name": "jit_fwd(456)", "dur": 500.0},
        # fusions inside the programs must NOT be double-counted
        {"ph": "X", "pid": 1, "name": "fusion.7", "dur": 1400.0},
        # host-lane events must be ignored
        {"ph": "X", "pid": 2, "name": "jit_step(123)", "dur": 9999.0},
    ]
    logdir = _write_trace(tmp_path, events)
    assert abs(_trace_device_seconds(logdir) - 2000e-6) < 1e-12


def test_trace_device_seconds_none_when_no_device_events(tmp_path):
    events = [
        {"ph": "M", "name": "process_name", "pid": 2,
         "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 2, "name": "jit_step(123)", "dur": 100.0},
    ]
    logdir = _write_trace(tmp_path, events)
    assert _trace_device_seconds(logdir) is None
    assert _trace_device_seconds(str(tmp_path / "nonexistent")) is None


def test_benchmark_cpu_fallback_wall_clock():
    import jax
    import jax.numpy as jnp

    dt = benchmark(jax.jit(lambda x: x * 2), jnp.ones((32, 32)),
                   iters=2, warmup=1)
    assert dt > 0


def test_mfu_known_device():
    class FakeDev:
        device_kind = "TPU v5 lite"

    assert abs(mfu(197e12, 1.0, FakeDev()) - 1.0) < 1e-9
    class Unknown:
        device_kind = "mystery"

    assert mfu(197e12, 1.0, Unknown()) is None
