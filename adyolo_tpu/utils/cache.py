"""Persistent XLA compilation cache.

First compiles of the fused train step / bucketed eval programs cost
minutes; enabling JAX's persistent cache makes every later process reuse
them.  Called from every CLI/bench entry point.  Safe no-op when the
backend doesn't support executable serialization.
"""
from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

_DEFAULT_DIR = os.path.expanduser("~/.cache/adyolo_tpu_xla")


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("ADYOLO_TPU_CACHE_DIR", _DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # cache is an optimization, never a hard failure
        print(f"[adyolo_tpu] compilation cache disabled: {e}")
