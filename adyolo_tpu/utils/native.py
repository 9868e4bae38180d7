"""Shared loader for the bundled C++ kernels (Hungarian, NMS).

Compiles ``native/<name>.cpp`` to ``lib<name>.so`` on first use (cached by
mtime), binding via ctypes.  The build writes to a process-unique temp
path and ``os.replace``s into place so concurrent processes (pytest
workers, multiple hosts on a shared FS) never dlopen a half-written
object.  Failures return None and callers fall back to their pure-python
paths.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")

_cache: Dict[str, Optional[ctypes.CDLL]] = {}


def load_or_build(name: str) -> Optional[ctypes.CDLL]:
    """Return the CDLL for ``native/<name>.cpp``, building if stale."""
    if name in _cache:
        return _cache[name]
    src = os.path.join(_NATIVE_DIR, f"{name}.cpp")
    lib = os.path.join(_NATIVE_DIR, f"lib{name}.so")
    handle: Optional[ctypes.CDLL] = None
    try:
        if (not os.path.exists(lib)
                or os.path.getmtime(lib) < os.path.getmtime(src)):
            tmp = f"{lib}.{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", tmp, src],
                check=True, capture_output=True,
            )
            os.replace(tmp, lib)  # atomic vs concurrent builders
        handle = ctypes.CDLL(lib)
    except Exception:
        handle = None
    _cache[name] = handle
    return handle
