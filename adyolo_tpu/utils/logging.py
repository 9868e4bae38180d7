"""Structured experiment logging.

The reference optionally streams per-epoch channels to neptune.ai
(``src/train.py:264-279``, ``src/utils/utility.py:102-139``).  Here the
default sink is a local JSONL file (one ``{"channel": ..., "value": ...,
"step": ...}`` record per log call) — machine-readable, diffable, no
network — with the same channel naming so a neptune adapter can be
plugged in via the same interface.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

__all__ = ["JsonlLogger", "NullLogger"]


class NullLogger:
    def log(self, channel: str, value: Any, step: Optional[int] = None) -> None:
        pass

    def log_params(self, params: Dict[str, Any]) -> None:
        pass

    def stop(self) -> None:
        pass


class JsonlLogger(NullLogger):
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        self._f = open(path, "a", buffering=1)

    def log(self, channel: str, value: Any, step: Optional[int] = None) -> None:
        rec = {"t": time.time(), "channel": channel, "value": value}
        if step is not None:
            rec["step"] = step
        self._f.write(json.dumps(rec) + "\n")

    def log_params(self, params: Dict[str, Any]) -> None:
        self.log("parameters", {k: repr(v) for k, v in params.items()})

    def stop(self) -> None:
        self._f.close()
