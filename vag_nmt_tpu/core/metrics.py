"""Structured metrics logging: JSONL stream + human-readable stdout.

Replaces the reference's print-and-logfile logging (SURVEY.md C17, §5).
`sentences/sec/chip` is the north-star metric, so timing helpers fence with
`block_until_ready` to avoid reporting async-dispatch mirages."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from typing import Any, Dict, IO, Optional

import jax


class MetricsLogger:
    def __init__(self, jsonl_path: Optional[str] = None, stream: IO = sys.stdout):
        self._stream = stream
        self._fh: Optional[IO] = None
        if jsonl_path:
            Path(jsonl_path).parent.mkdir(parents=True, exist_ok=True)
            self._fh = open(jsonl_path, "a", buffering=1)

    def log(self, tag: str, **fields: Any) -> None:
        rec: Dict[str, Any] = {"tag": tag, "time": time.time(), **fields}
        if self._fh is not None:
            self._fh.write(json.dumps(rec) + "\n")
        human = " ".join(
            f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
            for k, v in fields.items()
        )
        self._stream.write(f"[{tag}] {human}\n")

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None


class StepTimer:
    """Wall-clock timer that fences on device completion."""

    def __init__(self):
        self._t0 = 0.0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, *fence_on) -> float:
        for x in fence_on:
            jax.block_until_ready(x)
        return time.perf_counter() - self._t0
