"""Structured metrics logging.

The reference's only observability is a per-outer-epoch ``print`` of loss /
cumulative seconds / current Y0 (SolversJumpDiff.py:70, MFGSolvers.py:89) with
histories kept in Python lists; mainMFGComparison even tries to reload results
from CSVs nothing wrote (:146-147).  Here every experiment emits an append-only
JSONL stream that scripts and notebooks can re-read deterministically.
"""

from __future__ import annotations

import json
import os
import time
from typing import IO, Any, Dict, Optional


def _jsonable(v: Any) -> Any:
    """Best-effort conversion of jax/numpy scalars and arrays to JSON types."""
    if hasattr(v, "item") and getattr(v, "ndim", None) == 0:
        return v.item()
    if hasattr(v, "tolist"):
        return v.tolist()
    return v


class JSONLWriter:
    """Append-only JSON-lines writer; one record per call, flushed eagerly so a
    crashed run still leaves a readable log."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._fh: Optional[IO[str]] = open(path, "a")

    def write(self, record: Dict[str, Any]) -> None:
        assert self._fh is not None, "writer is closed"
        self._fh.write(json.dumps({k: _jsonable(v) for k, v in record.items()}) + "\n")
        self._fh.flush()

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def __enter__(self) -> "JSONLWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class MetricsLogger:
    """Per-epoch metrics sink: optional JSONL file + optional stdout echo.

    Mirrors (and supersedes) the reference's per-epoch print format
    (SolversJumpDiff.py:70): every record carries the experiment/method tags
    plus a wall-clock timestamp.
    """

    def __init__(self, path: Optional[str] = None, tags: Optional[Dict[str, Any]] = None,
                 echo: bool = False):
        self._writer = JSONLWriter(path) if path else None
        self._tags = dict(tags or {})
        self._echo = echo
        self._t0 = time.time()

    def log(self, **metrics: Any) -> None:
        record = {**self._tags, "wall_s": round(time.time() - self._t0, 3), **metrics}
        if self._writer is not None:
            self._writer.write(record)
        if self._echo:
            print(" ".join(f"{k}={_jsonable(v)}" for k, v in record.items()))

    def child(self, **extra_tags: Any) -> "MetricsLogger":
        """A logger sharing this file but with additional fixed tags."""
        c = MetricsLogger.__new__(MetricsLogger)
        c._writer = self._writer
        c._tags = {**self._tags, **extra_tags}
        c._echo = self._echo
        c._t0 = self._t0
        return c

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()


def read_jsonl(path: str) -> list:
    """Load a JSONL metrics file back into a list of dicts."""
    out = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out
