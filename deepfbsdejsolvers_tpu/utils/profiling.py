"""Profiling hooks and throughput metering.

The reference's only instrument is ``time.time()`` bracketing of the inner
epoch loop (SolversJumpDiff.py:61-67).  Rebuild per SURVEY.md §5:
``jax.profiler`` trace capture plus a paths·steps/sec/chip meter — the
BASELINE.json primary metric.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace_profile(logdir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace (TensorBoard/XProf format) around a block.
    No-op when ``logdir`` is None, so call sites can pass the flag through."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Measures paths·steps/sec (/chip) over explicit mark() windows.

    Usage::

        meter = ThroughputMeter(paths_per_step=batch, sde_steps=model.N)
        meter.start()
        ... run k train steps, block_until_ready ...
        rate = meter.mark(k)["paths_steps_per_sec"]
    """

    def __init__(self, paths_per_step: int, sde_steps: int, n_chips: int = 1):
        self.paths_per_step = paths_per_step
        self.sde_steps = sde_steps
        self.n_chips = max(1, n_chips)
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def mark(self, n_train_steps: int) -> dict:
        assert self._t0 is not None, "call start() first"
        elapsed = time.perf_counter() - self._t0
        self._t0 = time.perf_counter()
        work = self.paths_per_step * self.sde_steps * n_train_steps
        return {
            "elapsed_s": elapsed,
            "train_steps_per_sec": n_train_steps / elapsed,
            "paths_steps_per_sec": work / elapsed,
            "paths_steps_per_sec_per_chip": work / elapsed / self.n_chips,
        }
