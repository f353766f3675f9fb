"""Numerical-debug guards (SURVEY.md §5: the JAX-world substitute for
sanitizers — there is nothing to race-detect in single-program SPMD, but NaN
poisoning in a 50-step scan is this workload's equivalent failure mode).

``nan_guard()`` flips ``jax_debug_nans`` for a scope: every jitted function
re-runs un-jitted when its output contains a NaN and raises at the exact
primitive that produced it, instead of silently training on poisoned buffers.
Costs nothing when no NaN occurs (checks happen on already-materialized
outputs); keep it OFF for benchmark runs — it forces a device sync per call.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def nan_guard(enable: bool = True):
    """Context manager: raise (with the offending primitive) on any NaN
    produced inside jitted code while the scope is active."""
    if not enable:
        yield
        return
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
