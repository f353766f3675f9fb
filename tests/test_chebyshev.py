"""Chebyshev collocation tests (ops/chebyshev.py): interpolation accuracy on
smooth functions, exactness on polynomials, gradients, degenerate intervals,
and agreement of the chebyshev compensator path with the direct sweep."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfbsdejsolvers_tpu.models.merton import make_merton_default
from deepfbsdejsolvers_tpu.ops.chebyshev import (
    cheb_eval,
    cheb_fit,
    cheb_nodes,
    interp_1d,
)
from deepfbsdejsolvers_tpu.ops.compensator import CompensatorSpec
from deepfbsdejsolvers_tpu.solvers.pricing import PricingSolver


def test_exact_on_polynomials():
    """Degree-(C-1) interpolation reproduces polynomials of degree < C."""
    x = jnp.linspace(-2.0, 5.0, 513)

    def poly(t):
        return 0.3 * t**3 - t**2 + 4.0 * t - 1.0

    got = interp_1d(poly, x, n=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(poly(x)),
                               rtol=1e-5, atol=1e-4)


def test_geometric_convergence_on_analytic():
    x = jnp.linspace(0.1, 3.0, 1025)
    f = lambda t: jnp.tanh(2.0 * t) * jnp.exp(-t) + jnp.sin(3.0 * t)
    errs = []
    for n in (8, 16, 32):
        e = float(jnp.max(jnp.abs(interp_1d(f, x, n) - f(x))))
        errs.append(e)
    assert errs[1] < errs[0] * 1e-1
    assert errs[2] < 1e-5


def test_degenerate_interval():
    """All-equal x (the t=0 state of every pricing model) must not NaN."""
    x = jnp.full((64,), 1.0)
    got = interp_1d(lambda t: t**2 + 1.0, x, n=16)
    assert np.all(np.isfinite(np.asarray(got)))
    np.testing.assert_allclose(np.asarray(got), 2.0, atol=1e-5)


def test_gradients_flow():
    x = jnp.linspace(0.5, 2.0, 256)

    def loss(a):
        return jnp.sum(interp_1d(lambda t: jnp.tanh(a * t), x, 16) ** 2)

    g = jax.grad(loss)(0.7)
    g_ref = jax.grad(lambda a: jnp.sum(jnp.tanh(a * x) ** 2))(0.7)
    assert g == pytest.approx(float(g_ref), rel=1e-3)


def test_cheb_compensator_matches_direct(rng_key):
    """End-to-end: the chebyshev compensator agrees with the direct sweep to
    well below the 1e-3 Y0 gate, per step and at the loss level."""
    m = make_merton_default()
    quad = CompensatorSpec()
    cheb = CompensatorSpec(x_interp="chebyshev", n_cheb=32)
    sd = PricingSolver(m, "global", compensator=quad)
    sc = PricingSolver(m, "global", compensator=cheb)
    params = sd.init_params(jax.random.key(0))
    x = jnp.abs(jax.random.normal(rng_key, (2048,)) * 0.25 + 1.0) + 0.05
    j = m.sample_jumps(jax.random.fold_in(rng_key, 1), (2048,))
    km = jax.random.fold_in(rng_key, 2)
    _, cd = sd._gamma_and_compensator(params, 5, x, j, km)
    _, cc = sc._gamma_and_compensator(params, 5, x, j, km)
    assert float(jnp.max(jnp.abs(cd - cc))) < 5e-3
    # batch-mean agreement is much tighter (oscillatory error cancels)
    assert float(jnp.abs(jnp.mean(cd - cc))) < 2e-4

    ld = float(jax.jit(sd.build_loss(2048))(params, rng_key))
    lc = float(jax.jit(sc.build_loss(2048))(params, rng_key))
    assert lc == pytest.approx(ld, rel=3e-3)


def test_cheb_compensator_mc_mode(rng_key):
    """Chebyshev collocation composes with the faithful MC compensator: the
    same per-step node draw evaluated at 32 spot points matches the direct
    [n_mc, B] sweep."""
    m = make_merton_default()
    mc = CompensatorSpec(kind="mc", n_mc=512)
    mc_cheb = CompensatorSpec(kind="mc", n_mc=512, x_interp="chebyshev",
                              n_cheb=32)
    sd = PricingSolver(m, "global", compensator=mc)
    sc = PricingSolver(m, "global", compensator=mc_cheb)
    params = sd.init_params(jax.random.key(0))
    x = jnp.abs(jax.random.normal(rng_key, (2048,)) * 0.25 + 1.0) + 0.05
    j = m.sample_jumps(jax.random.fold_in(rng_key, 1), (2048,))
    km = jax.random.fold_in(rng_key, 2)  # same key -> same MC node draw
    _, cd = sd._gamma_and_compensator(params, 5, x, j, km)
    _, cc = sc._gamma_and_compensator(params, 5, x, j, km)
    assert float(jnp.max(jnp.abs(cd - cc))) < 5e-3
    assert float(jnp.abs(jnp.mean(cd - cc))) < 2e-4
