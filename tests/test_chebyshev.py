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


def test_interp_1d_multi_matches_per_column(rng_key):
    from deepfbsdejsolvers_tpu.ops.chebyshev import interp_1d_multi

    x = jnp.linspace(0.2, 2.5, 513)
    f = lambda t: jnp.stack([jnp.tanh(t), jnp.exp(-t), t**2], -1)
    got = interp_1d_multi(f, x, 16)
    for k, col in enumerate((jnp.tanh(x), jnp.exp(-x), x**2)):
        ref = interp_1d(lambda t, k=k: f(t)[..., k], x, 16)
        np.testing.assert_allclose(np.asarray(got[:, k]), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got[:, k]), np.asarray(col),
                                   rtol=1e-3, atol=1e-4)


def test_head_interp_matches_direct(rng_key):
    m = make_merton_default()
    sd = PricingSolver(m, "global")
    sc = PricingSolver(m, "global", head_interp="chebyshev")
    params = sd.init_params(jax.random.key(0))
    x = jnp.abs(jax.random.normal(rng_key, (2048,)) * 0.25 + 1.0) + 0.05
    a = np.asarray(sd._uz(params, 5, x))
    b = np.asarray(sc._uz(params, 5, x))
    assert np.max(np.abs(a - b)) < 1e-4
    # tiny batches (the Y0 readout) bypass collocation entirely
    x1 = m.init_x(1)
    np.testing.assert_array_equal(np.asarray(sd._uz(params, 0, x1)),
                                  np.asarray(sc._uz(params, 0, x1)))


def test_interp_2d_accuracy():
    from deepfbsdejsolvers_tpu.ops.chebyshev import interp_2d

    key = jax.random.key(3)
    x = jnp.abs(jax.random.normal(key, (1024,)) * 0.3 + 1.0) + 0.05
    y = jax.random.normal(jax.random.fold_in(key, 1), (1024,)) * 0.2
    f = lambda a, b: jnp.tanh(a) * jnp.exp(b) + 0.3 * a * b

    def fn(xa, yb):
        return f(xa[:, None], yb[None, :])

    got = interp_2d(fn, x, y, 16, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(f(x, y)),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("scheme,regime", [
    ("global", "jd"), ("multistep2", "jd"), ("multistep1", "jd"),
    ("global", "pj"), ("sumlocal1", "pj"),
])
def test_gamma_interp_matches_direct(scheme, regime, rng_key):
    from deepfbsdejsolvers_tpu.models.variance_gamma import make_vg_default

    model = make_merton_default() if regime == "jd" else make_vg_default()
    sd = PricingSolver(model, scheme)
    sc = PricingSolver(model, scheme, gamma_interp="chebyshev")
    params = sd.init_params(jax.random.key(0))
    use_gam = "gam" in params and scheme not in ("multistep1", "sumlocal1")
    x = jnp.abs(jax.random.normal(rng_key, (2048,)) * 0.25 + 1.0) + 0.05
    j = model.sample_jumps(jax.random.fold_in(rng_key, 1), (2048,))
    a = np.asarray(sd._gamma_realized(params, 5, x, j, use_gam))
    b = np.asarray(sc._gamma_realized(params, 5, x, j, use_gam))
    assert np.max(np.abs(a - b)) < 5e-4, (scheme, regime)


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
