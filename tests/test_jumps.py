"""Moment tests for the on-device jump samplers (SURVEY.md §4 test plan).

The reference draws with tf.random.{poisson,gamma,normal}
(pricingModels.py:57-61,188-191); here jax.random must reproduce the laws.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from deepfbsdejsolvers_tpu.models.merton import make_merton_default
from deepfbsdejsolvers_tpu.models.variance_gamma import make_vg_default
from deepfbsdejsolvers_tpu.ops.compensator import (
    CompensatorSpec,
    compound_poisson_quadrature,
    gamma_subordinated_quadrature,
)

N_SAMPLES = 400_000


def test_merton_compound_poisson_moments(rng_key):
    m = make_merton_default()
    j = np.asarray(m.sample_jumps(rng_key, (N_SAMPLES,)))
    lam_dt = 3.0 * m.dt
    mu, sig = 0.0, 0.2
    # E[J] = lam_dt*mu ; Var[J] = lam_dt*(mu^2+sig^2)
    want_mean = lam_dt * mu
    want_var = lam_dt * (mu**2 + sig**2)
    assert abs(j.mean() - want_mean) < 4e-4
    assert abs(j.var() - want_var) < 4e-4
    # P(J == 0) = P(no jump) = exp(-lam_dt)
    p0 = (j == 0).mean()
    assert abs(p0 - math.exp(-lam_dt)) < 2e-3


def test_vg_increment_moments(rng_key):
    vg = make_vg_default()
    j = np.asarray(vg.sample_jumps(rng_key, (N_SAMPLES,)))
    dt, kappa, theta, sigJ = vg.dt, 0.1, -0.1, 0.2
    # G ~ Gamma(dt/kappa, scale kappa): E[G]=dt, Var[G]=kappa*dt
    # E[J] = theta*dt ; Var[J] = sigJ^2*dt + theta^2*kappa*dt
    want_mean = theta * dt
    want_var = sigJ**2 * dt + theta**2 * kappa * dt
    assert abs(j.mean() - want_mean) < 4e-4
    assert abs(j.var() - want_var) < 4e-4


def test_merton_quadrature_matches_mc_expectation(rng_key):
    """Quadrature over the compound-Poisson law integrates smooth test
    functions to the same value as a large MC sweep."""
    m = make_merton_default()
    spec = CompensatorSpec(n_poisson_max=8, n_hermite=16)
    nodes, weights = compound_poisson_quadrature(3.0 * m.dt, 0.0, 0.2, spec)
    samples = np.asarray(m.sample_jumps(rng_key, (2_000_000,)))
    for fn in (lambda x: np.exp(x), lambda x: x**2, lambda x: np.abs(x),
               lambda x: np.maximum(np.exp(x) - 1.0, 0)):
        q = float(np.sum(weights * fn(nodes)))
        mc = float(fn(samples).mean())
        assert abs(q - mc) < 4e-4, (q, mc)


def test_vg_quadrature_matches_mc_expectation(rng_key):
    vg = make_vg_default()
    spec = CompensatorSpec(n_laguerre=24, n_hermite=16)
    nodes, weights = gamma_subordinated_quadrature(
        vg.dt / 0.1, 0.1, -0.1, 0.2, spec)
    samples = np.asarray(vg.sample_jumps(rng_key, (2_000_000,)))
    for fn in (lambda x: np.exp(x), lambda x: x**2, lambda x: np.exp(-x**2)):
        q = float(np.sum(weights * fn(nodes)))
        mc = float(fn(samples).mean())
        assert abs(q - mc) < 2e-3, (q, mc)


def test_quadrature_weights_normalized():
    m = make_merton_default()
    vg = make_vg_default()
    spec = CompensatorSpec()
    for nodes, weights in (m.jump_quadrature(spec), vg.jump_quadrature(spec)):
        assert abs(float(jnp.sum(weights)) - 1.0) < 1e-6


def test_mfg_icdf_cox_sampler_matches_exact_law(rng_key):
    """The truncated inverse-CDF Cox sampler matches jax.random.poisson's
    moments at a per-path rate large enough to exercise multiple counts."""
    import dataclasses

    from deepfbsdejsolvers_tpu.models.mfg_smart_grid import make_mfg_default

    model = make_mfg_default(jump_factor=12.0, jump_model="constant")
    model_icdf = dataclasses.replace(model, jump_sampler="icdf")
    state = model.init_state(400_000)
    d_exact, comp = model.sample_dN(rng_key, state)
    d_icdf, comp2 = model_icdf.sample_dN(rng_key, state)
    lam_dt = float(comp[0])
    assert lam_dt > 0.1  # multiple-count regime
    for d in (np.asarray(d_exact), np.asarray(d_icdf)):
        assert abs(d.mean() - lam_dt) < 4e-3
        assert abs(d.var() - lam_dt) < 8e-3
    np.testing.assert_array_equal(np.asarray(comp), np.asarray(comp2))
