"""Golden tests for the closed-form pricing oracles (SURVEY.md §4 test plan)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import norm

from deepfbsdejsolvers_tpu.models.merton import make_merton_default
from deepfbsdejsolvers_tpu.models.variance_gamma import make_vg_default


def _merton_price_scipy(X, K, T, r, sig, lam, muJ, sigJ, limit=30):
    """Independent float64 Merton series (pricingModels.py:40-48 semantics)."""
    kbar = math.exp(muJ + 0.5 * sigJ**2) - 1.0
    lam2 = lam * (kbar + 1.0)

    def bs(X, K, r_, s_, tau):
        d1 = (math.log(X / K) + (r_ + s_**2 / 2) * tau) / (s_ * math.sqrt(tau))
        d2 = d1 - s_ * math.sqrt(tau)
        return X * norm.cdf(d1) - K * math.exp(-r_ * tau) * norm.cdf(d2)

    tot = 0.0
    for k in range(limit):
        rk = r - lam * kbar + k * (muJ + 0.5 * sigJ**2) / T
        sk = math.sqrt(sig**2 + k * sigJ**2 / T)
        w = math.exp(-lam2 * T) * (lam2 * T) ** k / math.factorial(k)
        tot += w * bs(X, K, rk, sk, T)
    return tot


def test_merton_series_price_matches_scipy():
    m = make_merton_default()
    got = m.price_at_origin()
    want = _merton_price_scipy(1.0, 0.9, 1.0, 0.1, 0.3, 3.0, 0.0, 0.2)
    assert abs(got - want) < 5e-6


def test_merton_price_batched_and_steps():
    m = make_merton_default()
    xs = jnp.asarray([0.7, 0.9, 1.0, 1.4], jnp.float32)
    for i in (0, 10, 49):
        tau = m.T - i * m.dt
        got = np.asarray(m.price(jnp.asarray(i), xs))
        want = np.array([
            _merton_price_scipy(float(x), 0.9, tau, 0.1, 0.3, 3.0, 0.0, 0.2)
            for x in xs
        ])
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_merton_price_monotone_in_spot():
    m = make_merton_default()
    xs = jnp.linspace(0.5, 2.0, 64)
    p = np.asarray(m.price(jnp.asarray(5), xs))
    assert np.all(np.diff(p) > 0)
    # price >= discounted intrinsic lower bound
    assert np.all(p >= np.maximum(np.asarray(xs) - 0.9, 0.0) - 1e-5)


def test_vg_fft_vs_invfourier_cross_check():
    """The reference ships two independent VG pricers (#2 vs #3 in SURVEY §2);
    they must agree."""
    fft = make_vg_default(pricer="fft")
    inv = make_vg_default(pricer="invfourier")
    for i in (0, 15, 29):
        xs = jnp.asarray([0.8, 1.0, 1.3], jnp.float32)
        a = np.asarray(fft.price_fft(jnp.asarray(i), xs))
        b = np.asarray(inv.price_invfourier(jnp.asarray(i), xs))
        np.testing.assert_allclose(a, b, atol=5e-5)


def test_vg_price_sane():
    vg = make_vg_default()
    p = vg.price_at_origin()
    # At-the-money call, T=1, r=0.1: must exceed discounted intrinsic 1-K*e^-r
    assert 1.0 - math.exp(-0.1) < p < 0.5
    # martingale correction value (pricingModels.py:141)
    want_corr = -math.log(1.0 - (-0.1) * 0.1 - 0.05 * 0.04) / 0.1
    assert abs(vg.correction - want_corr) < 1e-12
