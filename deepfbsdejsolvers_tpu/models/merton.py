"""Merton jump-diffusion pricing model (forward-backward coupled).

Behavioral parity with the reference ``MertonJumpModel``
(coupledPricing/pricingModels.py:10-69):

* forward asset   X_{i+1} = X_i * exp((r - σ²/2 - λκ̄) dt + σ dW + J)
                            + func(Y - A(i, X_i)) * dt        (:53-54)
  where κ̄ = e^{μJ+σJ²/2} - 1 and J is a compound-Poisson sum over dt (:57-61),
* closed-form Merton call price A(t, X) as a Poisson-weighted power series of
  Black-Scholes prices (:40-48),
* driver f(Y) = -rY (:64-65) and payoff g(X) = (X-K)+ (:68-69).

TPU-first design
----------------
The reference recomputes the `limit`-term series *inside the drift at every
timestep of every gradient step* — including fresh `tf.range`/`tile`/`lgamma`
work per call.  Here the step-dependent series coefficients depend only on the
step index, so they are precomputed once at model build into (N, limit) device
tables; ``price(i, X)`` inside the ``lax.scan`` rollout is a gather of row ``i``
plus a vectorized ndtr sweep (the only per-sample transcendentals).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import ndtr

from deepfbsdejsolvers_tpu.ops.compensator import (
    CompensatorSpec,
    compound_poisson_quadrature,
)


def abs_coupling(a_lin: float) -> Callable[[jax.Array], jax.Array]:
    """The reference's forward-backward coupling func(x)=aLin*|x|
    (mainMerton.py:60-61)."""

    def func(x):
        return a_lin * jnp.abs(x)

    return func


@dataclasses.dataclass(frozen=True)
class MertonJumpModel:
    """Pure-functional Merton model. All methods are jit/scan-safe.

    Parameters mirror pricingModels.py:11-24; ``coupling`` is the functor
    injected into the forward drift (``func`` there).
    """

    regime = "jump_diffusion"  # has a Brownian Z·dW term in the BSDE

    T: float
    N: int
    r: float
    muJ: float
    sigJ: float
    sigma: float
    lam: float
    K: float
    x0: float
    coupling: Callable[[jax.Array], jax.Array]
    limit: int = 30
    # "series" evaluates the power series exactly per call (reference
    # semantics).  "table" precomputes per-step price curves on a fine
    # log-moneyness grid and cubic-interpolates (4 gathers/eval — measured
    # gather-bound on TPU, kept for CPU/host use).  "chebyshev" evaluates the
    # exact series at 64 Chebyshev points spanning the batch's spot range and
    # reconstructs per path by Clenshaw — no gathers, ~1e-7 accurate (the
    # series is analytic in x), ~1.8x end-to-end on TPU (BASELINE.md).
    price_mode: str = "series"
    n_cheb_price: int = 64
    # "exact" draws Poisson via jax.random.poisson (rejection-based);
    # "icdf" inverts the CDF truncated at 1e-9 tail mass — cheaper on TPU
    # (k_max compares on the VPU, no rejection loop), law equal to 1e-9.
    jump_sampler: str = "exact"
    table_points: int = 4097
    table_log_m_max: float = 5.0

    def __post_init__(self):
        if self.price_mode not in ("series", "table", "chebyshev"):
            raise ValueError(
                f"price_mode must be series|table|chebyshev, got {self.price_mode!r}")
        if self.jump_sampler not in ("exact", "icdf"):
            raise ValueError(f"jump_sampler must be exact|icdf, got {self.jump_sampler!r}")
        dt = self.T / self.N
        kbar = math.exp(self.muJ + 0.5 * self.sigJ**2) - 1.0
        lam2 = self.lam * (kbar + 1.0)

        i = np.arange(self.N, dtype=np.float64)[:, None]      # (N, 1) step index
        k = np.arange(self.limit, dtype=np.float64)[None, :]  # (1, limit) series term
        tau = self.T - i * dt                                  # (N, 1) time to maturity
        # Series parameters, pricingModels.py:43-47.
        r_bs = self.r - self.lam * kbar + k * (self.muJ + 0.5 * self.sigJ**2) / tau
        sig_bs = np.sqrt(self.sigma**2 + k * self.sigJ**2 / tau)
        from scipy.special import gammaln

        log_coeff = -lam2 * tau + k * np.log(lam2 * tau) - gammaln(k + 1.0)
        coeff = np.exp(log_coeff)
        object.__setattr__(self, "_dt", float(dt))
        object.__setattr__(self, "_kbar", float(kbar))
        object.__setattr__(self, "_tau", jnp.asarray(tau[:, 0], jnp.float32))
        object.__setattr__(self, "_r_bs", jnp.asarray(r_bs, jnp.float32))
        object.__setattr__(self, "_sig_bs", jnp.asarray(sig_bs, jnp.float32))
        object.__setattr__(self, "_coeff", jnp.asarray(coeff, jnp.float32))

        if self.price_mode == "table":
            # (N, G) price curves over log-moneyness, float64 host precompute.
            from scipy.special import ndtr as ndtr64

            g = np.linspace(-self.table_log_m_max, self.table_log_m_max,
                            self.table_points)                 # (G,)
            x = self.K * np.exp(g)                             # (G,)
            sqrt_tau = np.sqrt(tau)                            # (N, 1)
            d1 = (g[None, :, None] + (r_bs + 0.5 * sig_bs**2)[:, None, :]
                  * tau[:, None, :]) / (sig_bs[:, None, :] * sqrt_tau[:, None, :])
            d2 = d1 - (sig_bs * sqrt_tau)[:, None, :]
            bs = (x[None, :, None] * ndtr64(d1)
                  - self.K * np.exp(-r_bs * tau)[:, None, :] * ndtr64(d2))
            table = np.einsum("ngl,nl->ng", bs, coeff)         # (N, G)
            object.__setattr__(self, "_price_table",
                               jnp.asarray(table, jnp.float32))
            object.__setattr__(self, "_g0", float(g[0]))
            object.__setattr__(self, "_dg", float(g[1] - g[0]))

        if self.jump_sampler == "icdf":
            # Truncated Poisson CDF: smallest k_max with tail mass <= 1e-9.
            from scipy.stats import poisson as sp_poisson

            lam_dt = self.lam * dt
            k_max = int(sp_poisson.ppf(1.0 - 1e-9, lam_dt)) + 1
            cdf = sp_poisson.cdf(np.arange(k_max), lam_dt)     # (k_max,)
            object.__setattr__(self, "_poisson_cdf",
                               jnp.asarray(cdf, jnp.float32))

    # ---- scalars -----------------------------------------------------------
    @property
    def dt(self) -> float:
        return self._dt

    @property
    def n_state_features(self) -> int:
        return 1  # X only; net inputs are [t, X]

    # ---- forward dynamics ---------------------------------------------------
    def init_x(self, batch: int) -> jax.Array:
        """X_0 (pricingModels.py:27-29)."""
        return jnp.full((batch,), self.x0, jnp.float32)

    def sample_jumps(self, key: jax.Array, shape) -> jax.Array:
        """Compound-Poisson jump sum over one dt (pricingModels.py:57-61):
        J = dN*μJ + σJ*sqrt(dN)*N(0,1), dN ~ Poisson(λ dt)."""
        k_n, k_g = jax.random.split(key)
        if self.jump_sampler == "icdf":
            # dN = #{k : cdf_k < U}; k_max comparisons on the VPU beat the
            # rejection loop of jax.random.poisson in the hot path.
            u = jax.random.uniform(k_n, shape, jnp.float32)
            dn = jnp.sum(u[..., None] > self._poisson_cdf, axis=-1,
                         dtype=jnp.float32)
        else:
            dn = jax.random.poisson(k_n, self.lam * self._dt, shape).astype(
                jnp.float32)
        z = jax.random.normal(k_g, shape, jnp.float32)
        return dn * self.muJ + self.sigJ * jnp.sqrt(dn) * z

    def step(self, i: jax.Array, x: jax.Array, dw: jax.Array, jump: jax.Array,
             y: jax.Array, price: Optional[jax.Array] = None) -> jax.Array:
        """One Euler step of the coupled forward SDE (pricingModels.py:53-54).

        ``price`` optionally supplies a precomputed A(i, X) (the solver's
        hoisted per-step Chebyshev tables); None evaluates :meth:`price`."""
        from deepfbsdejsolvers_tpu.ops.numerics import mul_exp

        drift = (self.r - 0.5 * self.sigma**2 - self.lam * self._kbar) * self._dt
        a = self.price(i, x) if price is None else price
        # mul_exp, not x*exp(·): the TPU VPU's f32 exp is biased ~−2.6e-6
        # near 0 and the defect compounds linearly over the N-step walk
        # (ops/numerics.py docstring; measured −2.9e-3 on E[X_N] at N=1600).
        return mul_exp(x, drift + self.sigma * dw + jump) + self.coupling(
            y - a
        ) * self._dt

    def uncoupled_log_increments(self, dw: jax.Array, jump: jax.Array) -> jax.Array:
        """Per-step log-X increments of the UNcoupled forward dynamics
        (coupling dropped): log x_{i+1} - log x_i = drift + sigma dW + J.
        Used to bound per-step X marginals from pre-drawn noise without
        running the coupled rollout (the coupling adds only O(aLin*dt) drift
        per step, absorbed by the caller's interval padding)."""
        drift = (self.r - 0.5 * self.sigma**2 - self.lam * self._kbar) * self._dt
        return drift + self.sigma * dw + jump

    # ---- closed-form pricer --------------------------------------------------
    def price(self, i: jax.Array, x: jax.Array) -> jax.Array:
        """Merton closed-form call price A(i*dt, x) (pricingModels.py:40-48).

        ``i`` may be a traced int in [0, N); tables are gathered per step.
        For i == N the reference returns g(x); use :meth:`payoff` there.
        """
        if self.price_mode == "table":
            from deepfbsdejsolvers_tpu.ops.interp import uniform_interp_cubic

            log_m = jnp.log(x / self.K)
            return uniform_interp_cubic(self._price_table[i], log_m,
                                        self._g0, self._dg)
        if (self.price_mode == "chebyshev" and x.ndim == 1
                and x.shape[0] >= 4 * self.n_cheb_price):
            # Collocate the exact series on the batch's spot range; direct
            # evaluation below stays the primitive (and the small-batch path).
            from deepfbsdejsolvers_tpu.ops.chebyshev import interp_1d

            return interp_1d(lambda xn: self._price_series(i, xn), x,
                             self.n_cheb_price)
        return self._price_series(i, x)

    def _price_series(self, i: jax.Array, x: jax.Array) -> jax.Array:
        """The exact `limit`-term power series (pricingModels.py:40-48)."""
        tau = self._tau[i]                          # ()
        r_bs = self._r_bs[i]                        # (limit,)
        sig_bs = self._sig_bs[i]                    # (limit,)
        coeff = self._coeff[i]                      # (limit,)
        log_m = jnp.log(x / self.K)[..., None]      # (..., 1)
        sqrt_tau = jnp.sqrt(tau)
        d1 = (log_m + (r_bs + 0.5 * sig_bs**2) * tau) / (sig_bs * sqrt_tau)
        d2 = (log_m + (r_bs - 0.5 * sig_bs**2) * tau) / (sig_bs * sqrt_tau)
        bs = x[..., None] * ndtr(d1) - self.K * jnp.exp(-r_bs * tau) * ndtr(d2)
        return jnp.sum(coeff * bs, axis=-1)

    def price_at_origin(self) -> float:
        """Reference price A(0, x0) — the accuracy oracle (mainMerton.py:70-73)."""
        return float(self.price(jnp.asarray(0), jnp.asarray([self.x0]))[0])

    # ---- BSDE pieces ----------------------------------------------------------
    def f(self, y: jax.Array) -> jax.Array:
        """Driver f(Y) = -rY (pricingModels.py:64-65)."""
        return -self.r * y

    def payoff(self, x: jax.Array) -> jax.Array:
        """g(X) = max(X-K, 0) (pricingModels.py:68-69)."""
        return jnp.maximum(x - self.K, 0.0)

    # ---- compensator quadrature -------------------------------------------------
    def jump_quadrature(self, spec: CompensatorSpec):
        """Deterministic nodes/weights for E_J[Γ(·, J)] over the Merton jump law."""
        nodes, weights = compound_poisson_quadrature(
            self.lam * self._dt, self.muJ, self.sigJ, spec
        )
        return jnp.asarray(nodes), jnp.asarray(weights)


def make_merton_default(a_lin: float = 0.1, limit: int = 30,
                        price_mode: str = "series",
                        jump_sampler: str = "exact") -> MertonJumpModel:
    """The mainMerton.py:57 default configuration."""
    return MertonJumpModel(
        T=1.0, N=50, r=0.1, muJ=0.0, sigJ=0.2, sigma=0.3, lam=3.0, K=0.9, x0=1.0,
        coupling=abs_coupling(a_lin), limit=limit, price_mode=price_mode,
        jump_sampler=jump_sampler,
    )
