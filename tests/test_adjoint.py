"""The hand-written transposed-adjoint VJP (solvers/adjoint.py) must
reproduce XLA autodiff of the same hoisted rollout: identical loss (same
forward float-for-float) and gradients to fp tolerance."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfbsdejsolvers_tpu.models.merton import make_merton_default
from deepfbsdejsolvers_tpu.ops.compensator import CompensatorSpec
from deepfbsdejsolvers_tpu.solvers.pricing import PricingSolver

pytestmark = pytest.mark.full  # opt-in instrument (measured-slower, kept as evidence) — heavy equality tests

CHEB64 = CompensatorSpec(x_interp="chebyshev", n_cheb=64)


def _pair(batch=256, n=6, a_lin=0.1, **kw):
    model = make_merton_default(a_lin=a_lin, jump_sampler="icdf",
                                price_mode="chebyshev")
    model = dataclasses.replace(model, N=n)
    # hoist_gamma=False: the adjoint rollout applies the Γ net directly, so
    # the autodiff comparison must run the same (non-tabled) realized-Γ head
    # for the losses to match float-for-float.
    common = dict(hidden=(8, 8), compensator=CHEB64, hoist=True,
                  hoist_interp="piecewise", hoist_gamma=False, **kw)
    auto = PricingSolver(model, "global", **common)
    adj = PricingSolver(model, "global", adjoint=True, **common)
    params = auto.init_params(jax.random.key(3))
    key = jax.random.key(11)
    return auto.build_loss(batch), adj.build_loss(batch), params, key


def _rel(a, b):
    na = np.sqrt(sum(float(jnp.sum(jnp.square(x)))
                     for x in jax.tree_util.tree_leaves(a)))
    d = jax.tree_util.tree_map(lambda x, y: x - y, a, b)
    nd = np.sqrt(sum(float(jnp.sum(jnp.square(x)))
                     for x in jax.tree_util.tree_leaves(d)))
    return nd / max(na, 1e-30)


def test_adjoint_loss_matches_autodiff_forward(rng_key):
    auto, adj, params, key = _pair()
    la = float(jax.jit(auto)(params, key))
    lj = float(jax.jit(adj)(params, key))
    assert la == pytest.approx(lj, rel=1e-6), (la, lj)


@pytest.mark.parametrize("a_lin", [0.0, 0.1])
def test_adjoint_grads_match_autodiff(a_lin):
    auto, adj, params, key = _pair(a_lin=a_lin)
    ga = jax.jit(jax.grad(auto))(params, key)
    gj = jax.jit(jax.grad(adj))(params, key)
    assert _rel(ga, gj) < 3e-5, _rel(ga, gj)
    # every head must receive gradient, including through the tables
    for name in ("gam", "uz"):
        gn = sum(float(jnp.sum(jnp.abs(g)))
                 for g in jax.tree_util.tree_leaves(gj[name]))
        assert np.isfinite(gn) and gn > 0, name


def test_adjoint_trains_like_autodiff():
    """A few SGD steps under both VJPs stay within fp-accumulation distance
    (SGD, not Adam: Adam amplifies fp noise through the eps division)."""
    import optax

    auto, adj, params, key = _pair(batch=512)
    opt = optax.sgd(1e-2)

    def run(loss_fn):
        p, s = params, opt.init(params)
        for k in range(5):
            g = jax.jit(jax.grad(loss_fn))(p, jax.random.fold_in(key, k))
            up, s = opt.update(g, s, p)
            p = optax.apply_updates(p, up)
        return float(jax.jit(loss_fn)(p, jax.random.fold_in(key, 99)))

    la, lj = run(auto), run(adj)
    assert la == pytest.approx(lj, rel=1e-4), (la, lj)


def test_adjoint_fallback_warns_on_unmet_conditions():
    model = make_merton_default(a_lin=0.1, jump_sampler="icdf",
                                price_mode="chebyshev")
    model = dataclasses.replace(model, N=4)
    s = PricingSolver(model, "global", hidden=(8, 8), compensator=CHEB64,
                      adjoint=True)  # hoist=False -> conditions unmet
    with pytest.warns(UserWarning, match="adjoint=True requires"):
        loss = s.build_loss(64)
    assert np.isfinite(float(loss(s.init_params(jax.random.key(0)),
                                  jax.random.key(1))))


def test_adjoint_under_shard_map(rng_key):
    """The custom VJP composes with the DP shard_map (grads through psum)."""
    from deepfbsdejsolvers_tpu.parallel.data_parallel import (
        make_dp_loss, make_mesh)

    model = make_merton_default(a_lin=0.1, jump_sampler="icdf",
                                price_mode="chebyshev")
    model = dataclasses.replace(model, N=4)
    solver = PricingSolver(model, "global", hidden=(8, 8), compensator=CHEB64,
                           hoist=True, hoist_interp="piecewise", adjoint=True)
    params = solver.init_params(rng_key)
    mesh = make_mesh((8,), ("data",))
    dp_loss = make_dp_loss(solver.build_loss(16), mesh)
    with mesh:
        val, grads = jax.value_and_grad(dp_loss)(params, rng_key)
    assert np.isfinite(float(val))
    gn = sum(float(jnp.sum(jnp.abs(g)))
             for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gn) and gn > 0
