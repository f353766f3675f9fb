"""The fused whole-rollout Pallas kernels (ops/pallas_rollout.py) must
reproduce XLA autodiff of the same hoisted rollout: same loss to fp
tolerance and gradients to fp tolerance, through the identical residual
recurrence as the verified transposed adjoint (solvers/adjoint.py).

On CPU the kernels run in Pallas interpret mode (PricingSolver gates
``interpret`` on the platform), so the comparison here is exact-f32.
CAUTION (learned the hard way — BASELINE.md precision-consistency
correction): interpret-mode equality CANNOT catch quantization-consistency
defects, because both sides compute exact f32.  On the real chip the
kernel's packed-weight layout quantizes the net differently from
mlp_apply, and the original DEFAULT-head default trained 2.2e-2 off the
oracle while these tests passed.  The hardware check is the 3-seed
training gate (`scripts/convergence_gates.py merton_speed_fused`), which
passes at 1.8e-4 under the corrected consistent-HIGHEST defaults.
"""

import dataclasses
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfbsdejsolvers_tpu.models.merton import make_merton_default
from deepfbsdejsolvers_tpu.models.variance_gamma import make_vg_default
from deepfbsdejsolvers_tpu.ops.compensator import CompensatorSpec
from deepfbsdejsolvers_tpu.solvers.pricing import PricingSolver

pytestmark = pytest.mark.full  # opt-in instrument (measured-slower, kept as evidence) — heavy equality tests

CHEB64 = CompensatorSpec(x_interp="chebyshev", n_cheb=64)


@pytest.fixture(autouse=True)
def _small_tile(monkeypatch):
    """Pin the kernel tile to the tests' batch sizes.  The shipped TILE is
    4096 (round-4 A/B: +16% over 1024 on-chip); equality semantics are
    tile-independent, and interpret mode is much faster on small tiles."""
    import deepfbsdejsolvers_tpu.ops.pallas_rollout as pr
    monkeypatch.setattr(pr, "TILE", 1024)


def _pair(batch=1024, n=3, a_lin=0.1, **kw):
    model = make_merton_default(a_lin=a_lin, jump_sampler="icdf",
                                price_mode="chebyshev")
    model = dataclasses.replace(model, N=n)
    kw.setdefault("hidden", (8, 8))
    common = dict(compensator=CHEB64, hoist=True,
                  hoist_interp="piecewise", hoist_gamma=False, **kw)
    auto = PricingSolver(model, "global", **common)
    fused = PricingSolver(model, "global", fused_rollout=True, **common)
    assert fused._fused_ok(batch)
    params = auto.init_params(jax.random.key(3))
    key = jax.random.key(11)
    return auto.build_loss(batch), fused.build_loss(batch), params, key


def _rel(a, b):
    na = np.sqrt(sum(float(jnp.sum(jnp.square(x)))
                     for x in jax.tree_util.tree_leaves(a)))
    d = jax.tree_util.tree_map(lambda x, y: x - y, a, b)
    nd = np.sqrt(sum(float(jnp.sum(jnp.square(x)))
                     for x in jax.tree_util.tree_leaves(d)))
    return nd / max(na, 1e-30)


def test_fused_loss_matches_autodiff_forward():
    auto, fused, params, key = _pair()
    la = float(jax.jit(auto)(params, key))
    lf = float(jax.jit(fused)(params, key))
    assert la == pytest.approx(lf, rel=1e-5), (la, lf)


@pytest.mark.parametrize("a_lin", [0.0, 0.1])
def test_fused_grads_match_autodiff(a_lin):
    auto, fused, params, key = _pair(a_lin=a_lin)
    ga = jax.jit(jax.grad(auto))(params, key)
    gf = jax.jit(jax.grad(fused))(params, key)
    assert _rel(ga, gf) < 3e-5, _rel(ga, gf)
    # every head must receive gradient, including through the tables
    for name in ("gam", "uz"):
        gn = sum(float(jnp.sum(jnp.abs(g)))
                 for g in jax.tree_util.tree_leaves(gf[name]))
        assert np.isfinite(gn) and gn > 0, name


def test_fused_multi_tile_batch():
    """grid > 1: per-tile accumulators must sum across the sequential grid."""
    auto, fused, params, key = _pair(batch=2048)
    ga = jax.jit(jax.grad(auto))(params, key)
    gf = jax.jit(jax.grad(fused))(params, key)
    assert _rel(ga, gf) < 3e-5, _rel(ga, gf)


def test_fused_gate_and_fallback():
    model = make_merton_default(a_lin=0.1, jump_sampler="icdf",
                                price_mode="chebyshev")
    model = dataclasses.replace(model, N=3)
    common = dict(compensator=CHEB64, hoist=True, hoist_interp="piecewise",
                  hoist_gamma=False)
    # unequal hidden layers -> gate rejects
    s = PricingSolver(model, "global", hidden=(8, 16), fused_rollout=True,
                      **common)
    assert not s._fused_ok(1024)
    # non-tile batch -> gate rejects
    s2 = PricingSolver(model, "global", hidden=(8, 8), fused_rollout=True,
                       **common)
    assert not s2._fused_ok(1000)
    # fallback is loud and still produces a finite loss
    with pytest.warns(UserWarning, match="fused_rollout=True requires"):
        loss = s.build_loss(64)
    assert np.isfinite(float(loss(s.init_params(jax.random.key(0)),
                                  jax.random.key(1))))


def test_fused_gate_rejects_non_merton_form():
    """The semantic Merton-form probe must reject a VG model (different
    increment law) rather than bake wrong constants into the kernel."""
    from deepfbsdejsolvers_tpu.ops.pallas_rollout import merton_form_constants

    vg = make_vg_default()
    assert merton_form_constants(vg) is None


def test_fused_trains_like_autodiff():
    """A few SGD steps under both paths stay within fp-accumulation distance
    (SGD, not Adam: Adam amplifies fp noise through the eps division)."""
    import optax

    auto, fused, params, key = _pair()
    opt = optax.sgd(1e-2)

    def run(loss_fn):
        p, s = params, opt.init(params)
        for k in range(3):
            g = jax.jit(jax.grad(loss_fn))(p, jax.random.fold_in(key, k))
            up, s = opt.update(g, s, p)
            p = optax.apply_updates(p, up)
        return float(jax.jit(loss_fn)(p, jax.random.fold_in(key, 99)))

    la, lf = run(auto), run(fused)
    assert la == pytest.approx(lf, rel=1e-4), (la, lf)


def test_fused_under_shard_map(rng_key):
    """The fused custom VJP composes with the DP shard_map (grads through
    psum); per-shard batch stays tile-divisible (8192 / 8 = 1024)."""
    from deepfbsdejsolvers_tpu.parallel.data_parallel import (
        make_dp_loss, make_mesh)

    model = make_merton_default(a_lin=0.1, jump_sampler="icdf",
                                price_mode="chebyshev")
    model = dataclasses.replace(model, N=2)
    solver = PricingSolver(model, "global", hidden=(8, 8), compensator=CHEB64,
                           hoist=True, hoist_interp="piecewise",
                           hoist_gamma=False, fused_rollout=True)
    assert solver._fused_ok(8192 // 8)
    params = solver.init_params(rng_key)
    mesh = make_mesh((8,), ("data",))
    dp_loss = make_dp_loss(solver.build_loss(8192 // 8), mesh)
    with mesh:
        val, grads = jax.value_and_grad(dp_loss)(params, rng_key)
    assert np.isfinite(float(val))
    gn = sum(float(jnp.sum(jnp.abs(g)))
             for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gn) and gn > 0


def test_fused_precision_knob_plumbs_through():
    """fused_precision reaches make_fused_rollout (interpret mode computes
    exact f32 either way, so both settings must agree with autodiff)."""
    auto, fused_hi, params, key = _pair(fused_precision="highest")
    la = float(jax.jit(auto)(params, key))
    lh = float(jax.jit(fused_hi)(params, key))
    assert la == pytest.approx(lh, rel=1e-5), (la, lh)


def test_fused_grads_match_at_production_width():
    """The shipped speed config runs hidden=(21, 21) — cover the non-8
    feature widths (odd K contractions, H > sublane count) explicitly."""
    auto, fused, params, key = _pair(n=2, hidden=(21, 21))
    ga = jax.jit(jax.grad(auto))(params, key)
    gf = jax.jit(jax.grad(fused))(params, key)
    assert _rel(ga, gf) < 3e-5, _rel(ga, gf)


def test_form_probe_rejects_nonaffine_log_increments():
    """Three on-axis probes alone cannot falsify a non-affine increment form
    that interpolates them — a cross (dW*J) or quadratic term must fail the
    extended 5-point probe, not silently bake wrong dynamics."""
    from deepfbsdejsolvers_tpu.ops.pallas_rollout import merton_form_constants

    base = make_merton_default()

    class CrossTerm:
        def __getattr__(self, name):
            return getattr(base, name)

        def uncoupled_log_increments(self, dw, j):
            return base.uncoupled_log_increments(dw, j) + 0.05 * dw * j

    class QuadraticDW:
        def __getattr__(self, name):
            return getattr(base, name)

        def uncoupled_log_increments(self, dw, j):
            return base.uncoupled_log_increments(dw, j) + 0.05 * dw * dw

    assert merton_form_constants(base) is not None
    assert merton_form_constants(CrossTerm()) is None
    assert merton_form_constants(QuadraticDW()) is None


def test_fused_rejects_unlowerable_precision_eagerly():
    """Mosaic lowers only DEFAULT/HIGHEST in-kernel dots; HIGH must be
    rejected at build time (on-chip it dies with an obscure
    NotImplementedError that interpret-mode tests cannot reproduce)."""
    from deepfbsdejsolvers_tpu.ops.pallas_rollout import make_fused_rollout

    model = make_merton_default(jump_sampler="icdf", price_mode="chebyshev")
    with pytest.raises(ValueError, match="Mosaic"):
        make_fused_rollout(model, 8, interpret=False, precision="high")
    with pytest.raises(ValueError, match="Mosaic"):
        make_fused_rollout(model, 8, interpret=False, head_precision="high")
    # interpret mode may keep any precision (it computes exact f32 anyway)
    make_fused_rollout(model, 8, interpret=True, precision="high")
