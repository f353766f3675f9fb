"""Correctness gates for the fused Pallas compensator sweep
(ops/pallas_sweep.py) against the XLA reference path — values AND gradients,
for every scheme/regime the packing covers.  Runs in Pallas interpret mode on
the CPU test mesh; the same code path compiles to Mosaic on TPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepfbsdejsolvers_tpu.models.merton import make_merton_default
from deepfbsdejsolvers_tpu.models.variance_gamma import make_vg_default
from deepfbsdejsolvers_tpu.ops.compensator import CompensatorSpec
from deepfbsdejsolvers_tpu.solvers.pricing import PricingSolver

SPEC = CompensatorSpec(n_poisson_max=3, n_hermite=5)
BATCH = 256  # pallas precondition: batch % 256 == 0


# quick keeps the headline-parity pair (merton global); the other input-
# convention twins carry ``full`` (VERDICT r4 item 7 tier split).
@pytest.mark.parametrize("model_fn,scheme", [
    (make_merton_default, "global"),      # jump-diff, Γ-net, f = J
    pytest.param(make_merton_default, "multistep2",
                 marks=pytest.mark.full),  # jump-diff, Γ-net, f = e^J
    pytest.param(make_merton_default, "multistep1",
                 marks=pytest.mark.full),  # jump-diff, U-net, X·e^J
    pytest.param(make_vg_default, "global",
                 marks=pytest.mark.full),  # pure-jump, Γ-net, f = X·J
    pytest.param(make_vg_default, "sumlocal1",
                 marks=pytest.mark.full),  # pure-jump, U-net, X + X·J
])
def test_pallas_matches_xla_loss_and_grad(model_fn, scheme, rng_key):
    # N=12: the kernel-vs-XLA comparison is per-step; rollout length only
    # multiplies interpret-mode cost (VERDICT r4 item 7 tier budget).
    model = dataclasses.replace(model_fn(), N=12)
    solvers = {
        impl: PricingSolver(model, scheme, compensator=SPEC, sweep_impl=impl)
        for impl in ("xla", "pallas")
    }
    params = solvers["xla"].init_params(jax.random.key(0))
    losses, grads = {}, {}
    for impl, s in solvers.items():
        loss_fn = s.build_loss(BATCH)
        losses[impl] = float(jax.jit(loss_fn)(params, rng_key))
        grads[impl] = jax.jit(jax.grad(loss_fn))(params, rng_key)
    assert losses["pallas"] == pytest.approx(losses["xla"], rel=2e-4, abs=1e-6)
    # No elementwise grad comparison through the rollout: the |Y-A| coupling
    # kink makes path subgradients flip on ~1e-7 forward differences, so e2e
    # gradients are only statistically equal.  Check finiteness + magnitude;
    # the precise per-op gates are test_pallas_kernel_unit and
    # test_pallas_isolated_sweep_grads.
    for gp, gx in zip(jax.tree_util.tree_leaves(grads["pallas"]),
                      jax.tree_util.tree_leaves(grads["xla"])):
        gp, gx = np.asarray(gp), np.asarray(gx)
        assert np.all(np.isfinite(gp))
        nx = np.linalg.norm(gx)
        if nx > 5e-3 * np.sqrt(gx.size):  # skip cancellation-residual leaves
            assert 0.5 < np.linalg.norm(gp) / nx < 2.0


@pytest.mark.parametrize("model_fn,scheme", [
    (make_merton_default, "global"),
    (make_merton_default, "multistep2"),
    (make_merton_default, "multistep1"),
    (make_vg_default, "global"),
    (make_vg_default, "sumlocal1"),
])
def test_pallas_isolated_sweep_grads(model_fn, scheme, rng_key):
    """Single-op comparison of the compensator value and its parameter
    gradients — tight tolerances, no rollout amplification."""
    model = model_fn()
    solvers = {impl: PricingSolver(model, scheme, compensator=SPEC,
                                   sweep_impl=impl)
               for impl in ("xla", "pallas")}
    params = solvers["xla"].init_params(jax.random.key(0))
    x = jax.random.normal(rng_key, (BATCH,)) * 0.1 + 1.0
    j = model.sample_jumps(jax.random.fold_in(rng_key, 1), (BATCH,))
    km = jax.random.fold_in(rng_key, 2)
    outs = {}
    for impl, s in solvers.items():
        def f(p, s=s):
            gam, comp = s._gamma_and_compensator(p, 5, x, j, km)
            return jnp.sum(jnp.sin(comp)), comp
        (_, comp), grads = jax.value_and_grad(f, has_aux=True)(params)
        outs[impl] = (comp, grads)
    np.testing.assert_allclose(np.asarray(outs["pallas"][0]),
                               np.asarray(outs["xla"][0]),
                               rtol=1e-4, atol=1e-5)
    for gp, gx in zip(jax.tree_util.tree_leaves(outs["pallas"][1]),
                      jax.tree_util.tree_leaves(outs["xla"][1])):
        gp, gx = np.asarray(gp), np.asarray(gx)
        denom = np.linalg.norm(gx)
        if denom > 1e-6:
            assert np.linalg.norm(gp - gx) / denom < 1e-4


def test_pallas_kernel_unit(rng_key):
    """Direct kernel check against a dense einsum of the packed math."""
    from deepfbsdejsolvers_tpu.ops.pallas_sweep import fused_sweep

    mg = 3
    k = jax.random.split(rng_key, 6)
    x = jax.random.normal(k[0], (512,), jnp.float32)
    a = jax.random.normal(k[1], (mg, 128), jnp.float32) * 0.3
    c = jax.random.normal(k[2], (mg, 128), jnp.float32) * 0.3
    w1 = jax.random.normal(k[3], (128, 128), jnp.float32) * 0.1
    b1 = jax.random.normal(k[4], (128,), jnp.float32) * 0.1
    v = jax.random.normal(k[5], (mg, 128), jnp.float32) * 0.3

    def dense(x, a, c, w1, b1, v):
        h1 = jnp.tanh(x[None, :, None] * a[:, None, :] + c[:, None, :])
        h2 = jnp.tanh(h1 @ w1 + b1)
        return jnp.sum(h2 * v[:, None, :], axis=(0, 2))

    got = fused_sweep(x, a, c, w1, b1, v)
    want = dense(x, a, c, w1, b1, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # gradients wrt every operand
    args = (x, a, c, w1, b1, v)
    g_got = jax.grad(lambda *a_: jnp.sum(jnp.sin(fused_sweep(*a_))),
                     argnums=tuple(range(6)))(*args)
    g_want = jax.grad(lambda *a_: jnp.sum(jnp.sin(dense(*a_))),
                      argnums=tuple(range(6)))(*args)
    for gg, gw in zip(g_got, g_want):
        gg, gw = np.asarray(gg), np.asarray(gw)
        # f32 with different contraction orders: gate on relative norm plus
        # a loose elementwise bound
        np.testing.assert_allclose(gg, gw, rtol=2e-3, atol=2e-3)
        assert np.linalg.norm(gg - gw) / np.linalg.norm(gw) < 1e-4


def test_pallas_preconditions_round2():
    """Round-2 contract: odd batches (zero-pad) and MC mode (per-step node
    sets) are ACCEPTED; a sharded comp axis or a non-conforming head falls
    back to XLA with a LOUD one-time warning."""
    import warnings

    m = make_merton_default()
    s = PricingSolver(m, "global", compensator=SPEC, sweep_impl="pallas")
    params = s.init_params(jax.random.key(0))
    assert s._pallas_ok(params)              # any batch: padded
    s_mc = PricingSolver(m, "global", compensator=CompensatorSpec(kind="mc"),
                         sweep_impl="pallas")
    assert s_mc._pallas_ok(params)           # mc mode supported
    # the loss runs end-to-end at a non-tile-aligned batch
    loss = float(jax.jit(s.build_loss(96))(params, jax.random.key(1)))
    assert np.isfinite(loss)
    # round 3: comp-axis sharding no longer disqualifies — each shard sweeps
    # its node slice through the kernel and the partials psum outside
    s_sh = PricingSolver(m, "global", compensator=SPEC, sweep_impl="pallas",
                         comp_axis="comp", comp_shards=2)
    assert s_sh._pallas_ok(params)
    # bf16 heads DO disqualify (the kernel is f32-only) with a loud warning
    s_bf = PricingSolver(m, "global", compensator=SPEC, sweep_impl="pallas",
                         compute_dtype="bfloat16")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert not s_bf._pallas_ok(params)
    assert any("falling back to the XLA sweep" in str(w.message)
               and "f32-only" in str(w.message) for w in caught)
    # the bf16 loss still runs end-to-end through the XLA fallback
    loss_bf = float(jax.jit(s_bf.build_loss(96))(params, jax.random.key(1)))
    assert np.isfinite(loss_bf)
    # non-tanh activation disqualifies (one-layer-shape check shares the path)
    s_act = PricingSolver(m, "global", compensator=SPEC, sweep_impl="pallas",
                          activation="relu")
    p_act = s_act.init_params(jax.random.key(0))
    assert not s_act._pallas_ok(p_act)


def test_pallas_sharded_comp_axis_matches_xla():
    """Round 3: the fused kernel under compensator-axis sharding — per-shard
    node slices swept in-kernel, psum'd outside — equals the sharded XLA
    sweep AND the unsharded loss (quadrature zero-pad included)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    m = make_merton_default()
    devs = np.asarray(jax.devices()[:2])
    mesh = Mesh(devs, ("comp",))
    key = jax.random.key(7)

    def sharded_loss(sweep_impl):
        s = PricingSolver(m, "global", compensator=SPEC,
                          sweep_impl=sweep_impl,
                          comp_axis="comp", comp_shards=2)
        params = s.init_params(jax.random.key(0))
        loss_fn = s.build_loss(128)
        f = shard_map(lambda p, k: loss_fn(p, k), mesh=mesh,
                      in_specs=(P(), P()), out_specs=P(), check_vma=False)
        return float(jax.jit(f)(params, key))

    base = PricingSolver(m, "global", compensator=SPEC)
    params = base.init_params(jax.random.key(0))
    unsharded = float(jax.jit(base.build_loss(128))(params, key))
    xla_sh = sharded_loss("xla")
    pal_sh = sharded_loss("pallas")
    assert xla_sh == pytest.approx(unsharded, rel=1e-5)
    assert pal_sh == pytest.approx(xla_sh, rel=2e-4)
