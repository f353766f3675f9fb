"""Fused whole-rollout Pallas kernels for the hoisted global scheme.

Why (BASELINE.md round 3): after the collocation hoist the train step is
bound by (a) the realized-Γ head's thin per-step dot_generals (~30% of
device time: jvp + transpose + remat re-forward, each a K-padded MXU call
dispatched per scan iteration), (b) scan-buffer traffic (~29%:
dynamic_update_slice stacking of saved heads + per-step xs reads), and
(c) kernel-gap idle (~19%).  Two XLA-level restructurings were measured
and rejected (the transposed-adjoint batched backward, solvers/adjoint.py,
2.14e8 vs 4.22e8; the 2-D Γ-table collocation, 3.10e8 vs 4.33e8): at the
XLA level the streamed thin matmuls ARE the floor.  The remaining lever is
fusing the scan body itself — this module.

Design
------
Forward and backward are each ONE `pl.pallas_call` over a 1-D grid of
batch tiles (`TILE` paths per program).  Within a program every per-path
scalar lives in VMEM as an ``(8, TILE//8)`` block — the VPU's native
(sublane, lane) tile, so every elementwise op runs at full vector width
(a first draft used (1, TILE) rows: one sublane, 1/8 utilization, and it
measured only ~4% over XLA) — and stacked quantities (one-hot pieces,
Chebyshev coefficient rows, MLP activations) are ``(K, 8, TILE//8)`` with
the contractions written as multi-free-dim dot_generals so nothing ever
relayouts.  The whole N-step rollout runs in a `fori_loop` with NO HBM
round-trips for the carry, no per-step kernel dispatch, no scan stacking:

* the piecewise tables (N, D, P) and the noise block sit in VMEM for the
  program's lifetime; interval bounds are SMEM scalars;
* piece-select is one (D, P) x (P, 8, L) dot_general against a computed
  one-hot, per-piece Chebyshev Clenshaw runs on (8, L) tiles (the tables
  are local-Chebyshev coefficients — ops/piecewise.pw_fit);
* the Γ head runs feature-major: rank-1 first layer (W1t t_i + W1x x +
  W1j j + b1 broadcast over the path tile), an (H, H) x (H, 8, L)
  dot_general middle layer, an (H, 1)-contraction output; the scalar
  output bias b3 is folded exactly into the compensator table's T_0 row
  ((gam + b3) - comp == gam - (comp - b3)), so the kernel never sees it;
* under ``jax.grad`` the forward stores exactly two (N, B) residual
  trajectories (x_i pre-step, y_{i+1} post-update) to HBM (the primal-only
  call skips them) — the same residuals as the
  verified transposed-adjoint (solvers/adjoint.py:66-86), whose recurrence
  the backward kernel replays per tile with (8, L) adjoint carries,
  accumulating parameter/table cotangents in VMEM across the sequential
  grid.

Model scope: the Merton-form jump-diffusion global scheme on the fully
hoisted piecewise path — f(y) = -r y, coupling(u) = aLin |u|,
log-increments drift + sigma dW + J (models/merton.py:173-192,235-241;
reference semantics SolversJumpDiff.py:25-52).  The model constants are
baked into the kernel at trace time; the caller gates applicability
SEMANTICALLY (merton_form_constants probes the model's own callables) and
falls back to the XLA scan loudly (PricingSolver._fused_ok).

Gradient correctness is tested against XLA autodiff of the identical
rollout (tests/test_pallas_rollout.py, same harness as the adjoint).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from deepfbsdejsolvers_tpu.ops.numerics import expm1_acc

# Paths per kernel tile.  4096 beats 1024 by ~16% in the round-4 A/B
# (scripts/fused_ab.py: 3.18e8 vs 2.74e8 at the shipped HIGHEST heads,
# 4.16e8 vs 3.21e8 at DEFAULT heads) — wider tiles amortize the serial
# time-step loop's per-iteration overhead across more batch ILP.
TILE = 4096
_R = 8          # sublane rows of a path tile

# All in-kernel dot_generals carry an explicit precision, SPLIT BY ROLE to
# mirror the XLA path's measured policy (BASELINE.md select-precision note):
#
# * SELECT dots (one-hot piece-selects and the backward's basis-through-
#   one-hot table cotangents) run at HIGHEST — exact selection of f32
#   Chebyshev coefficients, where Mosaic's DEFAULT single bf16 pass would
#   round the selected values to ~4e-3 relative (the numerics class that
#   FAILED the 3-seed accuracy gate).  The XLA path uses HIGH (3 bf16
#   passes — bit-exact for a one-hot contraction at half HIGHEST's issue
#   cost), but Mosaic's in-kernel dot lowering supports ONLY DEFAULT and
#   HIGHEST: HIGH raises "NotImplementedError: Unsupported dot precision"
#   at compile on the real chip (measured 2026-08-18; interpret mode does
#   not catch it).
# * HEAD dots (the Γ-MLP forward/backward contractions) also run at
#   HIGHEST.  The original default was DEFAULT on the theory that the
#   kernel's bf16 passes would cancel against DEFAULT-built tables the way
#   the XLA path's do — MEASURED FALSE on hardware (first real-chip gate
#   run, 2026-08-19): the kernel's packed-weight layout (w1c rows, folded
#   b3, rank-1 first layer) quantizes the net DIFFERENTLY from XLA's
#   mlp_apply, so (Γ − comp) keeps a systematic residual and the 3-seed
#   merton_speed_fused gate FAILED at 2.2e-2 mean (gam.W grads 20% off
#   autodiff, uz.y0 3.3x off).  With HIGHEST heads AND the tables built
#   under jax.default_matmul_precision('highest') (the fused loss builder
#   does this), both sides are near-exact f32 and on-chip grads match
#   autodiff to <= 9e-4 rel at N=50 — self-consistency, not cancellation.
#
# The round-3 A/B (scripts/fused_ab.py, 2^17 batch) showed precision is
# the whole fused-kernel story: XLA 4.75e8 paths·steps/s; fused all-DEFAULT
# 4.69e8 (gate-failing selects); fused HIGHEST-selects + DEFAULT-heads
# 4.05e8 (the superseded default — gate-failing, see above); fused
# all-HIGHEST 2.3-3.0e8 (this default — the accuracy-correct config).
# Override via make_fused_rollout(precision=..., head_precision=...) /
# PricingSolver(fused_precision=..., fused_head_precision=...) for A/B.
_PREC = jax.lax.Precision.HIGHEST
_HEAD_PREC = jax.lax.Precision.HIGHEST


def _clenshaw_k(c, t):
    """Chebyshev series over the leading axis: c (D, 8, L), t (8, L)."""
    d = c.shape[0]
    b1 = jnp.zeros_like(t)
    b2 = b1
    for k in range(d - 1, 0, -1):
        b1, b2 = c[k] + 2.0 * t * b1 - b2, b1
    return c[0] + t * b1 - b2


def _clenshaw_k_deriv(c, t):
    """(value, d/dt value) of the Chebyshev series (leading-axis layout)."""
    d = c.shape[0]
    b1 = jnp.zeros_like(t)
    b2 = b1
    db1 = jnp.zeros_like(t)
    db2 = db1
    for k in range(d - 1, 0, -1):
        b1, b2, db1, db2 = (c[k] + 2.0 * t * b1 - b2, b1,
                            2.0 * b1 + 2.0 * t * db1 - db2, db1)
    return c[0] + t * b1 - b2, b1 + t * db1 - db2


def _cheb_basis_k(t, d):
    """T_0..T_{d-1}(t) stacked on a new leading axis: t (8, L) -> (d, 8, L)."""
    rows = [jnp.ones_like(t)[None], t[None]]
    for _ in range(d - 2):
        rows.append(2.0 * t[None] * rows[-1] - rows[-2])
    return jnp.concatenate(rows[:d], axis=0)


def _piece_onehot(x, lo, hi, p):
    """(one-hot (P, 8, L), piece index k (8, L) int32, local t (8, L),
    dt/dx (8, L)); out-of-interval x clamps like ops/piecewise.pw_eval
    (derivative 0 past the edge)."""
    span = jnp.maximum(hi - lo, 1e-6)
    s_raw = (x - lo) / span
    inside = ((s_raw >= 0.0) & (s_raw <= 1.0)).astype(x.dtype)
    s = jnp.clip(s_raw, 0.0, 1.0) * p
    k = jnp.clip(jnp.floor(s), 0.0, p - 1.0)
    t = 2.0 * (s - k) - 1.0
    ki = k.astype(jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (p,) + x.shape, 0)
    onehot = (rows == ki[None]).astype(x.dtype)
    return onehot, ki, t, (2.0 * p / span) * inside


def _sum_paths(v):
    """(K, 8, L) -> (K, 1) path-tile reduction without 1-D intermediates
    (Mosaic layout inference CHECK-fails on rank-1 vectors)."""
    return jnp.sum(v.reshape(v.shape[0], v.shape[1] * v.shape[2]),
                   axis=1, keepdims=True)


def _dot_k(a, b, prec=None):
    """Contract leading axes: (K, M...) x (K, R, L) -> (M..., R, L) with
    a 2-D; i.e. (K, M) x (K, 8, L) -> (M, 8, L)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               precision=prec or _PREC,
                               preferred_element_type=jnp.float32)


def _dot_paths(a, b, prec=None):
    """Contract the path tile: (Ka, 8, L) x (Kb, 8, L) -> (Ka, Kb).

    Mosaic's tpu.matmul requires exactly ONE contracting dim (and batch
    dims at position 0 only), so the (8, L) tile is flattened to one
    lane axis first — measured exact and supported in-kernel."""
    ka, kb = a.shape[0], b.shape[0]
    ar = a.reshape(ka, a.shape[1] * a.shape[2])
    br = b.reshape(kb, b.shape[1] * b.shape[2])
    return jax.lax.dot_general(ar, br, (((1,), (1,)), ((), ())),
                               precision=prec or _PREC,
                               preferred_element_type=jnp.float32)


def _select(cT_step, ki):
    """(D, P) coefficients -> per-path stacks (D, 8, L), selected by the
    piece index ki (8, L) through a broadcasted-compare ``where`` chain.

    EXACT selection (f32 coefficients pass through untouched) at pure VPU
    cost: P-1 compare+select ops on (D, 8, L) tiles.  This replaces the
    round-3 one-hot (D, P) x (P, 8, L) dot_general, whose exactness cost a
    6-pass HIGHEST MXU contraction in-kernel (Mosaic lowers only DEFAULT /
    HIGHEST; the XLA path's half-cost bit-exact HIGH is unavailable) — the
    measured ~15% "select-precision tax" of the round-3 fused A/B
    (BASELINE.md)."""
    d, p = cT_step.shape
    acc = jnp.broadcast_to(cT_step[:, 0][:, None, None], (d,) + ki.shape)
    for pp in range(1, p):
        acc = jnp.where(ki[None] == pp,
                        jnp.broadcast_to(cT_step[:, pp][:, None, None],
                                         (d,) + ki.shape),
                        acc)
    return acc


def merton_form_constants(model):
    """Extract (r, a_lin, sigma, drift, x0) if the model has the exact
    Merton forms the kernel bakes in — f(y) = -r y, coupling(u) = aLin |u|,
    log-increments drift + sigma dW + J — else None.  The check is
    SEMANTIC (numeric probes of the model's own callables), not nominal:
    a model with differently-shaped dynamics fails it even if the
    attributes exist."""
    import numpy as np

    try:
        r = float(model.r)
        sigma = float(model.sigma)
        x0 = float(model.x0)
        u = jnp.asarray([-3.0, -1.0, 0.5, 2.0], jnp.float32)
        cu = np.asarray(model.coupling(u))
        a_lin = float(cu[1])
        if not np.allclose(cu, a_lin * np.abs(np.asarray(u)), rtol=1e-6,
                           atol=1e-12):
            return None
        fu = np.asarray(model.f(u))
        if not np.allclose(fu, -r * np.asarray(u), rtol=1e-6, atol=1e-12):
            return None
        z = jnp.zeros(())
        drift = float(model.uncoupled_log_increments(z, z))
        one = jnp.ones(())
        two = jnp.full((), 2.0)
        # Five probes: the three on-axis points pin the affine coefficients,
        # (1,1) falsifies any dW x J cross term, and (2,0)/(0,2) falsify
        # quadratic terms — three points alone cannot reject a non-affine
        # form that happens to interpolate them.
        if not (np.isclose(float(model.uncoupled_log_increments(one, z)),
                           drift + sigma, rtol=1e-6)
                and np.isclose(float(model.uncoupled_log_increments(z, one)),
                               drift + 1.0, rtol=1e-6)
                and np.isclose(float(model.uncoupled_log_increments(one, one)),
                               drift + sigma + 1.0, rtol=1e-6)
                and np.isclose(float(model.uncoupled_log_increments(two, z)),
                               drift + 2.0 * sigma, rtol=1e-6)
                and np.isclose(float(model.uncoupled_log_increments(z, two)),
                               drift + 2.0, rtol=1e-6)):
            return None
        return r, a_lin, sigma, drift, x0
    except Exception:
        return None


def make_fused_rollout(model, hidden: int, time_scale: float = 1.0,
                       n_pieces: int = 8, degree: int = 7,
                       interpret: bool = False,
                       precision: "jax.lax.Precision | None" = None,
                       head_precision: "jax.lax.Precision | None" = None
                       ) -> Callable:
    """Build ``rollout(gam_params, y0, tables, dw, j) -> (x_N, y_N)`` with a
    fused-Pallas custom VJP (same interface and residuals as
    solvers/adjoint.make_global_adjoint_rollout).

    ``precision`` governs the select/table dots, ``head_precision`` the
    Γ-MLP dots — see the module-level precision-policy note."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    prec = (jax.lax.Precision(precision) if precision is not None
            else _PREC)
    hprec = (jax.lax.Precision(head_precision) if head_precision is not None
             else _HEAD_PREC)
    if not interpret:
        # Mosaic's in-kernel dot lowering supports only DEFAULT and HIGHEST
        # (HIGH dies with an obscure NotImplementedError at on-chip compile,
        # which interpret-mode/CPU tests cannot catch) — fail eagerly here.
        for name, p in (("precision", prec), ("head_precision", hprec)):
            if p not in (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST):
                raise ValueError(
                    f"make_fused_rollout: {name}={p} is not lowerable by "
                    "Mosaic on TPU — use DEFAULT or HIGHEST")
    consts = merton_form_constants(model)
    if consts is None:
        raise ValueError("make_fused_rollout requires a Merton-form model "
                         "(see merton_form_constants)")
    r, a_lin, sigma, drift, x0 = consts
    dt = float(model.dt)
    h = hidden
    p_, d_ = n_pieces, degree + 1
    L = TILE // _R

    def _mlp_hidden(w1c, b1, w2, b2, i, x, jr):
        """Feature-major Γ-head hidden states (h1, h2), each (H, 8, L) —
        the backward kernel needs only these, not the Γ value itself."""
        t_i = jnp.float32(time_scale) * i.astype(jnp.float32)
        pre1 = (w1c[:, 0:1, 0:1] * t_i + w1c[:, 1:2, 0:1] * x[None]
                + w1c[:, 2:3, 0:1] * jr[None] + b1[:, :, None])
        h1 = jnp.tanh(pre1)
        h2 = jnp.tanh(_dot_k(w2, h1, hprec) + b2[:, :, None])
        return h1, h2

    def _mlp_fwd(w1c, b1, w2, b2, w3, i, x, jr):
        """Feature-major Γ head; returns (h1, h2 (H, 8, L), gam (8, L))."""
        h1, h2 = _mlp_hidden(w1c, b1, w2, b2, i, x, jr)
        gam = _dot_k(w3, h2, hprec)[0]
        return h1, h2, gam

    # ------------------------------------------------------------- forward
    # ``save`` toggles the residual (xs, ys) outputs: the primal-only call
    # (loss evaluation outside jax.grad) skips them — at N=256 and the 2^17
    # headline batch they are ~256 MB of dead HBM writes per eval.
    def _make_fwd_kernel(save):
      def _fwd_kernel(dw_ref, j_ref, ccT_ref, pcT_ref, zcT_ref, lo_ref,
                      hi_ref, w1c_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                      y0_ref, xn_ref, yn_ref, *res_refs):
        xs_ref, ys_ref = res_refs if save else (None, None)
        n = dw_ref.shape[0]
        w1c = w1c_ref[:]                                   # (H, 3)
        b1 = b1_ref[:]                                     # (H, 1)
        w2 = w2_ref[:]
        b2 = b2_ref[:]
        w3 = w3_ref[:]
        x = jnp.full((_R, L), x0, jnp.float32)
        y = jnp.full((_R, L), 1.0, jnp.float32) * y0_ref[0, 0]

        def body(i, carry):
            x, y = carry
            if save:
                xs_ref[i] = x[None]
            dwr = dw_ref[i][0]
            jr = j_ref[i][0]
            _, ki, t, _ = _piece_onehot(x, lo_ref[i, 0], hi_ref[i, 0], p_)
            comp = _clenshaw_k(_select(ccT_ref[i], ki), t)
            _, _, gam = _mlp_fwd(w1c[:, :, None], b1, w2, b2, w3, i, x, jr)
            y = y * (1.0 + r * dt) + gam - comp
            z = _clenshaw_k(_select(zcT_ref[i], ki), t)
            y = y + z * dwr
            a = _clenshaw_k(_select(pcT_ref[i], ki), t)
            if save:
                ys_ref[i] = y[None]
            # 1 + expm1_acc, not exp: matches the XLA path's mul_exp
            # (ops/numerics.py — TPU f32 exp walk-bias fix)
            e = 1.0 + expm1_acc(drift + sigma * dwr + jr)
            x = x * e + (a_lin * jnp.abs(y - a)) * dt
            return (x, y)

        x, y = jax.lax.fori_loop(0, n, body, (x, y))
        xn_ref[0] = x
        yn_ref[0] = y
      return _fwd_kernel

    # ------------------------------------------------------------ backward
    def _bwd_kernel(dw_ref, j_ref, ccT_ref, pcT_ref, zcT_ref, lo_ref, hi_ref,
                    w1c_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                    xs_ref, ys_ref, cxn_ref, cyn_ref,
                    dw1c_ref, db1_ref, dw2_ref, db2_ref, dw3_ref,
                    ccb_ref, pcb_ref, zcb_ref, dy0_ref):
        n = dw_ref.shape[0]

        @pl.when(pl.program_id(0) == 0)
        def _():
            dw1c_ref[:] = jnp.zeros_like(dw1c_ref)
            db1_ref[:] = jnp.zeros_like(db1_ref)
            dw2_ref[:] = jnp.zeros_like(dw2_ref)
            db2_ref[:] = jnp.zeros_like(db2_ref)
            dw3_ref[:] = jnp.zeros_like(dw3_ref)
            ccb_ref[:] = jnp.zeros_like(ccb_ref)
            pcb_ref[:] = jnp.zeros_like(pcb_ref)
            zcb_ref[:] = jnp.zeros_like(zcb_ref)
            dy0_ref[0, 0] = 0.0

        w1c = w1c_ref[:]
        b1 = b1_ref[:]
        w2 = w2_ref[:]
        b2 = b2_ref[:]
        w3 = w3_ref[:]

        def body(kk, carry):
            xb, yb = carry
            i = n - 1 - kk
            x = xs_ref[i][0]
            yrow = ys_ref[i][0]
            dwr = dw_ref[i][0]
            jr = j_ref[i][0]
            onehot, ki, t, dtdx = _piece_onehot(x, lo_ref[i, 0], hi_ref[i, 0],
                                                p_)
            _, dcd = _clenshaw_k_deriv(_select(ccT_ref[i], ki), t)
            a_vals, dad = _clenshaw_k_deriv(_select(pcT_ref[i], ki), t)
            _, dzd = _clenshaw_k_deriv(_select(zcT_ref[i], ki), t)
            cps, aps, zps = dcd * dtdx, dad * dtdx, dzd * dtdx
            h1, h2 = _mlp_hidden(w1c[:, :, None], b1, w2, b2, i, x, jr)
            s1 = 1.0 - h1 * h1
            s2 = 1.0 - h2 * h2
            # forward-mode dΓ/dx
            # (w1c[:, 1:2][..., None], NOT w1c[:, 1:2, None]: jax 0.9 lowers
            # a slice mixed with newaxis in one getitem to a gather, which
            # Mosaic cannot lower)
            u2 = s2 * _dot_k(w2, w1c[:, 1:2][:, :, None] * s1, hprec)
            gx = _dot_k(w3, u2, hprec)[0]
            # adjoint recurrence (solvers/adjoint.py abody; Merton forms
            # f' = -r, phi' = aLin sign(u))
            u = yrow - a_vals
            ub = xb * (a_lin * jnp.sign(u)) * dt
            yb = yb + ub
            e = 1.0 + expm1_acc(drift + sigma * dwr + jr)
            gbar = yb
            xb = (xb * e - gbar * cps + gbar * dwr * zps - ub * aps
                  + gbar * gx)
            yb = yb * (1.0 + r * dt)
            # ---- Γ-head parameter cotangents
            dp2 = (w3[:, :, None] * gbar[None]) * s2       # (H, 8, L)
            dw3_ref[:] += _dot_paths(h2, gbar[None], hprec).reshape(h, 1)
            dw2_ref[:] += _dot_paths(h1, dp2, hprec)       # (H_a, H_o)
            db2_ref[:] += _sum_paths(dp2)
            dp1 = jax.lax.dot_general(
                w2, dp2, (((1,), (0,)), ((), ())), precision=hprec,
                preferred_element_type=jnp.float32) * s1   # (H, 8, L)
            t_i = jnp.float32(time_scale) * i.astype(jnp.float32)
            rs1 = _sum_paths(dp1)
            # one full-block accumulate: column-sliced ref updates
            # (ref[:, 0:1] +=) discharge to a gather Mosaic cannot lower
            dw1c_ref[:] += jnp.concatenate(
                [t_i * rs1,
                 _sum_paths(dp1 * x[None]),
                 _sum_paths(dp1 * jr[None])],
                axis=1)
            db1_ref[:] += rs1
            # ---- table cotangents: Chebyshev basis rows at t scattered to
            # pieces through the shared one-hot
            basis = _cheb_basis_k(t, d_)                   # (D, 8, L)
            ccb_ref[i] += _dot_paths(basis * (-gbar)[None], onehot, prec)
            zcb_ref[i] += _dot_paths(basis * (gbar * dwr)[None], onehot,
                                     prec)
            pcb_ref[i] += _dot_paths(basis * (-ub)[None], onehot, prec)
            return (xb, yb)

        xb, yb = jax.lax.fori_loop(0, n, body,
                                   (cxn_ref[0], cyn_ref[0]))
        dy0_ref[0, 0] += jnp.sum(yb)

    # ---------------------------------------------------------- XLA wrapper
    def _prep(gam_params, tables):
        w1, w2, w3 = gam_params["W"]
        b1, b2, b3 = gam_params["b"]
        ccT = jnp.swapaxes(tables["cc"], -1, -2)           # (N, D, P)
        # fold the Γ output bias into the compensator table's T_0 row:
        # (gam + b3) - comp == gam - (comp - b3), exactly
        ccT = ccT.at[:, 0, :].add(-b3[0])
        return (w1.T, b1[:, None], w2, b2[:, None], w3, ccT,
                jnp.swapaxes(tables["pc"], -1, -2),
                jnp.swapaxes(tables["zc"], -1, -2),
                tables["lo"][:, None], tables["hi"][:, None])

    def _tile4(a, n, grid):
        """(N, B) -> (N, G, 8, L) view matching the per-tile path order."""
        return a.reshape(n, grid, _R, L)

    def _fwd_call(gam_params, y0, tables, dw, j, save=True):
        n, batch = dw.shape
        grid = batch // TILE
        w1T, b1, w2, b2, w3, ccT, pcT, zcT, lo, hi = _prep(gam_params,
                                                           tables)
        vm = pl.BlockSpec(memory_space=pltpu.VMEM)
        sm = pl.BlockSpec(memory_space=pltpu.SMEM)
        tile = pl.BlockSpec((n, 1, _R, L), lambda t: (0, t, 0, 0),
                            memory_space=pltpu.VMEM)
        out1 = pl.BlockSpec((1, _R, L), lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)
        f32 = jax.ShapeDtypeStruct
        res_specs = [tile, tile] if save else []
        res_shapes = ([f32((n, grid, _R, L), jnp.float32),
                       f32((n, grid, _R, L), jnp.float32)] if save else [])
        outs = pl.pallas_call(
            _make_fwd_kernel(save),
            grid=(grid,),
            in_specs=[tile, tile, vm, vm, vm, sm, sm, vm, vm, vm, vm, vm,
                      sm],
            out_specs=[out1, out1] + res_specs,
            out_shape=[f32((grid, _R, L), jnp.float32),
                       f32((grid, _R, L), jnp.float32)] + res_shapes,
            interpret=interpret,
        )(_tile4(dw, n, grid), _tile4(j, n, grid), ccT, pcT, zcT, lo, hi,
          w1T, b1, w2, b2, w3, jnp.reshape(y0, (1, 1)))
        xn, yn = outs[0], outs[1]
        xs, ys = (outs[2], outs[3]) if save else (None, None)
        return (xn.reshape(batch), yn.reshape(batch), xs, ys)

    def _bwd_call(gam_params, tables, dw, j, xs, ys, cxn, cyn):
        n, batch = dw.shape
        grid = batch // TILE
        w1T, b1, w2, b2, w3, ccT, pcT, zcT, lo, hi = _prep(gam_params,
                                                           tables)
        vm = pl.BlockSpec(memory_space=pltpu.VMEM)
        sm = pl.BlockSpec(memory_space=pltpu.SMEM)
        tile = pl.BlockSpec((n, 1, _R, L), lambda t: (0, t, 0, 0),
                            memory_space=pltpu.VMEM)
        in1 = pl.BlockSpec((1, _R, L), lambda t: (t, 0, 0),
                           memory_space=pltpu.VMEM)
        acc = lambda *shape: pl.BlockSpec(
            shape, lambda t, _s=len(shape): (0,) * _s,
            memory_space=pltpu.VMEM)
        f32 = jax.ShapeDtypeStruct
        outs = pl.pallas_call(
            _bwd_kernel,
            grid=(grid,),
            in_specs=[tile, tile, vm, vm, vm, sm, sm, vm, vm, vm, vm, vm,
                      tile, tile, in1, in1],
            out_specs=[acc(h, 3), acc(h, 1), acc(h, h), acc(h, 1),
                       acc(h, 1), acc(n, d_, p_), acc(n, d_, p_),
                       acc(n, d_, p_), sm],
            out_shape=[f32((h, 3), jnp.float32), f32((h, 1), jnp.float32),
                       f32((h, h), jnp.float32), f32((h, 1), jnp.float32),
                       f32((h, 1), jnp.float32),
                       f32((n, d_, p_), jnp.float32),
                       f32((n, d_, p_), jnp.float32),
                       f32((n, d_, p_), jnp.float32),
                       f32((1, 1), jnp.float32)],
            interpret=interpret,
        )(_tile4(dw, n, grid), _tile4(j, n, grid), ccT, pcT, zcT, lo, hi,
          w1T, b1, w2, b2, w3, xs, ys,
          cxn.reshape(grid, _R, L), cyn.reshape(grid, _R, L))
        dw1c, db1, dw2, db2, dw3, ccb, pcb, zcb, dy0 = outs
        # b3's cotangent: it entered as -1 on cc's T_0 row for every
        # (step, piece)
        db3 = -jnp.sum(ccb[:, 0, :])[None]
        gam_grads = {"W": [dw1c.T, dw2, dw3], "b": [db1[:, 0], db2[:, 0],
                                                    db3]}
        tbar = {"cc": jnp.swapaxes(ccb, -1, -2),
                "pc": jnp.swapaxes(pcb, -1, -2),
                "zc": jnp.swapaxes(zcb, -1, -2),
                "lo": jnp.zeros_like(tables["lo"]),
                "hi": jnp.zeros_like(tables["hi"])}
        return (gam_grads, dy0[0, 0], tbar,
                jnp.zeros_like(dw), jnp.zeros_like(j))

    @jax.custom_vjp
    def rollout(gam_params, y0, tables, dw, j):
        x_n, y_n, _, _ = _fwd_call(gam_params, y0, tables, dw, j,
                                   save=False)
        return x_n, y_n

    def fwd(gam_params, y0, tables, dw, j):
        x_n, y_n, xs, ys = _fwd_call(gam_params, y0, tables, dw, j)
        return (x_n, y_n), (gam_params, tables, dw, j, xs, ys)

    def bwd(res, cot):
        gam_params, tables, dw, j, xs, ys = res
        cxn, cyn = cot
        return _bwd_call(gam_params, tables, dw, j, xs, ys, cxn, cyn)

    rollout.defvjp(fwd, bwd)
    return rollout
