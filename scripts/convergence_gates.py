#!/usr/bin/env python
"""Reproduce the BASELINE.md accuracy-gate matrix on real hardware.

Each gate trains a solver to convergence on the standard budget
(3 phases x 8 outer epochs x 100 Adam steps, batch 8192, lr 3e-3/1e-3/3e-4)
and reports |Y0 - oracle| against the model's closed-form/FFT price.
Runs on whatever jax.devices() provides (TPU ~15 min total; CPU much longer).

Usage: python scripts/convergence_gates.py [gate ...]
Gates: merton_speed merton_speed_fused merton_speed_mc merton_direct
       merton_cheb merton_global merton_coupled_direct
       merton_global_extrapolated vg_direct vg_speed
       vg_global_extrapolated vg_half_coupling  (or: all)
"""

import argparse
import dataclasses
import json
import sys

sys.path.insert(0, ".")

import jax
import numpy as np

from deepfbsdejsolvers_tpu.models.merton import make_merton_default
from deepfbsdejsolvers_tpu.models.variance_gamma import make_vg_default
from deepfbsdejsolvers_tpu.ops.compensator import CompensatorSpec
from deepfbsdejsolvers_tpu.solvers.pricing import PricingSolver
from deepfbsdejsolvers_tpu.solvers.train import fit


def run_gate(name, model, oracle, scheme, batch=8192,
             peak_lr=6e-3, steps=4800, seeds=1, tail=12, warm_y0=False,
             **solver_kw):
    """Train ``seeds`` independent runs and report per-seed + aggregate error.

    Round-2 protocol: one cosine-decayed fit (peak 6e-3 over 4800 steps) with
    a trailing-average Y0 readout — the schedule the gate studies validated
    under the reference's mean-over-steps loss semantics (the round-1
    3-phase constant-lr budget undertrains under that scale).  Single-run
    numbers are NOT reproducible statements at this budget — the coupled
    configs' readouts scatter run-to-run by ~1e-3 — so robust gates use
    seeds >= 3 and report the max.  See the BASELINE.md gate study."""
    import optax

    solver = PricingSolver(model, scheme, **solver_kw)
    errs, y0s = [], []
    # 400 steps per outer epoch: fewer host<->device round-trips (the axon
    # tunnel has stalled under high dispatch volume) with the same total
    # budget; the trailing-average window is `tail` outer epochs.
    num_epoch = 400
    for seed in range(seeds):
        params = solver.init_params(jax.random.key(seed))
        if warm_y0:
            params = solver.warm_start_y0(params,
                                          jax.random.key(9000 + seed))
        res = fit(loss_fn=solver.build_loss(batch), params=params,
                  key=jax.random.key(1 + 100 * seed),
                  lrate=optax.cosine_decay_schedule(peak_lr, steps),
                  num_epoch=num_epoch, num_epoch_ext=steps // num_epoch,
                  y0_fn=solver.y0_estimate, verbose=False)
        y0 = float(np.mean(res.y0_history[-max(tail // 4, 2):]))
        y0s.append(y0)
        errs.append(abs(y0 - oracle))
    record = {"gate": name, "y0": y0s if seeds > 1 else y0s[0],
              "oracle": oracle, "abs_error": max(errs),
              "mean_error": float(np.mean(errs)),
              "pass_1e-3": max(errs) <= 1e-3}
    print(json.dumps(record), flush=True)
    return record


def run_extrapolated_gate(name, make_model, oracle, compensator, seeds=3,
                          a_lin=0.1, peak_lr=3e-3, steps=2400, tail=12,
                          batch=8192):
    """Richardson-extrapolated coupled-Global gate: per seed, train the
    Global scheme at aLin and aLin/2 (warm Y0 start) and report
    2*Y0(aLin/2) - Y0(aLin) — the coupling-rectification bias is linear in
    aLin (BASELINE.md; same structure for Merton and VG), so the
    extrapolation cancels it.  ``make_model(a)`` builds the model at
    coupling strength a."""
    import optax

    errs, y0s = [], []
    num_epoch = 400
    for seed in range(seeds):
        pair = []
        for a in (a_lin / 2, a_lin):
            model = make_model(a)
            solver = PricingSolver(model, "global", compensator=compensator)
            params = solver.init_params(jax.random.key(seed))
            params = solver.warm_start_y0(params, jax.random.key(9000 + seed))
            res = fit(loss_fn=solver.build_loss(batch), params=params,
                      key=jax.random.key(1 + 100 * seed),
                      lrate=optax.cosine_decay_schedule(peak_lr, steps),
                      num_epoch=num_epoch, num_epoch_ext=steps // num_epoch,
                      y0_fn=solver.y0_estimate, verbose=False)
            pair.append(float(np.mean(res.y0_history[-max(tail // 4, 2):])))
        y0 = 2.0 * pair[0] - pair[1]
        y0s.append(y0)
        errs.append(abs(y0 - oracle))
    record = {"gate": name, "y0": y0s,
              "oracle": oracle, "abs_error": max(errs),
              "mean_error": float(np.mean(errs)),
              "pass_1e-3": max(errs) <= 1e-3}
    print(json.dumps(record), flush=True)
    return record


def main():
    p = argparse.ArgumentParser()
    p.add_argument("gates", nargs="*", default=["merton_speed"])
    args = p.parse_args()

    merton = make_merton_default()
    merton_oracle = merton.price_at_origin()
    vg = make_vg_default()
    vg_oracle = vg.price_at_origin()
    cheb64 = CompensatorSpec(x_interp="chebyshev", n_cheb=64)
    # the round-3 headline speed path: hoisted tables + piecewise evaluator
    speed_kw = dict(compensator=cheb64, hoist=True, hoist_interp="piecewise")

    registry = {
        # The robust speed-config gate: UNcoupled Merton (aLin=0), Global
        # scheme with the warm Y0 start — the round-2 study protocol that
        # passed 5/5 seeds at <= 2.2e-4 (trainable-scalar readout, tight).
        # The aLin=0.1 coupled configs carry an inherent ±(1-3.5)e-3
        # scheme-level deviation at any budget (BASELINE.md floor analysis;
        # removable by aLin extrapolation), and the multistep U(0,x0) net
        # readout has occasional ±3e-3 outlier seeds even uncoupled — both
        # are kept as diagnostics, not hard gates.
        "merton_speed": lambda: run_gate(
            "merton_speed",
            make_merton_default(a_lin=0.0, jump_sampler="icdf",
                                price_mode="chebyshev"),
            merton_oracle, "global", seeds=3,
            peak_lr=3e-3, steps=2400, warm_y0=True, **speed_kw),
        # The same speed-config gate through the fused whole-rollout Pallas
        # kernels (ops/pallas_rollout.py): forward + hand-adjoint backward
        # each as ONE kernel.  Gradients match XLA autodiff to 3e-5 rel
        # (tests/test_pallas_rollout.py), so this gate is the end-to-end
        # on-hardware confirmation that the fused path trains to the same
        # accuracy as merton_speed.
        "merton_speed_fused": lambda: run_gate(
            "merton_speed_fused",
            make_merton_default(a_lin=0.0, jump_sampler="icdf",
                                price_mode="chebyshev"),
            merton_oracle, "global", seeds=3,
            peak_lr=3e-3, steps=2400, warm_y0=True, fused_rollout=True,
            **speed_kw),
        # The reference-exact MC-5000 compensator LAW through the same
        # hoisted tables (per-step fresh node draws swept at the collocation
        # points instead of the full batch — the round-3 fast exact-law
        # path, 1.40e8 paths*steps/s vs 6.38e5 direct).
        "merton_speed_mc": lambda: run_gate(
            "merton_speed_mc",
            make_merton_default(a_lin=0.0, jump_sampler="icdf",
                                price_mode="chebyshev"),
            merton_oracle, "global", seeds=3,
            peak_lr=3e-3, steps=2400, warm_y0=True,
            compensator=CompensatorSpec(kind="mc", n_mc=5000,
                                        x_interp="chebyshev", n_cheb=64),
            hoist=True, hoist_interp="piecewise"),
        "merton_multistep_diag": lambda: run_gate(
            "merton_multistep_diag",
            make_merton_default(a_lin=0.0, jump_sampler="icdf",
                                price_mode="chebyshev"),
            merton_oracle, "multistep1", compensator=cheb64, seeds=3),
        "merton_coupled_diag": lambda: run_gate(
            "merton_coupled_diag",
            make_merton_default(jump_sampler="icdf", price_mode="chebyshev"),
            merton_oracle, "multistep1", compensator=cheb64, seeds=3),
        # DIRECT coupled-Global gate, no extrapolation: the round-3
        # ts-series (scripts/gate_global_study.py n*_ts cells) REFUTED the
        # round-2 "a ~ 1.5e-3 dt->0 floor" — the coupled bias follows the
        # strong-Euler law ~0.027/sqrt(N) (3.69/2.77/2.07/1.61/0.70/0.56 e-3
        # at N = 50/100/200/400/800/1600) and crosses 1e-3 between N=800
        # (predicted 0.96e-3 — AT the gate, per-seed passes are marginal:
        # 3/3 in the study draw, 2/3 under this gate's seed protocol) and
        # N=1600 (predicted 0.68e-3, robustly inside), so the operational
        # gate runs N=1600.  The time feature is rescaled to the N=50 range
        # (time_scale=50/N) so net capacity is not the confound (raw-index
        # features saturate the tanh layer at N>=800, BASELINE.md).
        # Reference scheme: SolversJumpDiff.py:17-73 at a finer grid than
        # mainMerton's N=50.
        "merton_coupled_direct": lambda: run_gate(
            "merton_coupled_direct",
            dataclasses.replace(
                make_merton_default(a_lin=0.1, jump_sampler="icdf",
                                    price_mode="chebyshev"), N=1600),
            merton_oracle, "global", seeds=3, peak_lr=3e-3, steps=2400,
            warm_y0=True, time_scale=50.0 / 1600.0, **speed_kw),
        # Gate-closing technique for the COUPLED Global scheme at the
        # reference's own N=50: the coupling-rectification bias is linear in
        # aLin (BASELINE.md floor analysis), so 2*Y0(aLin/2) - Y0(aLin)
        # cancels it.
        "merton_global_extrapolated": lambda: run_extrapolated_gate(
            "merton_global_extrapolated",
            lambda a: make_merton_default(a_lin=a, jump_sampler="icdf",
                                          price_mode="chebyshev"),
            merton_oracle, cheb64, seeds=3),
        # VG twins of the coupled-Global gates (BASELINE.md VG study: the
        # same linear coupling-rectification bias; Richardson readout landed
        # 2.0e-7 from the FFT oracle on seed means).
        "vg_global_extrapolated": lambda: run_extrapolated_gate(
            "vg_global_extrapolated",
            lambda a: dataclasses.replace(
                make_vg_default(a_lin=a), price_eval="chebyshev"),
            vg_oracle, cheb64, seeds=3),
        # aLin=0.05 coupled VG row — passed 5/5 in the study (+0.73e-3).
        "vg_half_coupling": lambda: run_gate(
            "vg_half_coupling",
            dataclasses.replace(make_vg_default(a_lin=0.05),
                                price_eval="chebyshev"),
            vg_oracle, "global", compensator=cheb64, seeds=3,
            peak_lr=3e-3, steps=2400, warm_y0=True),
        # Reference-faithful numerics on the same budget.
        "merton_direct": lambda: run_gate(
            "merton_direct", merton, merton_oracle, "multistep1",
            compensator=CompensatorSpec()),
        # Chebyshev compensator alone. BASELINE.md: 4.3e-4.
        "merton_cheb": lambda: run_gate(
            "merton_cheb", make_merton_default(jump_sampler="icdf"),
            merton_oracle, "multistep1", compensator=cheb64),
        # Global scheme (trainable Y0) — optimization-dominated, see
        # BASELINE.md note.
        "merton_global": lambda: run_gate(
            "merton_global", make_merton_default(jump_sampler="icdf"),
            merton_oracle, "global", compensator=cheb64),
        # VG against the Carr-Madan FFT price.
        "vg_direct": lambda: run_gate(
            "vg_direct", vg, vg_oracle, "global",
            compensator=CompensatorSpec(n_hermite=5, n_laguerre=8)),
        # The shipped bench.py --model vg config: collocated price_eval +
        # the iCDF subordinator sampler (the gamma rejection loop was ~77%
        # of VG device time; icdf is law-exact to the table fit — see
        # models/variance_gamma.py and tests/test_fast_paths.py).
        "vg_speed": lambda: run_gate(
            "vg_speed",
            dataclasses.replace(vg, price_eval="chebyshev",
                                jump_sampler="icdf"),
            vg_oracle, "global", **speed_kw),
    }
    gates = args.gates if args.gates != ["all"] else list(registry)
    for g in gates:
        registry[g]()


if __name__ == "__main__":
    main()
