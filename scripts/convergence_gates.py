#!/usr/bin/env python
"""Reproduce the BASELINE.md accuracy-gate matrix on real hardware.

Each gate trains a solver to convergence on the standard budget
(3 phases x 8 outer epochs x 100 Adam steps, batch 8192, lr 3e-3/1e-3/3e-4)
and reports |Y0 - oracle| against the model's closed-form/FFT price.
Runs on whatever jax.devices() provides (TPU ~15 min total; CPU much longer).

Usage: python scripts/convergence_gates.py [gate ...]
Gates: merton_speed merton_direct merton_cheb vg_direct vg_speed merton_global
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
             phases=(3e-3, 1e-3, 3e-4), **solver_kw):
    solver = PricingSolver(model, scheme, **solver_kw)
    params = solver.init_params(jax.random.key(0))
    key = jax.random.key(1)
    for phase, lr in enumerate(phases):
        res = fit(loss_fn=solver.build_loss(batch), params=params,
                  key=jax.random.fold_in(key, phase), lrate=lr,
                  num_epoch=100, num_epoch_ext=8,
                  y0_fn=solver.y0_estimate, verbose=False)
        params = res.params
    y0 = float(np.mean(res.y0_history[-5:]))
    err = abs(y0 - oracle)
    record = {"gate": name, "y0": y0, "oracle": oracle, "abs_error": err,
              "pass_1e-3": err <= 1e-3}
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

    registry = {
        # The production speed config (bench.py): cheb compensator + cheb
        # pricer + icdf sampler, full f32. BASELINE.md: 1.2e-4.
        "merton_speed": lambda: run_gate(
            "merton_speed",
            make_merton_default(jump_sampler="icdf", price_mode="chebyshev"),
            merton_oracle, "multistep1", compensator=cheb64),
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
        "vg_speed": lambda: run_gate(
            "vg_speed",
            dataclasses.replace(vg, price_eval="chebyshev"),
            vg_oracle, "global", compensator=cheb64),
    }
    gates = args.gates if args.gates != ["all"] else list(registry)
    for g in gates:
        registry[g]()


if __name__ == "__main__":
    main()
