#!/usr/bin/env python
"""Calibrate the mfg_lq_* gate budgets on the chip.

The LQ oracle (eval/mfg_lq_oracle.py) sits at ~-48.3 while Glorot nets
read ~0 at init, so unlike the pricing gates the budget question is
"how many Adam steps until the readout travels 48 units and settles
within 1e-3 RELATIVE (|err| <= 0.048)".  This study sweeps
scheme x (steps, peak_lr, batch) and prints per-cell relative errors so
the registry budgets (scripts/convergence_gates.py, mfg_lq_* rows) are
measured, not guessed.

Usage: python scripts/mfg_lq_study.py [--schemes all] [--cells default]
"""
import argparse
import dataclasses
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from deepfbsdejsolvers_tpu.models.mfg_smart_grid import make_mfg_default

SCHEMES = ("global", "multistep", "sumlocal", "sumlocal_reg",
           "multistep_reg")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--schemes", default="all")
    p.add_argument("--cells", default="4800x6e-3x4096,9600x6e-3x4096")
    p.add_argument("--seeds", type=int, default=2)
    args = p.parse_args()

    import convergence_gates as cg

    schemes = SCHEMES if args.schemes == "all" else args.schemes.split(",")
    cells = []
    for cell in args.cells.split(","):
        steps, lr, batch = cell.split("x")
        cells.append((int(steps), float(lr), int(batch)))

    model = dataclasses.replace(make_mfg_default(f0=0.0, f1=0.0),
                                jump_sampler="icdf")
    for scheme, (steps, lr, batch) in itertools.product(schemes, cells):
        rec = cg.run_mfg_lq_gate(
            f"lq_{scheme}_{steps}x{lr:g}x{batch}", model, scheme,
            batch=batch, peak_lr=lr, steps=steps, seeds=args.seeds,
            warm_y0=(scheme == "global"))
        # run_mfg_lq_gate already prints the JSON record


if __name__ == "__main__":
    main()
