#!/usr/bin/env python
"""A/B matrix for the fused whole-rollout kernel (round 3).

Measures the merton speed config train epoch (10 inner steps, batch 2^17)
across in-kernel (select precision, head precision) x TILE, plus the XLA
(non-fused) reference.  Precision is the whole fused-kernel story
(matrices of 2026-08-18, PRE-scan_chunk XLA row): XLA 4.75e8
paths·steps/s; fused all-DEFAULT 4.69e8 (gate-failing select numerics);
fused HIGHEST-selects + DEFAULT-heads 4.05e8 (gate-failing too — the
2026-08-19 precision-consistency correction, BASELINE.md); fused
all-HIGHEST 2.3-3.0e8 (the corrected shipped default, gate PASS).  The
XLA reference row now includes the shipped scan_chunk=2 (+12%, ~5.3e8),
widening the verdict.
Mosaic lowers only DEFAULT and HIGHEST in-kernel (HIGH raises
NotImplementedError on the chip) — see ops/pallas_rollout precision note.

Usage:
  PYTHONPATH=.:$PYTHONPATH python scripts/fused_ab.py [--batch 131072] \
      [--cells highest:default:1024,default:default:4096,...]
Cell syntax: <select_prec>:<head_prec>:<tile>; "none" = module default.
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax


def measure_one(batch, inner, fused, precision, head_precision, tile):
    import deepfbsdejsolvers_tpu.ops.pallas_rollout as pr

    from deepfbsdejsolvers_tpu.models.merton import make_merton_default
    from deepfbsdejsolvers_tpu.ops.compensator import CompensatorSpec
    from deepfbsdejsolvers_tpu.solvers.pricing import PricingSolver
    from deepfbsdejsolvers_tpu.solvers.train import make_adam, make_epoch_fn

    old_tile = pr.TILE
    pr.TILE = tile
    try:
        model = make_merton_default(jump_sampler="icdf",
                                    price_mode="chebyshev")
        solver = PricingSolver(
            model, "global",
            compensator=CompensatorSpec(kind="quadrature",
                                        x_interp="chebyshev", n_cheb=64),
            hoist=True, hoist_interp="piecewise",
            # the SHIPPED XLA baseline includes scan_chunk=2 (+12%, commit
            # "Ship scan_chunk=2"); the fused kernel has no scan, so the
            # knob only shapes the reference row — without it the A/B
            # flatters the kernel by ~12%
            scan_chunk=0 if fused else 2,
            fused_rollout=fused, fused_precision=precision,
            fused_head_precision=head_precision)
        params = solver.init_params(jax.random.key(0))
        optimizer = make_adam(4e-4)
        opt_state = optimizer.init(params)
        loss_fn = solver.build_loss(batch)
        epoch = make_epoch_fn(loss_fn, optimizer, inner)
        key = jax.random.key(1)
        for w in range(2):
            params, opt_state, loss = epoch(params, opt_state,
                                            jax.random.fold_in(key, 1000 + w))
            jax.block_until_ready(loss)
        times = []
        for r in range(3):
            t0 = time.perf_counter()
            params, opt_state, loss = epoch(params, opt_state,
                                            jax.random.fold_in(key, r))
            jax.block_until_ready(loss)
            times.append(time.perf_counter() - t0)
        med = sorted(times)[1]
        return batch * model.N * inner / med, times, float(loss)
    finally:
        pr.TILE = old_tile


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2**17)
    p.add_argument("--inner", type=int, default=10)
    p.add_argument("--cells", type=str,
                   default="none:none:1024,none:none:4096,"
                           "default:default:1024,default:default:4096,"
                           "highest:highest:1024")
    args = p.parse_args()

    tput, times, loss = measure_one(args.batch, args.inner, False, None,
                                    None, 1024)
    print(f"xla       tile=-     sel=-       head=-       "
          f"{tput:.3e}  {times}  loss={loss:.6f}", flush=True)
    for cell in args.cells.split(","):
        sel, head, tile = cell.split(":")
        sel = None if sel == "none" else sel
        head = None if head == "none" else head
        tile = int(tile)
        try:
            tput, times, loss = measure_one(
                args.batch, args.inner, True, sel, head, tile)
            print(f"fused     tile={tile:<5d} sel={sel or 'highest*':<7s} "
                  f"head={head or 'default*':<9s} "
                  f"{tput:.3e}  {times}  loss={loss:.6f}", flush=True)
        except Exception as e:
            print(f"fused     tile={tile:<5d} sel={sel or 'highest*':<7s} "
                  f"head={head or 'default*':<9s} "
                  f"FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
