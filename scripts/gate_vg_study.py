#!/usr/bin/env python
"""Pin the VG Global gate (VERDICT r1 item 7): seed-CI + trailing-average
readout + longer budget + aLin bias decomposition, against the Carr-Madan
FFT oracle (pricingModels.py:156-179; mainVG.py:67-69).

Usage: python scripts/gate_vg_study.py [--seeds 5] [--variants ...]
"""

import argparse
import dataclasses
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deepfbsdejsolvers_tpu.models.variance_gamma import make_vg_default
from deepfbsdejsolvers_tpu.ops.compensator import CompensatorSpec
from deepfbsdejsolvers_tpu.solvers.pricing import PricingSolver
from deepfbsdejsolvers_tpu.solvers.train import fit

CHEB64 = CompensatorSpec(x_interp="chebyshev", n_cheb=64,
                         n_hermite=8, n_laguerre=12)


def run_once(seed: int, *, batch=8192, steps=2400, tail_epochs=6,
             peak_lr=3e-3, a_lin=0.1, warm_y0=True, n_steps=None,
             solver_kw=None):
    model = dataclasses.replace(make_vg_default(a_lin=a_lin),
                                price_eval="chebyshev")
    if n_steps is not None:
        model = dataclasses.replace(model, N=n_steps)
    oracle = model.price_at_origin()
    solver = PricingSolver(model, "global", compensator=CHEB64,
                           **(solver_kw or {}))
    params = solver.init_params(jax.random.key(seed))
    if warm_y0:
        m0 = dataclasses.replace(make_vg_default(a_lin=0.0),
                                 price_eval="chebyshev")

        @jax.jit
        def payoff_mc(k):
            def body(x, i):
                j = m0.sample_jumps(jax.random.fold_in(k, i), x.shape)
                return m0.step(i, x, j, jnp.zeros_like(x)), None

            x, _ = jax.lax.scan(body, m0.init_x(65536), jnp.arange(m0.N))
            return jnp.exp(-m0.r * m0.T) * jnp.mean(m0.payoff(x))

        y0_est = payoff_mc(jax.random.key(10_000 + seed))
        params["gam"]["y0"] = jnp.asarray(y0_est, jnp.float32)
    lrate = optax.cosine_decay_schedule(peak_lr, steps)
    num_epoch = 100
    res = fit(loss_fn=solver.build_loss(batch), params=params,
              key=jax.random.key(1000 + seed), lrate=lrate,
              num_epoch=num_epoch, num_epoch_ext=steps // num_epoch,
              y0_fn=solver.y0_estimate, verbose=False)
    y0 = float(np.mean(res.y0_history[-tail_epochs:])) if tail_epochs > 1 \
        else float(res.y0_history[-1])
    return y0, abs(y0 - oracle), oracle


def _ts_cell(n, width=None):
    """VG N-resolution cell (round-4 study, the Merton n*_ts twin —
    scripts/gate_global_study.py): coupled aLin=0.1 Global at a finer time
    grid, time feature rescaled to the reference's N=30 range so net
    capacity is not the confound, hoisted piecewise tables to keep big-N
    affordable.  Adjudicates c/sqrtN (strong-Euler rectification, NO floor)
    vs a+b/N (floor) for the VG coupled bias, as Merton's did.

    ``width`` widens BOTH heads from the reference's (21, 21) — the
    round-5 capacity study: the round-4 +0.8-1.1e-3 plateau at N>=480 was
    attributed to net-approximation-error rectification through the
    coupling, which a bigger head should shrink (VERDICT r4 item 3)."""
    kw = dict(time_scale=30.0 / n, hoist=True, hoist_interp="piecewise")
    if width is not None:
        kw["hidden"] = (width, width)
    return dict(tail_epochs=6, warm_y0=True, n_steps=n, solver_kw=kw)


def _long(cell):
    c = dict(cell)
    c.update(steps=4800, tail_epochs=12)
    return c


VARIANTS = {
    "std": dict(),
    "long": dict(steps=4800, tail_epochs=12),
    "alin005": dict(a_lin=0.05),
    "alin0": dict(a_lin=0.0),
    "n30_ts": _ts_cell(30),
    "n60_ts": _ts_cell(60),
    "n120_ts": _ts_cell(120),
    "n240_ts": _ts_cell(240),
    "n480_ts": _ts_cell(480),
    "n960_ts": _ts_cell(960),
    "n1920_ts": _ts_cell(1920),
    # Attribution cell for the N=960 error RISE (all seeds biased LOW,
    # mean 1.62e-3 vs 0.31e-3 at N=240): same grid, hoist OFF — if the
    # bias vanishes, the per-step hoisted-table fit error accumulating
    # linearly into the pure-jump Y recursion is the cause (there is no
    # dW term to dominate it at small dt).
    "n960_nohoist": dict(tail_epochs=6, warm_y0=True, n_steps=960,
                         solver_kw=dict(time_scale=30.0 / 960.0)),
    # round-5 capacity study (VERDICT r4 item 3)
    "n240_w64": _ts_cell(240, 64),
    "n480_w64": _ts_cell(480, 64),
    "n960_w64": _ts_cell(960, 64),
    "n240_w128": _ts_cell(240, 128),
    "n480_w128": _ts_cell(480, 128),
    "n960_w128": _ts_cell(960, 128),
    # round-5 budget arm: the decisive cells at a doubled (4800-step)
    # cosine schedule — separates optimization budget from capacity in
    # the plateau (BASELINE.md round-5 VG section).  n240_w21_long is the
    # budget-only control at the reference width.
    "n240_w21_long": _long(_ts_cell(240)),
    "n240_w64_long": _long(_ts_cell(240, 64)),
    "n480_w128_long": _long(_ts_cell(480, 128)),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, default=5)
    p.add_argument("--first-seed", type=int, default=0,
                   help="run seeds [first, first+seeds) — lets a driver "
                        "wrap each seed in its own timeout-bounded process "
                        "(the axon tunnel stalls long multi-fit runs)")
    p.add_argument("--variants", nargs="*", default=list(VARIANTS))
    args = p.parse_args()
    summary = {}
    for name in args.variants:
        errs, y0s = [], []
        for seed in range(args.first_seed, args.first_seed + args.seeds):
            y0, err, oracle = run_once(seed, **VARIANTS[name])
            errs.append(err)
            y0s.append(y0)
            print(json.dumps({"variant": name, "seed": seed, "y0": y0,
                              "oracle": oracle, "abs_error": err}), flush=True)
        errs = np.asarray(errs)
        summary[name] = {
            "mean_y0": float(np.mean(y0s)), "std_y0": float(np.std(y0s)),
            "mean_err": float(errs.mean()), "max_err": float(errs.max()),
            "pass_rate_1e-3": float((errs <= 1e-3).mean()),
        }
        print(json.dumps({"summary": name, **summary[name]}), flush=True)
    print(json.dumps({"all": summary}), flush=True)


if __name__ == "__main__":
    main()
