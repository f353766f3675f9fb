#!/usr/bin/env python
"""Headline benchmark: Merton global deep-BSDE training throughput.

Metric (BASELINE.json): paths*steps/sec/chip on Merton N=50, 2^17-path batch —
one full training step = simulate 50 coupled Euler steps (3 MLP heads + the
compensator sweep + the 30-term closed-form pricer in the drift, per step),
backprop through the whole rollout, Adam update.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
``vs_baseline`` is the throughput ratio against the single-host CPU anchor
recorded in bench_baseline.json (the TF-2.10 reference is CPU-only with no
published numbers — BASELINE.md; the anchor is this same workload on CPU).

Usage: python bench.py [--batch 131072] [--inner 10] [--rounds 3]
                       [--compensator quadrature|mc] [--anchor]  # measure CPU anchor
"""

import argparse
import json
import os
import sys
import time


def build(batch: int, compensator: str, parity: bool, model_name: str = "merton",
          sweep: str = None, adjoint: bool = False, fused: bool = False,
          fused_precision: str = None, scheme: str = "global"):
    import jax

    from deepfbsdejsolvers_tpu.models.merton import make_merton_default
    from deepfbsdejsolvers_tpu.ops.compensator import CompensatorSpec
    from deepfbsdejsolvers_tpu.solvers.pricing import PricingSolver
    from deepfbsdejsolvers_tpu.solvers.train import make_adam

    on_tpu = jax.devices()[0].platform == "tpu"
    if model_name == "vg":
        import dataclasses

        from deepfbsdejsolvers_tpu.models.variance_gamma import make_vg_default

        model = make_vg_default()
        if parity:
            solver = PricingSolver(
                model, scheme, compensator=CompensatorSpec(kind=compensator))
        else:
            # VG speed config: collocate the compensator AND the FFT-table
            # price interpolation (per-path gathers were the bottleneck:
            # 10.8 -> 63.8 Mpps).  Converges to ~1.3e-3 of the FFT price at
            # the standard gate budget — within the run-to-run training noise
            # of the fully-direct config (BASELINE.md).
            # jump_sampler="icdf": the round-3 VG trace put ~80% of device
            # time in jax.random.gamma's rejection while-loop; the fixed-
            # shape subordinator quantile is a host-precomputed piecewise
            # table indexed by a normal draw instead (law-exact to the
            # table fit, ~1.6e-5 sup in f32 — models/variance_gamma.py).
            # scan_chunk=2: before the icdf sampler the VG scan was
            # sampler-bound and chunking was noise (+1%); with the sampler
            # out of the way the scan-buffer traffic dominates again and
            # chunking pays as it does for Merton — interleaved A/B
            # (scripts/scan_chunk_ab.py --model vg): 3.9-4.1e8 vs
            # 3.5-3.7e8 flat (+8-19% across sessions).
            model = dataclasses.replace(model, price_eval="chebyshev",
                                        jump_sampler="icdf")
            solver = PricingSolver(
                model, scheme,
                compensator=CompensatorSpec(kind=compensator,
                                            x_interp="chebyshev", n_cheb=64),
                hoist=True, hoist_interp="piecewise", scan_chunk=2)
    elif model_name == "mfg":
        import dataclasses

        from deepfbsdejsolvers_tpu.models.mfg_smart_grid import make_mfg_default
        from deepfbsdejsolvers_tpu.solvers.mfg import MFGSolver

        mfg_model = make_mfg_default()
        if not parity:
            # per-path Cox rates make jax.random.poisson's rejection loop the
            # bottleneck (3x at 2^13, 11x at 2^17 with large batch)
            mfg_model = dataclasses.replace(mfg_model, jump_sampler="icdf")
        # scan_chunk=16: interleaved A/B (scripts/scan_chunk_ab.py --model
        # mfg) reads 4.10-4.16e8 vs 3.84e8 flat (+7-8%); the N=96 MFG scan
        # tolerates much larger chunks than the Merton/VG N=50/30 scans
        # (2-4 are neutral here, 8-16 pay, >=24 regresses).
        mfg = MFGSolver(mfg_model, "global",
                        scan_chunk=0 if parity else 16)
        params = mfg.init_params(jax.random.key(0))
        optimizer = make_adam(1e-3)
        losses = mfg.build_losses(batch)
        return (mfg_model, mfg, params, optimizer, optimizer.init(params),
                losses["coupled"])
    elif parity:
        # reference-faithful numerics: exact Poisson sampler, f32 heads,
        # direct sweep over the default 49-node rule (or 5000-sample MC).
        # The fused Pallas MXU kernel is the fastest parity implementation
        # on TPU (2.6x XLA on the 49-node rule, 4.5x on MC-5000 — BASELINE.md)
        # and computes the same f32 math (value/grad-gated in
        # tests/test_pallas_sweep.py); --sweep xla opts out.
        if sweep is None:
            sweep = "pallas" if on_tpu else "xla"
        model = make_merton_default()
        solver = PricingSolver(
            model, scheme, compensator=CompensatorSpec(kind=compensator),
            sweep_impl=sweep)
    else:
        # speed config (accuracy-gated in tests/test_chebyshev.py /
        # test_fast_paths.py and the convergence runs in BASELINE.md):
        # Chebyshev-collocated compensator AND pricer (both are 1-D smooth
        # functions of the spot — evaluate exactly at 64 Chebyshev points,
        # Clenshaw per path) plus inverse-CDF Poisson sampling (law equal to
        # 1e-9).  Full f32: |Y0 - oracle| = 1.2e-4 on the multistep gate.
        # bfloat16 heads are deliberately NOT used — they bias the Y0
        # readout ~3e-3 (out of gate) and no longer buy throughput once the
        # sweep is collocated.
        # Round 3: the collocation is HOISTED out of the time scan (per-step
        # coefficient tables from the pre-drawn noise's uncoupled marginals)
        # and evaluated as PIECEWISE degree-7 polynomials (one-hot MXU select
        # + Horner) instead of global degree-63 Clenshaw — profiling showed
        # the speed config was bound by the VPU issue rate of the serial
        # Clenshaw chains (scripts/profile_headline.py; 2.54e8 -> 3.96e8).
        # scan_chunk=2: outer scan over 25 chunks of 2 unrolled steps —
        # halves the scan-buffer double-buffer traffic the post-hoist trace
        # attributed ~29% of device time to.  Interleaved A/B at 2^17
        # (scripts/scan_chunk_ab.py): 5.17-5.29e8 vs 4.51-4.73e8 flat, a
        # consistent ~+12%; chunk=5 is slightly worse, chunk>=10 regresses.
        # Exact math: grads == flat scan at fixed params (tests).
        model = make_merton_default(jump_sampler="icdf",
                                    price_mode="chebyshev")
        # NOTE --sweep pallas also reaches the hoisted MC table build
        # (+3.5%, 1.43 -> 1.49e8) but is NOT the default there: the kernel's
        # node-packing quantizes the net differently from the in-body XLA
        # heads, breaking the quantization-cancellation the tables rely on —
        # measured merton_speed_mc gate FAIL at 5.7e-3 mean vs 2.1e-4 for
        # XLA-built tables (BASELINE.md MC-mode profile note).
        solver = PricingSolver(
            model, scheme,
            compensator=CompensatorSpec(kind=compensator,
                                        x_interp="chebyshev", n_cheb=64),
            hoist=True, hoist_interp="piecewise", scan_chunk=2,
            sweep_impl=sweep or "xla", adjoint=adjoint,
            fused_rollout=fused, fused_precision=fused_precision)
    params = solver.init_params(jax.random.key(0))
    optimizer = make_adam(4e-4)
    opt_state = optimizer.init(params)
    loss_fn = solver.build_loss(batch)
    return model, solver, params, optimizer, opt_state, loss_fn


def measure(batch: int, inner: int, rounds: int, compensator: str,
            parity: bool = False, model_name: str = "merton",
            sweep: str = None, rng: str = "threefry",
            adjoint: bool = False, fused: bool = False,
            fused_precision: str = None, scheme: str = "global") -> dict:
    import jax

    from deepfbsdejsolvers_tpu.solvers.train import make_epoch_fn

    model, solver, params, optimizer, opt_state, loss_fn = build(
        batch, compensator, parity, model_name, sweep, adjoint, fused,
        fused_precision, scheme)
    epoch = make_epoch_fn(loss_fn, optimizer, inner)
    # "rbg": hardware-counter PRNG — ~+10% throughput at 2^17 (threefry's
    # per-draw ALU work is a real cost in this RNG-heavy loop); kept opt-in
    # because rbg's fold_in/split have weaker statistical guarantees.
    key = (jax.random.key(1, impl="rbg") if rng == "rbg"
           else jax.random.key(1))
    # compile + 2 warmup epochs (the first post-compile epoch runs ~2x slow
    # one time — autotune/upload effects — and must not pollute the measure)
    for w in range(2):
        params, opt_state, loss = epoch(params, opt_state,
                                        jax.random.fold_in(key, 1000 + w))
        jax.block_until_ready(loss)
    per_round = []
    for r in range(rounds):
        t0 = time.perf_counter()
        params, opt_state, loss = epoch(params, opt_state,
                                        jax.random.fold_in(key, r))
        jax.block_until_ready(loss)
        per_round.append(time.perf_counter() - t0)
    med = sorted(per_round)[len(per_round) // 2]
    paths_steps = batch * model.N * inner
    return {
        "paths_steps_per_sec": paths_steps / med,
        "train_steps_per_sec": inner / med,
        "round_seconds": per_round,
        "final_loss": float(loss),
        "device": str(jax.devices()[0]),
    }


ANCHOR_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_baseline.json")


_CHILD_ENV = "_FBSDEJ_BENCH_CHILD"


def _run_with_watchdog(argv, timeout_s: int = 420, retries: int = 2) -> int:
    """Re-exec this script as a bounded child, retrying on a hang.

    The axon TPU tunnel intermittently stalls a client at startup (the
    process blocks forever inside backend init at ~0% CPU; the remote
    worker frees ~1 min after the client dies).  A stalled measurement
    would otherwise take the whole benchmark run down with it."""
    import subprocess
    import time as _time

    env = dict(os.environ, **{_CHILD_ENV: "1"})
    rc = 1
    for attempt in range(retries + 1):
        t_start = _time.monotonic()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + argv,
                env=env, timeout=timeout_s, text=True, capture_output=True)
        except subprocess.TimeoutExpired as e:
            # surface whatever the stalled child managed to print
            for stream, out in (("stdout", e.stdout), ("stderr", e.stderr)):
                if out:
                    text = out.decode() if isinstance(out, bytes) else out
                    sys.stderr.write(f"# timed-out child {stream}:\n{text}\n")
            print(f"# bench attempt {attempt + 1} timed out after "
                  f"{timeout_s}s (tunnel stall?) — retrying", file=sys.stderr)
            _time.sleep(60)  # let the remote worker release the session
            continue
        sys.stdout.write(proc.stdout)
        sys.stderr.write(proc.stderr)
        rc = proc.returncode
        if rc == 0:
            return 0
        if _time.monotonic() - t_start < 30:
            # fast failure = deterministic (bad flags, import error) — a
            # retry would just repeat it
            print(f"# bench child failed fast (rc={rc}) — not retrying",
                  file=sys.stderr)
            return rc
        print(f"# bench attempt {attempt + 1} rc={rc}", file=sys.stderr)
        _time.sleep(30)
    return rc


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2**17)
    p.add_argument("--inner", type=int, default=10)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--compensator", choices=["quadrature", "mc"],
                   default="quadrature")
    p.add_argument("--model", choices=["merton", "vg", "mfg"],
                   default="merton",
                   help="secondary workloads: VG pure-jump pricing (N=30) or "
                        "the coupled MFG smart-grid system (N=96)")
    p.add_argument("--scheme", default="global",
                   choices=["global", "multistep1", "multistep2", "sumlocal1",
                            "sumlocal2", "sumlocal_reg", "multistep_reg"],
                   help="pricing training scheme (SolversJumpDiff.py:75-513 "
                        "variants); the headline metric is the global scheme, "
                        "the others record the reference's full method sweep "
                        "(mainMerton.py:79-118) — see scripts/"
                        "scheme_throughput.py for the recorded table")
    p.add_argument("--parity", action="store_true",
                   help="reference-faithful numerics (f32, exact sampler, "
                        "49-node/MC sweep) instead of the speed config")
    p.add_argument("--sweep", choices=["xla", "pallas"], default=None,
                   help="parity-mode compensator sweep implementation "
                        "(default: pallas on TPU, xla elsewhere)")
    p.add_argument("--rng", choices=["threefry", "rbg"], default="threefry",
                   help="PRNG implementation (rbg: ~+10%% on TPU, opt-in)")
    p.add_argument("--adjoint", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="hand-written transposed-adjoint VJP for the merton "
                        "speed config (solvers/adjoint.py).  MEASURED SLOWER "
                        "(2.14e8 vs 4.22e8 at 2^17: the batched backward "
                        "recomputation materializes (N*B) intermediates - "
                        "14.5x the HBM bytes, 6.6x the FLOPs of the in-scan "
                        "streaming autodiff).  Kept as an opt-in instrument; "
                        "see BASELINE.md round-3 notes")
    p.add_argument("--fused", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="fused whole-rollout Pallas kernels for the merton "
                        "speed config (ops/pallas_rollout.py): the entire "
                        "N-step forward and hand-adjoint backward each run "
                        "as ONE kernel over batch tiles")
    p.add_argument("--fusedPrecision", choices=["default", "highest"],
                   default=None,
                   help="in-kernel SELECT-dot precision for --fused "
                        "(default: HIGHEST — exact selection; Mosaic lowers "
                        "only DEFAULT and HIGHEST in-kernel, and DEFAULT "
                        "selects fail the accuracy gate)")
    p.add_argument("--anchor", action="store_true",
                   help="measure the CPU anchor and write bench_baseline.json")
    args = p.parse_args()

    if args.fused and (args.parity or args.model != "merton"):
        p.error("--fused applies only to the merton speed config "
                "(no --parity, --model merton)")
    if args.fusedPrecision and not args.fused:
        p.error("--fusedPrecision requires --fused")
    if args.adjoint and (args.parity or args.model != "merton"):
        p.error("--adjoint applies only to the merton speed config "
                "(no --parity, --model merton)")
    if args.sweep and args.model in ("vg", "mfg"):
        p.error("--sweep applies only to --model merton (the vg/mfg "
                "builders take no sweep implementation)")
    if args.scheme != "global" and args.model == "mfg":
        p.error("--scheme applies to the pricing models (merton/vg); the "
                "MFG workload benches its global scheme")

    if os.environ.get(_CHILD_ENV) != "1" and not args.anchor:
        sys.exit(_run_with_watchdog(sys.argv[1:]))

    if args.anchor:
        import jax

        jax.config.update("jax_platforms", "cpu")
        res = measure(args.batch, args.inner, args.rounds, args.compensator,
                      args.parity)
        payload = {
            "anchor_paths_steps_per_sec": res["paths_steps_per_sec"],
            "batch": args.batch,
            "compensator": args.compensator,
            "parity": args.parity,
            "device": res["device"],
        }
        with open(ANCHOR_FILE, "w") as f:
            json.dump(payload, f, indent=1)
        print(json.dumps(payload), file=sys.stderr)
        return

    res = measure(args.batch, args.inner, args.rounds, args.compensator,
                  args.parity, args.model, args.sweep, args.rng, args.adjoint,
                  args.fused, args.fusedPrecision, args.scheme)
    vs = None
    if (args.model == "merton" and args.scheme == "global"
            and os.path.exists(ANCHOR_FILE)):
        with open(ANCHOR_FILE) as f:
            anchor = json.load(f)
        vs = res["paths_steps_per_sec"] / anchor["anchor_paths_steps_per_sec"]
    n_steps = {"merton": 50, "vg": 30, "mfg": 96}[args.model]
    scheme_tag = "global" if args.model == "mfg" else args.scheme
    print(json.dumps({
        "metric": f"{args.model}_{scheme_tag}_train_throughput",
        "value": res["paths_steps_per_sec"],
        "unit": f"paths*steps/sec/chip ({args.model} N={n_steps}, "
                f"batch 2^{args.batch.bit_length() - 1})",
        "vs_baseline": vs,
    }))
    print(f"# detail: {res}", file=sys.stderr)


if __name__ == "__main__":
    main()
