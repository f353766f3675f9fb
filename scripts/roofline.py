#!/usr/bin/env python
"""Absolute roofline for the headline train step (VERDICT r4 weak #5).

Prior rounds argued "XLA is the floor" from relative A/Bs (adjoint,
fused-rollout, scan-chunk ablations).  This script turns that into an
absolute utilization number on the chip in hand:

1. MEASURE the hardware ceilings (not datasheet values — the axon
   v5-lite chip in this image reports what it reports).  All ceilings
   use dependent in-jit op chains timed at two chain lengths (the
   marginal time cancels the ~26 ms tunnel dispatch overhead, and a
   host scalar fetch is the only reliable barrier — see _time_scalar):
     * HBM bandwidth: big-array copy (2 streams) and triad (3 streams);
     * VPU f32 FLOP rate: a 512-deep unrolled FMA chain on a VMEM-tile
       working set (arithmetic intensity ~512 FLOP/byte, compute-bound);
     * MXU rate: chained 4096^3 matmuls in bf16 and f32.
2. Account the headline step (bench.py speed config, 2^17 batch):
     * XLA's own compiled-HLO cost analysis (flops, bytes accessed);
     * an analytic per-step HBM traffic floor from first principles
       (pre-drawn noise reads + scan-carry and saved-residual traffic).
3. Report: measured step time vs bytes/BW (bandwidth-bound fraction)
   and vs flops/VPU-rate (compute-bound fraction).

The workload is far from MXU-bound by construction (tiny MLP heads +
elementwise SDE math): the honest headroom statement is the bandwidth
utilization, printed last.

Usage: python scripts/roofline.py [--batch 131072] [--skip-ceilings]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _time_scalar(fn, *args, reps=5):
    """Median wall time of a jitted fn that RETURNS A SCALAR, synced by
    fetching the scalar to host.  On the axon tunnel,
    ``block_until_ready`` on array outputs can return before execution
    (measured: a 1 GiB elementwise op "completing" in 66 us) — only the
    host fetch of a value is a reliable barrier."""
    float(fn(*args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def _marginal_chain_time(make_chain, k_lo=4, k_hi=16, reps=5):
    """Per-iteration time of a dependent in-jit op chain, from the
    marginal (t(k_hi) - t(k_lo)) / (k_hi - k_lo) — cancels the ~26 ms
    tunnel dispatch/fetch overhead a single-call timing is swamped by."""
    t_lo = _time_scalar(make_chain(k_lo), reps=reps)
    t_hi = _time_scalar(make_chain(k_hi), reps=reps)
    return (t_hi - t_lo) / (k_hi - k_lo)


def measure_hbm_bw():
    n = 1 << 27  # 512 MiB f32
    x = jnp.arange(n, dtype=jnp.float32) * 1e-9

    def make_copy(k):
        @jax.jit
        def chain(x):
            def body(c, _):
                return c + 1.0, None       # read 4n + write 4n bytes
            c, _ = jax.lax.scan(body, x, None, length=k)
            return c[0]
        return lambda: chain(x)

    t = _marginal_chain_time(make_copy)
    copy_bw = 8.0 * n / t

    y = jnp.ones((n,), jnp.float32)

    def make_triad(k):
        @jax.jit
        def chain(x, y):
            def body(c, _):
                return c + 2.0 * y, None   # read 8n + write 4n bytes
            c, _ = jax.lax.scan(body, x, None, length=k)
            return c[0]
        return lambda: chain(x, y)

    t = _marginal_chain_time(make_triad)
    triad_bw = 12.0 * n / t
    return copy_bw, triad_bw


def measure_vpu_f32():
    # 8 MiB working set (fits VMEM tiles), 512 serial FMAs per element
    # per chain link: intensity ~512 FLOP/byte, compute-bound.
    n = 1 << 21
    x = jnp.linspace(0.1, 0.9, n, dtype=jnp.float32)
    iters = 512

    def make_chain(k):
        @jax.jit
        def chain(x):
            def body(c, _):
                return c * 1.000001 + 3e-7, None
            c, _ = jax.lax.scan(body, x, None, length=k * iters, unroll=64)
            return c[0]
        return lambda: chain(x)

    t = _marginal_chain_time(make_chain, k_lo=1, k_hi=4)
    return 2.0 * n * iters / t


def measure_mxu(dtype):
    m = 4096
    key = jax.random.key(0)
    a = (jax.random.normal(key, (m, m)) / np.sqrt(m)).astype(dtype)

    def make_chain(k):
        @jax.jit
        def chain(a):
            def body(c, _):
                # dependent matmul chain; rescale to keep values bounded
                c = jnp.dot(c, a, preferred_element_type=jnp.float32)
                return (c / jnp.float32(m)).astype(dtype), None
            c, _ = jax.lax.scan(body, a, None, length=k)
            return c[0, 0].astype(jnp.float32)
        return lambda: chain(a)

    t = _marginal_chain_time(make_chain, k_lo=2, k_hi=8)
    return 2.0 * m**3 / t


def headline_cost(batch):
    import bench

    from deepfbsdejsolvers_tpu.solvers.train import make_epoch_fn

    model, solver, params, optimizer, opt_state, loss_fn = bench.build(
        batch, "quadrature", parity=False, model_name="merton")
    inner = 1  # per-train-step accounting
    epoch = make_epoch_fn(loss_fn, optimizer, inner)
    key = jax.random.key(1)
    lowered = jax.jit(
        lambda p, o, k: epoch(p, o, k)).lower(params, opt_state, key)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    bytes_accessed = float(ca.get("bytes accessed", float("nan")))
    # measured per-train-step time at inner=10 (amortizes dispatch)
    epoch10 = make_epoch_fn(loss_fn, optimizer, 10)
    for w in range(2):
        params, opt_state, loss = epoch10(params, opt_state,
                                          jax.random.fold_in(key, 1000 + w))
        float(loss)  # host fetch = reliable barrier on the axon tunnel
    times = []
    for r in range(5):
        t0 = time.perf_counter()
        params, opt_state, loss = epoch10(params, opt_state,
                                          jax.random.fold_in(key, r))
        float(loss)
        times.append(time.perf_counter() - t0)
    step_time = sorted(times)[len(times) // 2] / 10.0
    return flops, bytes_accessed, step_time, model


def analytic_floor_bytes(batch, model):
    """First-principles HBM floor per train step (forward+backward).

    Per-step per-path f32 items that MUST cross HBM at 2^17 batch
    (nothing path-sized fits in the ~128 MB VMEM across 50 steps):
      forward: pre-drawn noise reads (dW, U_poisson, Z_jump = 3 reads),
      scan xs for hoisted price/compensator piecewise tables are
      coefficient-sized (negligible); saved residuals for backward under
      remat: the carry X per chunk boundary (scan_chunk=2 -> N/2
      checkpoints) + the same noise re-read in the backward sweep.
    Floor = fwd reads (3) + ckpt writes (0.5) + bwd re-reads (3 + 0.5)
          = 7 f32 streams per path-step.
    """
    n_streams = 7.0
    return 4.0 * n_streams * batch * model.N


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2**17)
    p.add_argument("--skip-ceilings", action="store_true")
    args = p.parse_args()

    out = {"device": str(jax.devices()[0])}
    if not args.skip_ceilings:
        copy_bw, triad_bw = measure_hbm_bw()
        out["hbm_copy_GBps"] = copy_bw / 1e9
        out["hbm_triad_GBps"] = triad_bw / 1e9
        out["vpu_f32_TFLOPs"] = measure_vpu_f32() / 1e12
        out["mxu_bf16_TFLOPs"] = measure_mxu(jnp.bfloat16) / 1e12
        out["mxu_f32_TFLOPs"] = measure_mxu(jnp.float32) / 1e12
        print(json.dumps(out), flush=True)

    flops, bytes_accessed, step_time, model = headline_cost(args.batch)
    out["headline_flops_per_step"] = flops
    out["headline_bytes_accessed_per_step"] = bytes_accessed
    out["headline_step_seconds"] = step_time
    out["headline_paths_steps_per_sec"] = args.batch * model.N / step_time
    out["analytic_floor_bytes_per_step"] = analytic_floor_bytes(args.batch,
                                                                model)
    bw = out.get("hbm_triad_GBps", 0) * 1e9
    if bw:
        out["t_bw_xla_bytes_s"] = bytes_accessed / bw
        out["t_bw_floor_s"] = out["analytic_floor_bytes_per_step"] / bw
        out["bw_utilization_xla_bytes"] = out["t_bw_xla_bytes_s"] / step_time
        out["bw_utilization_floor"] = out["t_bw_floor_s"] / step_time
        vpu = out.get("vpu_f32_TFLOPs", 0) * 1e12
        if vpu:
            out["t_vpu_s"] = flops / vpu
            out["vpu_utilization"] = out["t_vpu_s"] / step_time
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
