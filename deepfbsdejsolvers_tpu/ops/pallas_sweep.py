"""Pallas (Mosaic) fused compensator-sweep kernel — the framework's native tier.

The compensated-jump expectation E_J[Γ(t,X,J)] is the dominant cost of every
pricing solver: an [M, B] sweep of a small MLP over the jump-law quadrature
nodes per timestep (the reference materializes a [5000, B, 3] tensor per step,
SolversJumpDiff.py:38-39).  XLA evaluates the tiny matmuls on the VPU (the
21-wide features can't fill the 128x128 MXU), which caps throughput at VPU
FMA rate.

This kernel restructures the sweep for the MXU:

* **Node packing.**  P = 6 nodes pack into the 128-lane dimension
  (6 x 21 = 126 features); the shared hidden layer becomes one block-diagonal
  (128, 128) matmul that evaluates 6 nodes per MXU pass instead of one.
* **Rank-1 first layer.**  For every scheme the sweep's first layer collapses
  to  h1 = tanh(x ⊗ a_g + c_g)  with per-group vectors a, c ∈ R^128 computed
  once per step in JAX (the node feature enters the 3-feature input linearly,
  so its weight-column contribution folds into a and c; see
  ``pack_three_feature`` / ``pack_two_feature``).  No first-layer matmul at
  all.
* **Weighted-sum folding.**  The quadrature weights fold into the output
  block-columns (v = w_{g,p} · W2 per block), so the kernel's last stage is a
  single (TB, 128) x (128,) contraction per group — the weighted node mean
  comes out of the matmul for free.
* **Everything VMEM-resident.**  The [M, B, hidden] intermediates that XLA
  spills to HBM never exist: per batch tile all activations live in VMEM.

Forward and backward are hand-written kernels behind ``jax.custom_vjp``; the
backward recomputes the two tanh layers per tile (cheap) and accumulates the
packed weight gradients across the sequential TPU grid.  Gradients flow to the
original MLP parameters through the (differentiable) JAX-side packing.

Correctness is gated against the XLA reference implementation
(ops/compensator.py path) in tests/test_pallas_sweep.py, values and grads.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pragma: no cover - exercised only on TPU
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

LANES = 128


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _vmem_spec(*block_and_map):
    if _HAS_PLTPU and _on_tpu():
        if block_and_map:
            return pl.BlockSpec(*block_and_map, memory_space=pltpu.VMEM)
        return pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.BlockSpec(*block_and_map) if block_and_map else pl.BlockSpec()


# --------------------------------------------------------------------- packing

def _pad_lanes(x: jax.Array, axis: int = -1) -> jax.Array:
    n = x.shape[axis]
    pad = LANES - n
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def pack_hidden_block(W1: jax.Array, b1: jax.Array, pack: int) -> Tuple[jax.Array, jax.Array]:
    """Block-diagonal hidden weight (pack*H padded to 128) and tiled bias."""
    h = W1.shape[0]
    blk = jnp.zeros((pack * h, pack * h), W1.dtype)
    for p in range(pack):
        blk = jax.lax.dynamic_update_slice(blk, W1, (p * h, p * h))
    blk = _pad_lanes(_pad_lanes(blk, 0), 1)
    b = _pad_lanes(jnp.tile(b1, pack))
    return blk, b


def pack_output_block(W2: jax.Array, b2: jax.Array, weights_g: jax.Array
                      ) -> Tuple[jax.Array, jax.Array]:
    """Fold the quadrature weights into the output columns.

    ``weights_g``: (Mg, P).  Returns v (Mg, 128) with
    v[g, p*H:(p+1)*H] = weights[g, p] * W2[:, 0], and the scalar bias term
    sum(w) * b2 per group (summed over groups by the caller).
    """
    w2col = W2[:, 0]                                    # (H,)
    v = weights_g[..., None] * w2col[None, None, :]     # (Mg, P, H)
    v = _pad_lanes(v.reshape(v.shape[0], -1))           # (Mg, 128)
    wb2 = jnp.sum(weights_g) * b2[0]
    return v, wb2


def pack_three_feature(params: dict, t: jax.Array, feat_g: jax.Array,
                       x_prop: bool, weights_g: jax.Array):
    """Packed (a, c, W1b, b1b, v, wb2) for a 3-input head [t, x, f].

    ``feat_g`` (Mg, P): the per-node third feature — constant per node when
    ``x_prop`` is False (jump-diffusion: f = J or e^J), multiplied by x when
    True (pure-jump: f = x·J).  The first layer collapses to rank-1:
      x_prop=False: a = tile(W0[1]);          c = t·W0[0] + f·W0[2] + b0
      x_prop=True:  a = tile(W0[1]) + f·W0[2]; c = t·W0[0] + b0
    """
    W0, b0 = params["W"][0], params["b"][0]             # (3, H), (H,)
    W1, b1 = params["W"][1], params["b"][1]
    W2, b2 = params["W"][2], params["b"][2]
    mg, p = feat_g.shape
    h = W0.shape[1]
    base_a = jnp.tile(W0[1], p)                         # (P*H,)
    base_c = jnp.tile(t * W0[0] + b0, p)                # (P*H,)
    fcol = (feat_g[..., None] * W0[2][None, None, :]).reshape(mg, p * h)
    if x_prop:
        a = base_a[None, :] + fcol
        c = jnp.broadcast_to(base_c, (mg, p * h))
    else:
        a = jnp.broadcast_to(base_a, (mg, p * h))
        c = base_c[None, :] + fcol
    a, c = _pad_lanes(a), _pad_lanes(c)
    W1b, b1b = pack_hidden_block(W1, b1, p)
    v, wb2 = pack_output_block(W2, b2, weights_g)
    return a, c, W1b, b1b, v, wb2


def pack_two_feature(params: dict, t: jax.Array, phi_g: jax.Array,
                     weights_g: jax.Array):
    """Packed vectors for a 2-input head [t, x·φ] (the 1-net schemes:
    φ = e^J jump-diff / 1+J pure-jump).  Rank-1: a = φ·W0[1], c = t·W0[0]+b0."""
    W0, b0 = params["W"][0], params["b"][0]             # (2, H)
    W1, b1 = params["W"][1], params["b"][1]
    W2, b2 = params["W"][2], params["b"][2]
    mg, p = phi_g.shape
    h = W0.shape[1]
    a = (phi_g[..., None] * W0[1][None, None, :]).reshape(mg, p * h)
    c = jnp.broadcast_to(jnp.tile(t * W0[0] + b0, p), (mg, p * h))
    a, c = _pad_lanes(a), _pad_lanes(c)
    W1b, b1b = pack_hidden_block(W1, b1, p)
    v, wb2 = pack_output_block(W2, b2, weights_g)
    return a, c, W1b, b1b, v, wb2


def group_nodes(nodes: jax.Array, weights: jax.Array, hidden: int
                ) -> Tuple[jax.Array, jax.Array, int]:
    """Zero-weight-pad the node set to (Mg, P) with P = 128 // hidden."""
    p = LANES // hidden
    m = nodes.shape[0]
    mg = -(-m // p)
    pad = mg * p - m
    nodes = jnp.pad(nodes, (0, pad))
    weights = jnp.pad(weights, (0, pad))
    return nodes.reshape(mg, p), weights.reshape(mg, p), p


# --------------------------------------------------------------------- kernels

# Static-unroll node groups up to this count; fori_loop above.  0 = always
# fori_loop: unrolling chains every iteration's (TB, 128) temporaries live
# through the carry and blows the 16MB scoped-VMEM budget at TB=2048 (the
# fori body keeps exactly one iteration's buffers live).
_UNROLL_MAX = 0


def _fwd_kernel(x_ref, a_ref, c_ref, w1_ref, b1_ref, v_ref, o_ref, *, mg: int):
    x = x_ref[:]                                        # (TB, 1)
    w1 = w1_ref[:]
    b1 = b1_ref[:]

    def one_group(g, acc):
        h1 = jnp.tanh(x * a_ref[g][None, :] + c_ref[g][None, :])   # (TB, 128)
        h2 = jnp.tanh(jnp.dot(h1, w1, preferred_element_type=jnp.float32)
                      + b1)
        return acc + jnp.sum(h2 * v_ref[g][None, :], axis=-1, keepdims=True)

    acc = jnp.zeros_like(x)
    if mg <= _UNROLL_MAX:
        for g in range(mg):                             # static unroll, Mg small
            acc = one_group(g, acc)
    else:                                               # MC-sized node sets
        acc = jax.lax.fori_loop(0, mg, one_group, acc)
    o_ref[:] = acc


def _bwd_kernel(x_ref, a_ref, c_ref, w1_ref, b1_ref, v_ref, g_ref,
                dx_ref, da_ref, dc_ref, dw1_ref, db1_ref, dv_ref, *, mg: int):
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _():
        da_ref[:] = jnp.zeros_like(da_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    x = x_ref[:]                                        # (TB, 1)
    g_out = g_ref[:]                                    # (TB, 1)
    w1 = w1_ref[:]
    b1 = b1_ref[:]

    def one_group(g, carry):
        dx, dw1_acc, db1_acc = carry
        a_g = a_ref[g][None, :]
        h1 = jnp.tanh(x * a_g + c_ref[g][None, :])
        z2 = jnp.dot(h1, w1, preferred_element_type=jnp.float32) + b1
        h2 = jnp.tanh(z2)
        # out_g = sum(h2 * v_g); d/dv_g = sum_b g_out * h2
        dv_ref[g, :] += jnp.sum(g_out * h2, axis=0)
        dh2 = g_out * v_ref[g][None, :]                 # (TB, 128)
        dz2 = dh2 * (1.0 - h2 * h2)
        dw1_acc = dw1_acc + jnp.dot(h1.T, dz2,
                                    preferred_element_type=jnp.float32)
        db1_acc = db1_acc + jnp.sum(dz2, axis=0)
        dh1 = jnp.dot(dz2, w1.T, preferred_element_type=jnp.float32)
        dz1 = dh1 * (1.0 - h1 * h1)
        dx = dx + jnp.sum(dz1 * a_g, axis=-1, keepdims=True)
        da_ref[g, :] += jnp.sum(dz1 * x, axis=0)
        dc_ref[g, :] += jnp.sum(dz1, axis=0)
        return dx, dw1_acc, db1_acc

    carry = (jnp.zeros_like(x), jnp.zeros((LANES, LANES), jnp.float32),
             jnp.zeros((LANES,), jnp.float32))
    if mg <= _UNROLL_MAX:
        for g in range(mg):
            carry = one_group(g, carry)
    else:
        carry = jax.lax.fori_loop(0, mg, one_group, carry)
    dx, dw1_acc, db1_acc = carry
    dw1_ref[:, :] += dw1_acc
    db1_ref[0, :] += db1_acc
    dx_ref[:] = dx


# ------------------------------------------------------------------ entrypoint

@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_sweep(x, a, c, w1b, b1b, v):
    """comp_core(x) = Σ_g tanh(tanh(x⊗a_g + c_g) @ W1b + b1b) · v_g.

    x: (B,) float32; a, c, v: (Mg, 128); w1b: (128, 128); b1b: (128,).
    Returns (B,).  Add the folded bias term ``wb2`` outside.
    """
    return _fused_sweep_fwd_impl(x, a, c, w1b, b1b, v)


def _tile(batch: int) -> int:
    # 2048 rows x 128 lanes keeps fwd+bwd buffers inside the ~16MB VMEM
    # budget and measured fastest end-to-end (4096 exceeds scoped vmem).
    for tb in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if batch % tb == 0:
            return tb
    return batch


def _pad_batch(batch: int) -> int:
    """Round the path batch up to a tileable size (any batch is accepted;
    zero-padded rows are exact through both fwd and bwd — padded cotangents
    are zero so they contribute nothing to the packed-weight grads)."""
    quantum = 2048 if batch >= 2048 else 256 if batch >= 256 else 8
    return -(-batch // quantum) * quantum


def _fused_sweep_fwd_impl(x, a, c, w1b, b1b, v):
    batch = x.shape[0]
    padded = _pad_batch(batch)
    if padded != batch:
        x = jnp.pad(x, (0, padded - batch))
    mg = a.shape[0]
    tb = _tile(padded)
    interpret = not _on_tpu()
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, mg=mg),
        grid=(padded // tb,),
        in_specs=[
            _vmem_spec((tb, 1), lambda i: (i, 0)),
            _vmem_spec((mg, LANES), lambda i: (0, 0)),
            _vmem_spec((mg, LANES), lambda i: (0, 0)),
            _vmem_spec((LANES, LANES), lambda i: (0, 0)),
            _vmem_spec((1, LANES), lambda i: (0, 0)),
            _vmem_spec((mg, LANES), lambda i: (0, 0)),
        ],
        out_specs=_vmem_spec((tb, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((padded, 1), jnp.float32),
        interpret=interpret,
    )(x[:, None], a, c, w1b, b1b[None, :], v)
    return out[:batch, 0]


def _fused_sweep_fwd(x, a, c, w1b, b1b, v):
    return _fused_sweep_fwd_impl(x, a, c, w1b, b1b, v), (x, a, c, w1b, b1b, v)


def _fused_sweep_bwd(res, g_out):
    x, a, c, w1b, b1b, v = res
    batch = x.shape[0]
    padded = _pad_batch(batch)
    if padded != batch:
        x = jnp.pad(x, (0, padded - batch))
        g_out = jnp.pad(g_out, (0, padded - batch))
    mg = a.shape[0]
    tb = _tile(padded)
    interpret = not _on_tpu()
    shapes = (
        jax.ShapeDtypeStruct((padded, 1), jnp.float32),  # dx
        jax.ShapeDtypeStruct((mg, LANES), jnp.float32),  # da
        jax.ShapeDtypeStruct((mg, LANES), jnp.float32),  # dc
        jax.ShapeDtypeStruct((LANES, LANES), jnp.float32),
        jax.ShapeDtypeStruct((1, LANES), jnp.float32),
        jax.ShapeDtypeStruct((mg, LANES), jnp.float32),  # dv
    )
    full = lambda i: (0, 0)
    dx, da, dc, dw1, db1, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, mg=mg),
        grid=(padded // tb,),
        in_specs=[
            _vmem_spec((tb, 1), lambda i: (i, 0)),
            _vmem_spec((mg, LANES), full),
            _vmem_spec((mg, LANES), full),
            _vmem_spec((LANES, LANES), full),
            _vmem_spec((1, LANES), full),
            _vmem_spec((mg, LANES), full),
            _vmem_spec((tb, 1), lambda i: (i, 0)),
        ],
        out_specs=(
            _vmem_spec((tb, 1), lambda i: (i, 0)),
            _vmem_spec((mg, LANES), full),
            _vmem_spec((mg, LANES), full),
            _vmem_spec((LANES, LANES), full),
            _vmem_spec((1, LANES), full),
            _vmem_spec((mg, LANES), full),
        ),
        out_shape=shapes,
        interpret=interpret,
    )(x[:, None], a, c, w1b, b1b[None, :], v, g_out[:, None])
    return dx[:batch, 0], da, dc, dw1, db1[0], dv


fused_sweep.defvjp(_fused_sweep_fwd, _fused_sweep_bwd)
