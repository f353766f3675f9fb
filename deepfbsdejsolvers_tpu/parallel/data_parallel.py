"""Multi-chip SPMD training over a JAX device mesh.

The reference has no distributed execution of any kind (single-device TF;
SURVEY.md §2 last rows mandate this as new capability).  The TPU-native
parallelism for this workload is:

* **data parallelism** — shard the simulated *paths* (batch axis) over the
  mesh's ``data`` axis; each chip simulates its shard with its own folded RNG
  key and the gradients are ``pmean``-ed over ICI.
* **compensator parallelism** — the inner jump-expectation sweep
  (5000 MC samples / quadrature nodes shared across the batch) is
  embarrassingly parallel over nodes; it shards over the mesh's ``comp`` axis
  with a ``psum`` of the weighted partial sums.  This is the structural
  analogue of expert/sequence parallelism for this model family: the only
  inner axis big enough to shard (SURVEY.md §5 long-context note).

Both are expressed with ``shard_map`` over a 1-D or 2-D ``Mesh``; XLA inserts
the all-reduces over ICI.  Losses are per-shard means, so ``pmean`` of grads
equals the global-batch gradient exactly (all schemes reduce with
batch-means).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def make_mesh(axis_sizes: Sequence[int] = None, axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Build a Mesh over all (or given) devices; default 1-D data mesh."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = (devices.size,)
    if int(np.prod(axis_sizes)) != devices.size:
        raise ValueError(f"mesh {tuple(axis_sizes)} != #devices {devices.size}")
    return Mesh(devices.reshape(tuple(axis_sizes)), tuple(axis_names))


def make_dp_loss(loss_fn: Callable, mesh: Mesh, data_axis: str = "data") -> Callable:
    """Wrap a per-shard ``loss(params, key)`` into a mesh-wide SPMD loss.

    Each chip computes the loss of its own path shard with a distinct key
    (``fold_in(key, axis_index)``); the result is the pmean over chips —
    identical in expectation to one big batch of  n_chips * per-chip size.
    """

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(),
    )
    def dp_loss(params, key):
        idx = jax.lax.axis_index(data_axis)
        local = loss_fn(params, jax.random.fold_in(key, idx))
        return jax.lax.pmean(local, data_axis)

    return dp_loss


def make_dp_update(loss_fn: Callable, optimizer: optax.GradientTransformation,
                   mesh: Mesh, data_axis: str = "data") -> Callable:
    """One SPMD Adam step: per-chip grads -> pmean over ICI -> update.

    Params/opt state are replicated (P()); the gradient all-reduce is the only
    collective.  Returns jitted (params, opt_state, key) -> (params, opt_state,
    loss).
    """

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def update(params, opt_state, key):
        idx = jax.lax.axis_index(data_axis)
        loss, grads = jax.value_and_grad(loss_fn)(params, jax.random.fold_in(key, idx))
        grads = jax.lax.pmean(grads, data_axis)
        loss = jax.lax.pmean(loss, data_axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(update)
