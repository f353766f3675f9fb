"""Unit tests for ops/scan.py (chunked_scan) — the shared loop-structure
optimization behind the shipped scan_chunk defaults (bench.py, CLI --fast).
Integration equality against the flat scan is covered per solver family in
test_fast_paths.py; these pin the helper's own contract."""
import jax
import jax.numpy as jnp
import pytest

from deepfbsdejsolvers_tpu.ops.scan import chunked_scan


def _body(c, x):
    return (c * 0.9 + x["a"] + 0.1 * jnp.sum(x["b"]),
            {"y": c + x["a"], "z": c - x["b"]})


def _run(chunk, length=12, remat=False):
    xs = {"a": jnp.arange(length, dtype=jnp.float32),
          "b": jnp.ones((length, 3), jnp.float32)}
    return chunked_scan(_body, jnp.float32(1.0), xs, length, chunk,
                        remat=remat)


@pytest.mark.parametrize("chunk", [0, 1, 2, 3, 4, 5, 6, 12, 99])
def test_matches_flat_for_every_chunk(chunk):
    """Any chunk (incl. non-divisors 5 -> 4, >=length, and the degenerate
    0/1) produces the flat scan's carry and stacked ys — same rows in the
    same order (to the 1-ulp FMA-contraction freedom XLA has when it fuses
    the unrolled body differently)."""
    ref_c, ref_ys = _run(0)
    c, ys = _run(chunk)
    assert float(c) == pytest.approx(float(ref_c), rel=1e-6)
    for k in ref_ys:
        assert ys[k].shape == ref_ys[k].shape
        assert jnp.allclose(ys[k], ref_ys[k], rtol=1e-6, atol=0)


def test_gradients_match_under_remat():
    """Chunk-boundary remat preserves gradients exactly (same math, only
    the checkpoint granularity changes)."""
    def loss(theta, chunk):
        xs = {"a": theta * jnp.arange(12, dtype=jnp.float32),
              "b": jnp.ones((12, 3), jnp.float32)}
        c, ys = chunked_scan(_body, jnp.float32(1.0), xs, 12, chunk,
                             remat=True)
        return c + jnp.sum(ys["y"]) + jnp.sum(ys["z"])

    g_flat = jax.grad(loss)(jnp.float32(0.7), 0)
    g_chunk = jax.grad(loss)(jnp.float32(0.7), 4)
    assert float(g_flat) == pytest.approx(float(g_chunk), rel=1e-6)


def test_length_one():
    c, ys = _run(2, length=1)
    ref_c, ref_ys = _run(0, length=1)
    assert float(c) == float(ref_c)
    assert jnp.array_equal(ys["y"], ref_ys["y"])


def test_save_policy_threads_through():
    """A named-save checkpoint policy is accepted on both the flat and the
    chunked path (the pricing solver's save-only-heads policy)."""
    from jax.ad_checkpoint import checkpoint_name

    def body(c, x):
        h = checkpoint_name(jnp.tanh(c + x), "gam")
        return c + h, h

    policy = jax.checkpoint_policies.save_only_these_names("gam")
    xs = jnp.linspace(0.0, 1.0, 10)

    def loss(theta, chunk):
        c, ys = chunked_scan(body, theta, xs, 10, chunk, remat=True,
                             policy=policy)
        return c + jnp.sum(ys)

    g0 = jax.grad(loss)(jnp.float32(0.3), 0)
    g2 = jax.grad(loss)(jnp.float32(0.3), 2)
    assert float(g0) == pytest.approx(float(g2), rel=1e-7)


@pytest.mark.parametrize("chunk", [0, 2, 3, 4])
def test_xs_none_length_only_idiom(chunk):
    """chunked_scan is a drop-in for lax.scan(body, c, None, length=N): with
    no xs pytree the chunk lengths must be threaded explicitly into both
    scans (tree.map over None carries no length)."""
    def body(c, _):
        return c * 0.5 + 1.0, c

    ref_c, ref_ys = jax.lax.scan(body, jnp.float32(3.0), None, length=12)
    c, ys = chunked_scan(body, jnp.float32(3.0), None, 12, chunk, remat=True)
    assert float(c) == pytest.approx(float(ref_c), rel=1e-6)
    assert ys.shape == ref_ys.shape
    assert jnp.allclose(ys, ref_ys, rtol=1e-6, atol=0)
