"""Temporal-attention Pallas kernel: interpret-mode exactness vs the XLA
reference (`_attend` with causal=True)."""

import jax
import jax.numpy as jnp
import numpy as np

from hma_tpu.models.attention import _attend
from hma_tpu.ops.temporal_attention import fused_temporal_attention, supported


def _make(N=256, T=6, H=2, D=32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(N, T, H, D)), jnp.float32) * 0.2
    k = jnp.asarray(rng.normal(size=(N, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(N, T, H, D)), jnp.float32)
    return q, k, v


def test_forward_matches_xla():
    q, k, v = _make()
    got = fused_temporal_attention(q, k, v, True)
    want = _attend(q, k, v, causal=True, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_grads_match_xla():
    q, k, v = _make(seed=1)

    g1 = jax.grad(lambda q, k, v: jnp.sum(
        fused_temporal_attention(q, k, v, True) ** 2), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: jnp.sum(
        _attend(q, k, v, causal=True, dtype=jnp.float32) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4, err_msg=f"d{name}")


def test_grads_under_remat():
    q, k, v = _make(N=128, T=4, H=2, seed=2)

    @jax.checkpoint
    def block(q):
        return jnp.sum(fused_temporal_attention(q, k, v, True) ** 2)

    g1 = jax.grad(block)(q)
    g2 = jax.grad(lambda q: jnp.sum(
        _attend(q, k, v, causal=True, dtype=jnp.float32) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=5e-5, rtol=5e-4)


def test_supported_predicate():
    assert supported((2560, 12, 8, 32), 32)
    assert not supported((2560, 20, 8, 32), 32)   # T too large
    assert not supported((1000, 12, 8, 32), 32)   # N not lane-tileable
    assert not supported((512, 12, 8, 32), 32)    # N too small to bother
