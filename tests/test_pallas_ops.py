"""Pallas kernels: interpret-mode exactness vs jnp references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hma_tpu.ops.flash_attention import fused_attention


def _reference_attention(q, k, v, causal):
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32)
    if causal:
        n = logits.shape[-1]
        mask = np.tril(np.ones((n, n), bool))
        logits = jnp.where(jnp.asarray(mask), logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v.astype(jnp.float32))


@pytest.mark.parametrize("causal", [False, True])
def test_fused_attention_matches_reference(causal):
    rng = np.random.default_rng(0)
    B, S, H, D = 2, 64, 4, 32
    q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32) * 0.3
    k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    got = fused_attention(q, k, v, causal=causal, interpret=True)
    want = _reference_attention(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_attention_vjp_matches_reference():
    """Custom VJP (pallas fwd, XLA bwd) must match reference grads."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(2, 16, 2, 32)), jnp.float32) * 0.3
    k = jnp.asarray(rng.normal(size=(2, 16, 2, 32)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 16, 2, 32)), jnp.float32)
    g1 = jax.grad(lambda q: jnp.sum(fused_attention(q, k, v, interpret=True) ** 2))(q)
    g2 = jax.grad(lambda q: jnp.sum(_reference_attention(q, k, v, False) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-4, rtol=2e-4)
