"""Factorization round-trip and embedding tests (reference formulas:
hma/model/factorization_utils.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from hma_tpu.models.factorization import (
    FactorizedEmbedding,
    factorize_labels,
    factorize_token_ids,
    unfactorize_token_ids,
)


def test_factorize_roundtrip():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 2**18, size=(4, 12, 16, 16)), jnp.int32)
    f = factorize_token_ids(ids, 2, 512)
    assert f.shape == ids.shape + (2,)
    assert int(f.max()) < 512 and int(f.min()) >= 0
    back = unfactorize_token_ids(f, 2, 512)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(ids))


def test_factorize_digit_order():
    # factor 0 is the least-significant base-512 digit
    ids = jnp.asarray([[5 + 7 * 512]], jnp.int32)
    f = factorize_token_ids(ids, 2, 512)
    assert int(f[0, 0, 0]) == 5
    assert int(f[0, 0, 1]) == 7


def test_factorize_labels_layout():
    ids = jnp.asarray(np.arange(2 * 3 * 2 * 2).reshape(2, 3, 2, 2), jnp.int32)
    fl = factorize_labels(ids, 2, 512)
    assert fl.shape == (2, 2, 3, 2, 2)
    np.testing.assert_array_equal(np.asarray(fl[:, 0]), np.asarray(ids) % 512)


def test_factorized_embedding_masked_and_sum():
    mask_id = 2**18
    emb = FactorizedEmbedding(factored_vocab_size=512, num_factored_vocabs=2,
                              d_model=16, mask_token_id=mask_id, dtype=jnp.float32)
    ids = jnp.asarray([[3, mask_id, 512 + 3]], jnp.int32)
    params = emb.init(jax.random.PRNGKey(0), ids)
    out = emb.apply(params, ids)
    assert out.shape == (1, 3, 16)

    t0 = params["params"]["factored_embeds_0"]["embedding"]
    t1 = params["params"]["factored_embeds_1"]["embedding"]
    m = params["params"]["mask_token_embed"]
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(t0[3] + t1[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 1]), np.asarray(m[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 2]), np.asarray(t0[3] + t1[1]), rtol=1e-6)
