"""Factored-vocabulary utilities and embedding.

The 2**18-token MagVit2 vocabulary is factored into `num_factored_vocabs`
base-`factored_vocab_size` digits (2 x 512 by default), keeping the
embedding table and softmax small (reference:
hma/model/factorization_utils.py). Implemented as pure jnp functions and
a Flax module; the masked-token path is a `where`-select rather than
boolean indexing so everything stays static-shape for XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def factorize_token_ids(token_ids: jax.Array, num_factored_vocabs: int = 2,
                        factored_vocab_size: int = 512) -> jax.Array:
    """Split token ids in [0, vocab**n) into n base-`vocab` digits.

    Returns shape token_ids.shape + (num_factored_vocabs,), factor 0 being
    the least-significant digit (reference: factorization_utils.py:57).
    """
    powers = factored_vocab_size ** jnp.arange(num_factored_vocabs, dtype=token_ids.dtype)
    return (token_ids[..., None] // powers) % factored_vocab_size


def unfactorize_token_ids(factored: jax.Array, num_factored_vocabs: int = 2,
                          factored_vocab_size: int = 512) -> jax.Array:
    """Inverse of `factorize_token_ids` over the last axis."""
    powers = factored_vocab_size ** jnp.arange(num_factored_vocabs, dtype=factored.dtype)
    return jnp.sum(factored * powers, axis=-1)


def factorize_labels(labels_THW: jax.Array, num_factored_vocabs: int = 2,
                     factored_vocab_size: int = 512) -> jax.Array:
    """(B, T, H, W) ids -> (B, num_factored_vocabs, T, H, W) factored ids."""
    f = factorize_token_ids(labels_THW, num_factored_vocabs, factored_vocab_size)
    return jnp.moveaxis(f, -1, 1)


class FactorizedEmbedding(nn.Module):
    """Sum of per-factor embeddings, with a learned mask-token embedding.

    Equivalent to a plain embedding when num_factored_vocabs == 1
    (reference: factorization_utils.py:6). Masked positions (id ==
    mask_token_id) take `mask_token_embed` via a select, so the gather is
    static-shape.
    """

    factored_vocab_size: int
    num_factored_vocabs: int
    d_model: int
    mask_token_id: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        """input_ids: (..., ) int32 -> (..., d_model)."""
        is_mask = input_ids == self.mask_token_id
        # Clamp so the factorization of the mask id can't index out of range
        # (it can't: mask_token_id = vocab_size factorizes in-range; clamp is
        # belt-and-braces for corrupt inputs).
        safe_ids = jnp.where(is_mask, 0, input_ids)
        factored = factorize_token_ids(safe_ids, self.num_factored_vocabs, self.factored_vocab_size)

        embeds = jnp.zeros((*input_ids.shape, self.d_model), dtype=self.dtype)
        for i in range(self.num_factored_vocabs):
            # N(0,1), matching torch nn.Embedding's default init — the
            # reference never rescales it (init_weights is dead code).
            table = nn.Embed(self.factored_vocab_size, self.d_model,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             embedding_init=nn.initializers.normal(stddev=1.0),
                             name=f"factored_embeds_{i}")
            embeds = embeds + table(factored[..., i])

        mask_embed = self.param("mask_token_embed", nn.initializers.zeros, (1, self.d_model), jnp.float32)
        return jnp.where(is_mask[..., None], mask_embed.astype(self.dtype), embeds)
