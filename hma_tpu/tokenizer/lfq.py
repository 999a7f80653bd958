"""Lookup-Free Quantization (LFQ) as pure jnp functions.

The MagVit2 tokenizer sign-quantizes an 18-channel latent into one of
2**18 codes (reference: external/magvit2/modules/vqvae/
lookup_free_quantize.py). The reference carries two mutually-cancelling
bit-order quirks: encode uses `flip=True` (lookup_free_quantize.py:257-261)
and decode applies `.flip(1)` to the codebook entry
(hma/visualize.py:149-151, datasets/utils.py:139). Net effect — and the
convention implemented here directly — is little-endian:

    token bit k  ==  (latent channel k > 0)        (encode)
    latent channel k = (token >> k & 1) * 2 - 1    (decode)

Tokens therefore interoperate bit-exactly with datasets produced by the
reference pipeline. Training-time entropy/commit losses follow
lookup_free_quantize.py:82-118 (sample-entropy minimization + batch-
entropy maximization, temperature 0.01).

Note on kernels: a fused Pallas sign-quantize+bitpack was benchmarked on
v5e against this jnp version (1M x 18 latents): Pallas 6.1 ms vs XLA
2.0 ms — the D=18 lane dimension tiles badly in Pallas while XLA fuses
the compare/select/reduce into the encoder's conv epilogue, so the jnp
path is canonical and the kernel was removed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

CODEBOOK_DIM = 18  # log2(262144)


class LFQResult(NamedTuple):
    quantized: jax.Array      # straight-through ±1 latents, same shape as input
    indices: jax.Array        # int32 token ids
    entropy_loss: jax.Array   # scalar aux loss (0 when compute_losses=False)
    commit_loss: jax.Array    # scalar commitment loss
    per_sample_entropy: jax.Array
    codebook_entropy: jax.Array


def bits_to_indices(bits: jax.Array) -> jax.Array:
    """(..., D) bool, little-endian bit k in channel k -> (...) int32.

    int32-explicit: D=18 fits comfortably, and D<=31 is the supported
    range (tokens are stored as int32 on disk; jnp.int64 without x64
    enabled silently truncates, so we never request it).
    """
    D = bits.shape[-1]
    assert D <= 31, f"codebook_dim {D} exceeds int32 token range"
    powers = (1 << jnp.arange(D, dtype=jnp.int32)).astype(jnp.int32)
    return jnp.sum(bits.astype(jnp.int32) * powers, axis=-1).astype(jnp.int32)


def indices_to_bits(indices: jax.Array, codebook_dim: int = CODEBOOK_DIM) -> jax.Array:
    """(...) int -> (..., D) bool, channel k = bit k."""
    assert codebook_dim <= 31, f"codebook_dim {codebook_dim} exceeds int32 range"
    powers = (1 << jnp.arange(codebook_dim, dtype=jnp.int32)).astype(jnp.int32)
    return (indices.astype(jnp.int32)[..., None] & powers) != 0


def codes_to_latents(indices: jax.Array, codebook_dim: int = CODEBOOK_DIM,
                     dtype=jnp.bfloat16) -> jax.Array:
    """Token ids -> ±1 latents with channel-last layout (..., D)."""
    bits = indices_to_bits(indices, codebook_dim)
    return (bits.astype(dtype) * 2 - 1)


def _entropy_terms(z: jax.Array, temperature: float = 0.01, eps: float = 1e-5):
    """Sample-min / batch-max entropy over code affinities.

    Affinity logits to all 2**18 codes decompose per bit because codes are
    ±1 hypercube corners: softmax over the full codebook factorizes into
    independent per-channel two-way softmaxes, p_k(+1) = sigmoid(4 z_k/T).
    The reference materializes the full (N, 262144) logit matrix
    (lookup_free_quantize.py:285) — infeasible memory traffic on TPU. The
    factorized form is *exact* for the sample-entropy term (entropy of a
    product distribution = sum of marginal entropies) and uses the
    mean-marginal upper bound for the codebook-entropy term, which as a
    maximization target exerts the same pressure (uniform bit usage) at
    O(N*18) instead of O(N*2**18).
    """
    # per-channel two-way distribution over bit in {-1, +1}
    p_pos = jax.nn.sigmoid(4.0 * z.astype(jnp.float32) / temperature)
    p_pos = jnp.clip(p_pos, eps, 1 - eps)
    p = jnp.stack([1 - p_pos, p_pos], axis=-1)                    # (..., D, 2)

    # sample entropy: sum over channels of per-channel entropy
    samp = -jnp.sum(p * jnp.log(p + eps), axis=(-1, -2))          # (...)
    per_sample_entropy = jnp.mean(samp)

    # codebook (batch) entropy: entropy of the mean factorized distribution
    avg = jnp.mean(p.reshape(-1, p.shape[-2], 2), axis=0)         # (D, 2)
    codebook_entropy = -jnp.sum(avg * jnp.log(avg + eps))
    return per_sample_entropy, codebook_entropy


def lfq_quantize(z: jax.Array, *, compute_losses: bool = False,
                 sample_minimization_weight: float = 1.0,
                 batch_maximization_weight: float = 1.0) -> LFQResult:
    """Sign-quantize channel-last latents z (..., D).

    Returns straight-through quantized ±1 values and little-endian token
    ids; entropy/commit losses when compute_losses (training).
    """
    bits = z > 0
    quantized_hard = jnp.where(bits, 1.0, -1.0).astype(z.dtype)
    indices = bits_to_indices(bits)

    if compute_losses:
        per_sample, codebook = _entropy_terms(z)
        entropy_loss = (sample_minimization_weight * per_sample
                        - batch_maximization_weight * codebook)
        commit_loss = jnp.mean((z.astype(jnp.float32)
                                - jax.lax.stop_gradient(quantized_hard).astype(jnp.float32)) ** 2)
    else:
        zero = jnp.zeros((), jnp.float32)
        per_sample = codebook = entropy_loss = commit_loss = zero

    # straight-through estimator
    quantized = z + jax.lax.stop_gradient(quantized_hard - z)
    return LFQResult(quantized, indices, entropy_loss, commit_loss,
                     per_sample, codebook)
