"""Token-space eval metrics: factored CE loss, perplexity, accuracy.

Analog of the reference's eval_utils.compute_loss (hma/eval_utils.py:60-93)
operating on the (B, T-1, S, nv, fv) logits the rollout engine returns.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hma_tpu.models.factorization import factorize_token_ids


def teacher_forced_metrics(logits: jax.Array, targets: jax.Array,
                           factored_vocab_size: int = 512) -> dict:
    """logits: (B, T-1, S, nv, fv) fp32; targets: (B, T-1, S) int.

    Returns {'loss', 'perplexity', 'acc'} — CE summed over factored
    vocabs, mean over tokens (all tokens of frames 1.., mirroring
    evaluate.py's fully-masked per-frame protocol).
    """
    nv = logits.shape[-2]
    ft = factorize_token_ids(targets, nv, factored_vocab_size)  # (..., nv)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, ft[..., None], axis=-1)[..., 0]
    ce = -jnp.sum(ll, axis=-1)  # sum over factors
    loss = jnp.mean(ce)
    acc = jnp.mean(jnp.all(jnp.argmax(logits, axis=-1) == ft, axis=-1))
    return {"loss": loss, "perplexity": jnp.exp(loss), "acc": acc}


class AvgMetric:
    """Running mean (reference: hma/eval_utils.py:9-26)."""

    def __init__(self):
        self.total = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.total += float(value) * n
        self.count += n

    def mean(self) -> float:
        return self.total / max(self.count, 1)
