"""Pallas TPU kernels for the ST-transformer hot ops.

`fused_attention`: fused bidirectional/causal attention for the
per-frame spatial pass (S <= ~512 tokens, head_dim 32-64) and the
temporal full pass. One grid program per (batch*frame, head) computes
the full S x S attention in VMEM — logits never round-trip HBM, softmax
runs in fp32, and the (S, D) operands stay resident.

The shapes are small enough that XLA's fused attention is already
decent; the kernel removes the remaining logit materialization and gives
us an explicit tuning point. Interpret-mode tests validate exactness
against the jnp reference on CPU; `hma_tpu.models.attention` uses it when
`HMA_TPU_PALLAS_ATTN=1`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, causal: bool):
    """One (batch, head) slice; blocks arrive as (1, 1, S, D)."""
    q = q_ref[0, 0]  # (S, D)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (S, S)
    if causal:
        S = logits.shape[0]
        row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        logits = jnp.where(col > row, NEG_INF, logits)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    probs = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    o_ref[0, 0] = jnp.dot(probs, v, preferred_element_type=jnp.float32
                          ).astype(o_ref.dtype)


def _pallas_attention(q, k, v, causal: bool, interpret: bool):
    B, S, H, D = q.shape

    def reorder(x):  # (B, S, H, D) -> (B, H, S, D)
        return x.transpose(0, 2, 1, 3)

    spec = pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, causal=causal),
        grid=(B, H),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * S * S * D,
            bytes_accessed=4 * B * H * S * D * q.dtype.itemsize,
            transcendentals=B * H * S * S),
    )(reorder(q), reorder(k), reorder(v))
    return out.transpose(0, 2, 1, 3)


def _jnp_attention(q, k, v, causal: bool):
    """jnp reference (also the backward path for the custom VJP)."""
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32)
    if causal:
        S = logits.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        logits = jnp.where(col > row, NEG_INF, logits)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_attention(q, k, v, causal, interpret):
    return _pallas_attention(q, k, v, causal, interpret)


def _fused_fwd(q, k, v, causal, interpret):
    return _pallas_attention(q, k, v, causal, interpret), (q, k, v)


def _fused_bwd(causal, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _jnp_attention(a, b, c, causal), q, k, v)
    return vjp(g)


_fused_attention.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.jit, static_argnames=("causal", "interpret"))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    causal: bool = False, interpret: bool = False) -> jax.Array:
    """q, k, v: (B, S, H, D) with q pre-scaled. Returns (B, S, H, D).

    Forward runs the Pallas kernel; the backward pass differentiates the
    jnp reference (XLA), so the op is usable inside training steps.
    """
    return _fused_attention(q, k, v, causal, interpret)
