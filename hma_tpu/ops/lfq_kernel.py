"""Pallas fused LFQ sign-quantize + little-endian bit-pack.

Fuses the tokenizer's quantization hot op (sign over 18 latent channels
-> packed int32 token ids; reference math:
external/magvit2/modules/vqvae/lookup_free_quantize.py:253-261 with the
flip convention folded in, see hma_tpu/tokenizer/lfq.py). The fused
kernel reads the latent once and emits tokens + ±1 codes in one pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lfq_kernel(z_ref, idx_ref, quant_ref):
    z = z_ref[:]                      # (N_blk, D)
    bits = (z > 0)
    quant_ref[:] = jnp.where(bits, 1.0, -1.0).astype(quant_ref.dtype)
    D = z.shape[-1]
    powers = (2 ** jax.lax.broadcasted_iota(jnp.int32, (1, D), 1))
    idx = jnp.sum(bits.astype(jnp.int32) * powers, axis=-1, keepdims=True)
    idx_ref[:] = idx


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def lfq_quantize_fused(z: jax.Array, *, block: int = 1024,
                       interpret: bool = False):
    """z: (N, D<=30) channel-last latents -> (ids (N,) int32, quant (N, D) ±1).

    N must be a multiple of `block` (callers pad; the encode pipeline's
    batches already are).
    """
    N, D = z.shape
    assert N % block == 0, (N, block)
    grid = (N // block,)
    idx, quant = pl.pallas_call(
        _lfq_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((block, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((block, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((block, D), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((N, 1), jnp.int32),
                   jax.ShapeDtypeStruct((N, D), z.dtype)),
        interpret=interpret,
    )(z)
    return idx[:, 0], quant
