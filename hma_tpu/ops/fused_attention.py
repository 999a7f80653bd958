"""Fused attention (forward + backward) as whole-block Pallas TPU kernels.

Motivation (measured on v5e, flagship train step, experiments/trace_step.py):
the ST transformer's spatial attention materializes (B*T, H, S, S) fp32
logits in HBM three times per layer per step (forward, remat recompute,
backward), accounting for the majority of the ~320 GB/step HBM traffic —
the train step is bandwidth-bound, not compute-bound. Both XLA and the
stock `jax.experimental.pallas.ops.tpu.flash_attention` kernel (benchmarked
2.6x slower forward at S=320, D=32, and failing to lower its backward at
D=32) leave that traffic in place.

This kernel holds the full (S, S) score matrix in VMEM per (batch element)
grid program — S<=512 and head_dim 32-64 make everything fit — and loops
heads inside the program (heads live on a leading, untiled axis so the
loop indexes whole (S, D) tile planes), so logits/probs NEVER round-trip
HBM:

  forward:  out, lse    reads q,k,v          writes out,lse    (~0.5 MB/pgm)
  backward: dq,dk,dv    reads q,k,v,out,dout,lse               (~1 MB/pgm)

The backward is the flash-attention backward specialized to the
single-block case: p = exp(logits - lse), delta = rowsum(dout*out),
ds = p * (dp - delta), with all (S,S) intermediates in VMEM.

Public layout is (B, S, H, D) matching `hma_tpu.models.attention._attend`
(q pre-scaled); the wrapper transposes to the kernel's (B, H, S, D).
Softmax statistics are fp32; matmul inputs bf16 with fp32 accumulation —
the same numerics contract as the XLA path.

Reference being replaced: xformers memory_efficient_attention
(hma/model/attention.py:136-155) — the reference's CUDA flash-attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _causal_mask(S: int):
    row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    return col > row  # True where masked


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, causal: bool,
                num_heads: int):
    for h in range(num_heads):
        q = q_ref[0, h]  # (S, D) bf16
        k = k_ref[0, h]
        v = v_ref[0, h]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (S, S)
        if causal:
            logits = jnp.where(_causal_mask(logits.shape[0]), NEG_INF, logits)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        s = jnp.sum(p, axis=-1, keepdims=True)
        lse = m + jnp.log(s)  # (S, 1)
        # per-head-grid blocks carry lse as a trailing length-1 minor
        # (TPU block tiling forbids a (1, S) minor pair); head-looped
        # blocks store it as an (S,) row of the (1, H, S) block.
        lse_ref[0, h] = lse if len(lse_ref.shape) == 4 else lse[:, 0]
        probs = (p / s).astype(q.dtype)
        o_ref[0, h] = jax.lax.dot_general(
            probs, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, causal: bool, num_heads: int):
    for h in range(num_heads):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        o = o_ref[0, h].astype(jnp.float32)
        do = do_ref[0, h]
        lse = lse_ref[0, h]  # (S,) head-looped / (S, 1) per-head grid
        if len(lse.shape) == 1:
            lse = lse[:, None]

        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        p = jnp.exp(logits - lse)
        if causal:
            p = jnp.where(_causal_mask(p.shape[0]), 0.0, p)
        p_lo = p.astype(q.dtype)

        # dv = p^T @ do   — contract over the query axis
        dv_ref[0, h] = jax.lax.dot_general(
            p_lo, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)

        # dp = do @ v^T ; ds = p * (dp - rowsum(do * o))
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        delta = jnp.sum(do.astype(jnp.float32) * o, axis=-1, keepdims=True)
        ds = (p * (dp - delta)).astype(q.dtype)

        dq_ref[0, h] = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[0, h] = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)


# Below this batch size a (B,)-grid underfeeds the sequential Pallas
# pipeline (only B programs of work); put heads on the grid too so B*H
# programs keep the DMA/compute pipeline busy. Single-device callers
# never see this case (`supported` gates on B >= 32); it exists for the
# custom_partitioning per-shard lowering, where local B = B/ndev can be
# small while the global shape passed the gate.
_HEADS_ON_GRID_BELOW_B = 32


def _specs(B, H, S, D):
    """(grid, qkv BlockSpec, lse BlockSpec, heads per program, lse 4-D?).

    Per-head grid: lse blocks get a trailing length-1 minor — the array
    is carried as (B, H, S, 1) — because a (1, S) block minor pair
    violates the TPU (8, 128) tiling rule, while (S, 1) satisfies it
    (S % 8 == 0, minor equal to the full array dim).
    """
    if B < _HEADS_ON_GRID_BELOW_B:
        blk = pl.BlockSpec((1, 1, S, D), lambda b, h: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
        lse_blk = pl.BlockSpec((1, 1, S, 1), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM)
        return (B, H), blk, lse_blk, 1, True
    blk = pl.BlockSpec((1, H, S, D), lambda b: (b, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    lse_blk = pl.BlockSpec((1, H, S), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    return (B,), blk, lse_blk, H, False


def _fwd(q, k, v, causal: bool, interpret: bool):
    """q, k, v: (B, H, S, D). Returns out (B, H, S, D), lse (B, H, S)."""
    B, H, S, D = q.shape
    grid, blk, lse_blk, heads, lse4 = _specs(B, H, S, D)
    lse_shape = (B, H, S, 1) if lse4 else (B, H, S)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, causal=causal, num_heads=heads),
        grid=grid,
        in_specs=[blk, blk, blk],
        out_specs=[blk, lse_blk],
        out_shape=[jax.ShapeDtypeStruct((B, H, S, D), q.dtype),
                   jax.ShapeDtypeStruct(lse_shape, jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * S * S * D,
            bytes_accessed=8 * B * S * H * D * q.dtype.itemsize,
            transcendentals=B * H * S * S),
    )(q, k, v)
    if lse4:
        lse = lse[..., 0]
    return out, lse


def _bwd(q, k, v, out, lse, dout, causal: bool, interpret: bool):
    B, H, S, D = q.shape
    grid, blk, lse_blk, heads, lse4 = _specs(B, H, S, D)
    if lse4:
        lse = lse[..., None]
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, causal=causal, num_heads=heads),
        grid=grid,
        in_specs=[blk, blk, blk, blk, lse_blk, blk],
        out_specs=[blk, blk, blk],
        out_shape=[jax.ShapeDtypeStruct((B, H, S, D), q.dtype)] * 3,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 5 * B * H * S * S * D,
            bytes_accessed=9 * B * S * H * D * q.dtype.itemsize,
            transcendentals=B * H * S * S),
    )(q, k, v, out, lse, dout)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# SPMD partitioning: pallas_call has no built-in partitioning rule, so under
# a jit with sharded operands XLA would all-gather them onto every device.
# custom_partitioning declares the kernels batch-/head-parallel: (b, h) dims
# follow the operands' sharding and each shard runs the kernel locally on
# its slice; S and D are replicated (whole-block kernel). Verified on an
# 8-device virtual CPU mesh in tests/test_fused_attention.py.
# ---------------------------------------------------------------------------

def _bh_spec(arg_shapes):
    """(b, h) partition entries of the first operand's sharding."""
    sh = arg_shapes[0].sharding
    spec = tuple(sh.spec) if sh is not None else ()
    spec = spec + (None,) * (2 - len(spec))
    return spec[0], spec[1]


def _make_sharded_fwd(causal: bool, interpret: bool):
    @custom_partitioning
    def op(q, k, v):
        return _fwd(q, k, v, causal, interpret)

    def infer(mesh, arg_shapes, result_shape):
        b, h = _bh_spec(arg_shapes)
        return (NamedSharding(mesh, P(b, h, None, None)),
                NamedSharding(mesh, P(b, h, None)))

    def part(mesh, arg_shapes, result_shape):
        b, h = _bh_spec(arg_shapes)
        qkv_sh = NamedSharding(mesh, P(b, h, None, None))
        lse_sh = NamedSharding(mesh, P(b, h, None))

        def lower(q, k, v):
            return _fwd(q, k, v, causal, interpret)

        return mesh, lower, (qkv_sh, lse_sh), (qkv_sh,) * 3

    op.def_partition(part, infer_sharding_from_operands=infer,
                     sharding_rule="b h n d, b h m d, b h m d -> b h n d, b h n",
                     need_replication_factors=("n", "d", "m"))
    return op


def _make_sharded_bwd(causal: bool, interpret: bool):
    @custom_partitioning
    def op(q, k, v, out, lse, dout):
        return _bwd(q, k, v, out, lse, dout, causal, interpret)

    def infer(mesh, arg_shapes, result_shape):
        b, h = _bh_spec(arg_shapes)
        return (NamedSharding(mesh, P(b, h, None, None)),) * 3

    def part(mesh, arg_shapes, result_shape):
        b, h = _bh_spec(arg_shapes)
        qkv_sh = NamedSharding(mesh, P(b, h, None, None))
        lse_sh = NamedSharding(mesh, P(b, h, None))

        def lower(q, k, v, out, lse, dout):
            return _bwd(q, k, v, out, lse, dout, causal, interpret)

        return (mesh, lower, (qkv_sh,) * 3,
                (qkv_sh, qkv_sh, qkv_sh, qkv_sh, lse_sh, qkv_sh))

    op.def_partition(
        part, infer_sharding_from_operands=infer,
        sharding_rule=("b h n d, b h m d, b h m d, b h n d, b h n, b h n d"
                       " -> b h n d, b h m d, b h m d"),
        need_replication_factors=("n", "d", "m"))
    return op


@functools.cache
def _sharded_fwd(causal: bool, interpret: bool):
    return _make_sharded_fwd(causal, interpret)


@functools.cache
def _sharded_bwd(causal: bool, interpret: bool):
    return _make_sharded_bwd(causal, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(q, k, v, causal: bool = False, interpret: bool = False):
    """Attention out = softmax(q @ k^T [causal-masked]) @ v.

    q, k, v: (B, S, H, D), q pre-scaled. Returns (B, S, H, D) in q.dtype.
    Fits whole (S, S) score blocks in VMEM: requires S <= ~1024 and
    S % 8 == 0 (fp32 sublane tiling); intended for the ST transformer's
    spatial (S=320) and temporal (T<=16) passes on TPU.
    """
    out, _ = _sharded_fwd(causal, interpret)(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3))
    return out.transpose(0, 2, 1, 3)


def _vjp_fwd(q, k, v, causal, interpret):
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out, lse = _sharded_fwd(causal, interpret)(qt, kt, vt)
    return out.transpose(0, 2, 1, 3), (qt, kt, vt, out, lse)


def _vjp_bwd(causal, interpret, res, dout):
    qt, kt, vt, out, lse = res
    dq, dk, dv = _sharded_bwd(causal, interpret)(
        qt, kt, vt, out, lse, dout.transpose(0, 2, 1, 3).astype(qt.dtype))
    return (dq.transpose(0, 2, 1, 3), dk.transpose(0, 2, 1, 3),
            dv.transpose(0, 2, 1, 3))


fused_attention.defvjp(_vjp_fwd, _vjp_bwd)


def supported(q_shape, head_dim: int) -> bool:
    """Whether the whole-block kernel applies to this attention shape.

    B >= 32: at rollout's per-frame spatial pass (B=8) the kernel loses
    to XLA end-to-end even with the (B, H) per-head grid (286 vs 390
    frames/sec measured on v5e; 265 vs 349 for the original head-looped
    (B,)-grid) — at decode shapes XLA fuses the attention with the
    surrounding projections and skips this wrapper's layout transposes.
    The per-head grid in `_specs` still serves the *per-shard* lowering:
    under dp/fsdp `custom_partitioning` re-enters `_fwd`/`_bwd` with
    local B = B/ndev < 32, where B*H programs keep the pipeline fed.
    """
    B, S, H, D = q_shape
    return (B >= 32 and S % 8 == 0 and S <= 1024
            and D in (32, 64, 128) and H <= 16)
