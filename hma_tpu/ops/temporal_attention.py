"""Causal temporal attention (tiny T, huge batch) as Pallas TPU kernels.

The ST transformer's temporal pass attends over T<=16 frames at each of
B*S = thousands of spatial sites. In XLA every (T, T) logits/probs tensor
pads its minor dims to the (8, 128) tile — a 10-40x memory blowup that
makes this tiny-FLOP op cost ~2 ms forward / ~6 ms backward per layer at
the flagship shape (2560, 12, 8, 32) (experiments/attn_probe.py).

These kernels put the SITE axis on lanes instead: operands are staged as
(1, T, D, Nb) per-head blocks over a (heads, site-tiles) grid, so every
elementwise/reduce op runs on dense (D, Nb) tiles and the (T, T, Nb)
score tensor is exactly the natural size. The T x T score pairs are
static loops inside the program; causal pairs s > t are skipped at trace
time. Forward and backward never touch HBM for scores.

Layout contract: public (N, T, H, D) with q pre-scaled, matching
`hma_tpu.models.attention._attend` after its (B, S, H, D) convention;
the wrapper transposes to the kernel layout (cheap: N-major copies).

Reference being replaced: the temporal half of xformers
memory_efficient_attention (hma/model/attention.py:136-155).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import NamedSharding, PartitionSpec as P


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, T: int):
    """Blocks: q/k/v/o (1, T, D, Nb); lse (1, T, Nb); grid (H, N/Nb)."""
    f32 = jnp.float32
    # logits[t, s] for s <= t, each a (Nb,) lane vector reduced over D
    probs = []
    lse_rows = []
    for t in range(T):
        rows = []
        for s in range(t + 1):
            qk = jnp.sum(q_ref[0, t].astype(f32) * k_ref[0, s].astype(f32),
                         axis=0)  # (Nb,)
            rows.append(qk)
        logits = jnp.stack(rows, axis=0)  # (t+1, Nb)
        m = jnp.max(logits, axis=0, keepdims=True)
        p = jnp.exp(logits - m)
        ssum = jnp.sum(p, axis=0, keepdims=True)
        lse_rows.append((m + jnp.log(ssum))[0])
        probs.append(p / ssum)
    lse_ref[0] = jnp.stack(lse_rows, axis=0)  # (T, Nb)
    for t in range(T):
        p = probs[t]  # (t+1, Nb)
        acc = jnp.zeros_like(v_ref[0, 0], dtype=f32)  # (D, Nb)
        for s in range(t + 1):
            acc = acc + p[s][None, :] * v_ref[0, s].astype(f32)
        o_ref[0, t] = acc.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, T: int):
    f32 = jnp.float32
    # delta[t] = sum_d dout[t, d] * out[t, d]  — (Nb,)
    deltas = [jnp.sum(do_ref[0, t].astype(f32) * o_ref[0, t].astype(f32),
                      axis=0) for t in range(T)]
    dq_acc = [jnp.zeros_like(q_ref[0, 0], dtype=f32) for _ in range(T)]
    dk_acc = [jnp.zeros_like(q_ref[0, 0], dtype=f32) for _ in range(T)]
    dv_acc = [jnp.zeros_like(q_ref[0, 0], dtype=f32) for _ in range(T)]
    for t in range(T):
        lse_t = lse_ref[0, t]  # (Nb,)
        do_t = do_ref[0, t].astype(f32)  # (D, Nb)
        for s in range(t + 1):
            qk = jnp.sum(q_ref[0, t].astype(f32) * k_ref[0, s].astype(f32),
                         axis=0)
            p = jnp.exp(qk - lse_t)  # (Nb,)
            dp = jnp.sum(do_t * v_ref[0, s].astype(f32), axis=0)
            ds = p * (dp - deltas[t])  # (Nb,)
            dq_acc[t] = dq_acc[t] + ds[None, :] * k_ref[0, s].astype(f32)
            dk_acc[s] = dk_acc[s] + ds[None, :] * q_ref[0, t].astype(f32)
            dv_acc[s] = dv_acc[s] + p[None, :] * do_t
    for t in range(T):
        dq_ref[0, t] = dq_acc[t].astype(dq_ref.dtype)
        dk_ref[0, t] = dk_acc[t].astype(dk_ref.dtype)
        dv_ref[0, t] = dv_acc[t].astype(dv_ref.dtype)


def _block_n(N: int, T: int = 12, D: int = 32) -> int:
    # Per-head site tiles sized to the ~16 MB scoped-VMEM stack: the
    # worst case (backward) holds ~12 (T, D, nb) buffers between blocks
    # and fp32 accumulators. Budget 8 MB.
    nb = 512
    while nb >= 128:
        if N % nb == 0 and 12 * T * D * nb * 4 <= 8 * 2**20:
            return nb
        nb //= 2
    return 0


def _fwd(qt, kt, vt, interpret: bool):
    """qt, kt, vt: (H, T, D, N). Returns out (H, T, D, N), lse (H, T, N)."""
    H, T, D, N = qt.shape
    nb = _block_n(N, T, D)
    blk = pl.BlockSpec((1, T, D, nb), lambda h, i: (h, 0, 0, i),
                       memory_space=pltpu.VMEM)
    lse_blk = pl.BlockSpec((1, T, nb), lambda h, i: (h, 0, i),
                           memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, T=T),
        grid=(H, N // nb),
        in_specs=[blk, blk, blk],
        out_specs=[blk, lse_blk],
        out_shape=[jax.ShapeDtypeStruct((H, T, D, N), qt.dtype),
                   jax.ShapeDtypeStruct((H, T, N), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * N * H * T * T * D,
            bytes_accessed=8 * N * T * H * D * qt.dtype.itemsize,
            transcendentals=N * H * T * T),
    )(qt, kt, vt)
    return out, lse


def _bwd(qt, kt, vt, out, lse, dout, interpret: bool):
    H, T, D, N = qt.shape
    nb = _block_n(N, T, D)
    blk = pl.BlockSpec((1, T, D, nb), lambda h, i: (h, 0, 0, i),
                       memory_space=pltpu.VMEM)
    lse_blk = pl.BlockSpec((1, T, nb), lambda h, i: (h, 0, i),
                           memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, T=T),
        grid=(H, N // nb),
        in_specs=[blk, blk, blk, blk, lse_blk, blk],
        out_specs=[blk, blk, blk],
        out_shape=[jax.ShapeDtypeStruct((H, T, D, N), qt.dtype)] * 3,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 5 * N * H * T * T * D,
            bytes_accessed=9 * N * T * H * D * qt.dtype.itemsize,
            transcendentals=N * H * T * T),
    )(qt, kt, vt, out, lse, dout)
    return dq, dk, dv


def _to_kernel(x):
    # (N, T, H, D) -> (H, T, D, N)
    return x.transpose(2, 1, 3, 0)


def _from_kernel(x):
    # (H, T, D, N) -> (N, T, H, D)
    return x.transpose(3, 1, 0, 2)


def _make_sharded_fwd(interpret: bool):
    @custom_partitioning
    def op(qt, kt, vt):
        return _fwd(qt, kt, vt, interpret)

    def _n_spec(arg_shapes):
        sh = arg_shapes[0].sharding
        spec = tuple(sh.spec) if sh is not None else ()
        spec = spec + (None,) * (4 - len(spec))
        return spec[3]

    def infer(mesh, arg_shapes, result_shape):
        n = _n_spec(arg_shapes)
        return (NamedSharding(mesh, P(None, None, None, n)),
                NamedSharding(mesh, P(None, None, n)))

    def part(mesh, arg_shapes, result_shape):
        n = _n_spec(arg_shapes)
        blk = NamedSharding(mesh, P(None, None, None, n))
        lse = NamedSharding(mesh, P(None, None, n))

        def lower(qt, kt, vt):
            return _fwd(qt, kt, vt, interpret)

        return mesh, lower, (blk, lse), (blk,) * 3

    op.def_partition(part, infer_sharding_from_operands=infer,
                     sharding_rule="h t d n, h t d n, h t d n -> h t d n, h t n",
                     need_replication_factors=("h", "t", "d"))
    return op


def _make_sharded_bwd(interpret: bool):
    @custom_partitioning
    def op(qt, kt, vt, out, lse, dout):
        return _bwd(qt, kt, vt, out, lse, dout, interpret)

    def _n_spec(arg_shapes):
        sh = arg_shapes[0].sharding
        spec = tuple(sh.spec) if sh is not None else ()
        spec = spec + (None,) * (4 - len(spec))
        return spec[3]

    def infer(mesh, arg_shapes, result_shape):
        n = _n_spec(arg_shapes)
        return (NamedSharding(mesh, P(None, None, None, n)),) * 3

    def part(mesh, arg_shapes, result_shape):
        n = _n_spec(arg_shapes)
        blk = NamedSharding(mesh, P(None, None, None, n))
        lse = NamedSharding(mesh, P(None, None, n))

        def lower(qt, kt, vt, out, lse, dout):
            return _bwd(qt, kt, vt, out, lse, dout, interpret)

        return (mesh, lower, (blk,) * 3, (blk, blk, blk, blk, lse, blk))

    op.def_partition(
        part, infer_sharding_from_operands=infer,
        sharding_rule=("h t d n, h t d n, h t d n, h t d n, h t n, h t d n"
                       " -> h t d n, h t d n, h t d n"),
        need_replication_factors=("h", "t", "d"))
    return op


@functools.cache
def _sharded_fwd(interpret: bool):
    return _make_sharded_fwd(interpret)


@functools.cache
def _sharded_bwd(interpret: bool):
    return _make_sharded_bwd(interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_temporal_attention(q, k, v, interpret: bool = False):
    """Causal attention over the T axis at every site.

    q, k, v: (N, T, H, D), q pre-scaled. Returns (N, T, H, D) in q.dtype.
    Use `supported(...)` to check shape applicability first.
    """
    out, _ = _sharded_fwd(interpret)(_to_kernel(q), _to_kernel(k),
                                     _to_kernel(v))
    return _from_kernel(out)


def _vjp_fwd(q, k, v, interpret):
    qt, kt, vt = _to_kernel(q), _to_kernel(k), _to_kernel(v)
    out, lse = _sharded_fwd(interpret)(qt, kt, vt)
    return _from_kernel(out), (qt, kt, vt, out, lse)


def _vjp_bwd(interpret, res, dout):
    qt, kt, vt, out, lse = res
    dq, dk, dv = _sharded_bwd(interpret)(
        qt, kt, vt, out, lse, _to_kernel(dout.astype(qt.dtype)))
    return _from_kernel(dq), _from_kernel(dk), _from_kernel(dv)


fused_temporal_attention.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_temporal_attention_kl(qt, kt, vt, interpret: bool = False):
    """Kernel-layout entry: q/k/v already (H, T, D, N), q pre-scaled.

    Skips the public wrapper's (N, T, H, D) <-> (H, T, D, N) transposes —
    used by the resident-layout ST block (models/st_transformer.py),
    which produces the kernel layout directly from its qkv einsum so the
    residual stream never changes layout."""
    out, _ = _sharded_fwd(interpret)(qt, kt, vt)
    return out


def _vjp_fwd_kl(qt, kt, vt, interpret):
    out, lse = _sharded_fwd(interpret)(qt, kt, vt)
    return out, (qt, kt, vt, out, lse)


def _vjp_bwd_kl(interpret, res, dout):
    qt, kt, vt, out, lse = res
    return _sharded_bwd(interpret)(qt, kt, vt, out, lse,
                                   dout.astype(qt.dtype))


fused_temporal_attention_kl.defvjp(_vjp_fwd_kl, _vjp_bwd_kl)


def supported(q_shape, head_dim: int) -> bool:
    """Shape gate: tiny T, lane-tileable site count, small heads."""
    N, T, H, D = q_shape
    return (T <= 16 and _block_n(N, T, D) > 0 and N >= 1024
            and D in (16, 32, 64) and H <= 16)
