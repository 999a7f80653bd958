"""Data-parallel sharded evaluation over the device mesh.

The reference evaluates under multi-GPU Accelerate with cross-rank metric
reduction (reference: hma/evaluate.py:227,387-401 — `accelerator.gather`
around the val loop). The TPU-native equivalent used by the standalone
eval CLIs (hma_tpu/evaluate.py, evaluate_feature.py):

  - one (dp, fsdp, tp, sp) mesh over all devices (all hosts after
    `init_distributed`); model params are placed by the same
    `make_param_shardings` rules as training;
  - every process loads only its contiguous slice of each global batch
    (`distributed.local_slice`) and the global device batch is assembled
    with `jax.make_array_from_process_local_data` — no cross-host data
    movement;
  - metrics computed *inside* jit over the global batch come out as
    replicated scalars (XLA inserts the cross-device reductions), so
    token-level metrics need no host aggregation at all;
  - host-side pixel metrics (tokenizer decode runs on host shards) are
    per-process means over equal-size shards, averaged across processes
    with `multihost_utils.process_allgather`
    (`distributed.aggregate_host_metrics`).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from hma_tpu.parallel.mesh import DATA_AXES, make_mesh, make_param_shardings


def setup_eval_mesh(fsdp: int = 1, tp: int = 1, sp: int = 1,
                    batch_hint: int | None = None):
    """Pure-dp by default; fsdp/tp/sp for models too big per device.

    batch_hint: the CLI batch size — dp shrinks (leaving devices idle)
    until the global batch divides evenly over (dp*fsdp) shards and
    process_count slices, so tiny eval batches still run."""
    n = len(jax.devices())
    dp = n // (fsdp * tp * sp)
    assert dp >= 1, (n, fsdp, tp, sp)
    if batch_hint:
        pc = jax.process_count()
        while dp > 1 and batch_hint % int(np.lcm(dp * fsdp, pc)):
            dp -= 1
    return make_mesh(n_devices=dp * fsdp * tp * sp, dp=dp, fsdp=fsdp,
                     tp=tp, sp=sp)


def shard_params(params, mesh):
    return jax.device_put(params, make_param_shardings(params, mesh))


def data_degree(mesh) -> int:
    """Global batch must be a multiple of this (and of process_count)."""
    return int(np.lcm(mesh.shape["dp"] * mesh.shape["fsdp"],
                      jax.process_count()))


def round_batch(n: int, mesh) -> int:
    """Largest multiple of the data degree <= n (0 if none)."""
    d = data_degree(mesh)
    return (n // d) * d


def put_batch(local: dict, mesh):
    """Per-process local batch dict -> globally sharded device arrays.

    Arrays shard their leading (batch) axis over (dp, fsdp); scalars pass
    through (treated as replicated by jit). With one process this is a
    plain device_put."""
    single = jax.process_count() == 1

    def leaf(v):
        if not hasattr(v, "ndim") or v.ndim < 1:
            return v
        v = np.asarray(v)
        sh = NamedSharding(mesh, P(DATA_AXES, *([None] * (v.ndim - 1))))
        if single:
            return jax.device_put(v, sh)
        return jax.make_array_from_process_local_data(sh, v)

    return {k: leaf(v) for k, v in local.items()}


def local_rows(global_arr) -> np.ndarray:
    """This process's rows of a batch-sharded global array, in batch order.

    Replicated copies (tp/sp axes) are deduplicated by batch offset."""
    shards = sorted(global_arr.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    seen, rows = set(), []
    for s in shards:
        off = s.index[0].start or 0
        if off in seen:
            continue
        seen.add(off)
        rows.append(np.asarray(s.data))
    return np.concatenate(rows, axis=0)
