"""Multi-host (multi-process) distributed runtime.

The reference trains with torchrun over 8 GPUs/node x up to 8 nodes
(reference: experiments/scripts/discrete_model/run_30datasets_waction.sh:6-21,
experiments/scripts/posttraining_scripts/run_langtable_finetuning.sh:29),
process-per-GPU with NCCL. The TPU-native equivalent is process-per-host
SPMD (SURVEY.md §2.5/§5.8):

  - `jax.distributed.initialize` connects every host to a coordinator;
    `jax.devices()` then spans ALL hosts and a single Mesh covers the
    full slice. Collectives ride ICI within a host/pod and DCN across.
  - Each host feeds only its local shard of the global batch;
    `jax.make_array_from_process_local_data` assembles the global array
    without any cross-host data movement.
  - Scalar metrics come out of jit fully replicated (every host holds
    the value); host-side aggregation of *host-local* quantities (batch
    error counts, wall-clock) uses `multihost_utils.process_allgather`.

Everything is a no-op in the single-process case, so the same trainer
code path runs on one chip, a virtual CPU mesh, and a multi-host pod.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids: Optional[str] = None) -> bool:
    """Initialize multi-process JAX; returns True if distributed.

    Arguments fall back to the HMA_TPU_COORDINATOR / HMA_TPU_NUM_PROCESSES /
    HMA_TPU_PROCESS_ID / HMA_TPU_LOCAL_DEVICE_IDS environment variables, so
    launchers only need to export env (the torchrun-style contract of the
    reference's scripts). With no coordinator configured this is a no-op
    and the run stays single-process — on Cloud TPU pods where
    `jax.distributed.initialize()` could auto-discover the coordinator,
    set HMA_TPU_COORDINATOR=auto to opt in (calling initialize
    unconditionally would break every single-host run).
    """
    env = os.environ
    coordinator_address = coordinator_address or env.get("HMA_TPU_COORDINATOR")
    if num_processes is None and env.get("HMA_TPU_NUM_PROCESSES"):
        num_processes = int(env["HMA_TPU_NUM_PROCESSES"])
    if process_id is None and env.get("HMA_TPU_PROCESS_ID"):
        process_id = int(env["HMA_TPU_PROCESS_ID"])
    if local_device_ids is None:
        local_device_ids = env.get("HMA_TPU_LOCAL_DEVICE_IDS")
    if coordinator_address is None or (
            coordinator_address != "auto"
            and (not num_processes or num_processes <= 1)):
        return False
    # already initialized (e.g. an eval entry point after training in the
    # same process)? jax.process_count() would itself initialize the XLA
    # backend — too early on the first call — so probe the distributed
    # client state directly.
    from jax._src import distributed as _jax_distributed

    if getattr(_jax_distributed.global_state, "client", None) is not None:
        return True
    if coordinator_address == "auto":
        # Cloud TPU pod: let jax auto-discover the coordinator from the
        # TPU metadata server (explicit opt-in; see docstring).
        jax.distributed.initialize()
        return True
    kwargs = {}
    if local_device_ids:
        kwargs["local_device_ids"] = [int(x) for x in local_device_ids.split(",")]
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)
    return True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the process that should own logging/checkpoint bookkeeping."""
    return jax.process_index() == 0


def local_slice(global_indices: np.ndarray) -> np.ndarray:
    """This process's contiguous shard of a global batch's sample indices.

    All processes run the same seeded sampler; each loads 1/process_count
    of every batch. Contiguous (not strided) so the assembled global
    array's batch axis matches sharding order.
    """
    n = jax.process_count()
    if n == 1:
        return global_indices
    per = len(global_indices) // n
    r = jax.process_index()
    return global_indices[r * per:(r + 1) * per]


def make_global_batch(local_batch: dict, put) -> dict:
    """Assemble a global device batch from this process's local shard.

    `put(v)` returns the NamedSharding for each leaf (batch axis over the
    data mesh axes). Arrays become globally-sharded jax.Arrays via
    make_array_from_process_local_data; scalars (domain_id) are identical
    on every process by sampler-seed construction and pass through as
    host-local values, which jit treats as replicated.
    """
    if jax.process_count() == 1:
        return local_batch
    out = {}
    for k, v in local_batch.items():
        if getattr(v, "ndim", 0) >= 1:
            out[k] = jax.make_array_from_process_local_data(
                put(v), np.asarray(v))
        else:
            out[k] = v
    return out


def aggregate_host_metrics(metrics: dict) -> dict:
    """Mean of host-local scalar metrics across processes
    (multihost_utils.process_allgather); identity when single-process."""
    if jax.process_count() == 1:
        return dict(metrics)
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    stacked = np.asarray([float(metrics[k]) for k in keys], np.float32)
    gathered = multihost_utils.process_allgather(stacked)  # (P, K)
    return {k: float(v) for k, v in zip(keys, np.asarray(gathered).mean(0))}
