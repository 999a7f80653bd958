"""Device mesh construction and parameter sharding rules.

Replaces the reference's torch DDP/NCCL stack (hma/train_multi.py:779,
torchrun launchers) with jax.sharding over a named Mesh:

  axes: dp    - pure data parallelism (params replicated)
        fsdp  - data parallelism with ZeRO-style parameter sharding
        tp    - tensor parallelism over attention heads / MLP hidden dim
        sp    - sequence parallelism over the spatial token axis
                (activations only; params replicated)

  Pipeline and expert parallelism do not apply to this architecture (no
  layer pipelining need at T*S <= 3840 tokens; no MoE).

Gradients all-reduce over (dp, fsdp) and activations over tp are XLA
collectives riding ICI; nothing here issues an explicit collective — we
annotate shardings and let the compiler insert them (scaling-book
recipe). The reference only ever had DP; tp/fsdp are strict extensions.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXES = ("dp", "fsdp")


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              fsdp: int = 1, tp: int = 1, sp: int = 1, devices=None) -> Mesh:
    """Create a (dp, fsdp, tp, sp) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = n_devices or len(devices)
    if dp is None:
        assert n % (fsdp * tp * sp) == 0, (n, fsdp, tp, sp)
        dp = n // (fsdp * tp * sp)
    # Explicit factors may target a SUBSET of the visible devices (e.g.
    # dp=1 on the 8-virtual-device CPU test mesh: an 8-way SPMD program
    # on a 1-core host pays compile + thread contention for nothing);
    # the first dp*fsdp*tp*sp devices are used in enumeration order.
    k = dp * fsdp * tp * sp
    assert k <= n, (dp, fsdp, tp, sp, n)
    arr = np.asarray(devices[:k]).reshape(dp, fsdp, tp, sp)
    return Mesh(arr, axis_names=("dp", "fsdp", "tp", "sp"))


def default_mesh_factors(n: int) -> tuple[int, int, int, int]:
    """Pick a sensible (dp, fsdp, tp, sp) factorization of n devices."""
    sp = 2 if n % 8 == 0 and n >= 8 else 1
    rem = n // sp
    tp = 2 if rem % 2 == 0 and rem >= 4 else 1
    rem //= tp
    fsdp = 2 if rem % 2 == 0 and rem >= 2 else 1
    dp = rem // fsdp
    return dp, fsdp, tp, sp


def _divisible(dim: int, mesh: Mesh, axis: str) -> bool:
    return dim % mesh.shape[axis] == 0 and mesh.shape[axis] > 1


def param_spec(path: tuple[str, ...], value: jax.Array, mesh: Mesh) -> P:
    """Partition spec for one parameter, keyed on its flax path.

    Tensor-parallel layout (Megatron-style column/row split):
      qkv / mlp.fc1 / to_{q,k,v}: split output features over tp;
      attention proj / mlp.fc2:   split input features over tp;
      embeddings / readout:       split over tp on the feature dim;
    then, if a dim is still free and large, shard it over fsdp.
    """
    name = path[-1]
    parent = path[-2] if len(path) >= 2 else ""
    ndim = value.ndim
    spec: list = [None] * ndim

    if name in ("kernel",) and ndim >= 2:
        col_split = parent in ("qkv", "fc1", "to_q", "to_k", "to_v", "ada_fc1", "ada_fc2")
        row_split = parent in ("proj", "fc2", "linear_out", "out_x_proj", "out")
        if col_split and _divisible(value.shape[-1], mesh, "tp"):
            spec[-1] = "tp"
        elif row_split and _divisible(value.shape[-2], mesh, "tp"):
            spec[-2] = "tp"
    elif name == "embedding" and ndim == 2:
        if _divisible(value.shape[-1], mesh, "tp"):
            spec[-1] = "tp"

    # ZeRO-style fsdp sharding on the largest still-unsharded dim.
    if mesh.shape["fsdp"] > 1 and value.size >= 2**16:
        order = sorted(range(ndim), key=lambda i: -value.shape[i])
        for i in order:
            if spec[i] is None and value.shape[i] % mesh.shape["fsdp"] == 0:
                spec[i] = "fsdp"
                break
    return P(*spec)


def make_param_shardings(params, mesh: Mesh):
    """NamedShardings for a parameter pytree (apply with jax.device_put or
    as jit in/out shardings)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def to_spec(kp, v):
        path = tuple(getattr(k, "key", getattr(k, "idx", str(k))) for k in kp)
        return NamedSharding(mesh, param_spec(path, v, mesh))

    specs = {jax.tree_util.keystr(kp): to_spec(kp, v) for kp, v in flat}
    return jax.tree_util.tree_map_with_path(
        lambda kp, v: specs[jax.tree_util.keystr(kp)], params)


def batch_sharding(mesh: Mesh):
    """Shard the leading (batch) axis over the data axes and — for the
    discrete (B, T, S) integer token layout — the trailing spatial token
    axis over 'sp'.

    Only integer 3-D arrays qualify: sharding every trailing dim over sp
    would split the continuous batch's 4-channel latent dim and the
    float action-width dim, which are not sequence axes, forcing XLA to
    insert reshards at the model boundary. Float leaves (latents,
    actions) and masks stay batch-sharded only; the model's internal
    sequence sharding constraints handle the rest."""
    sp = mesh.shape.get("sp", 1)

    def per_leaf(x):
        if not hasattr(x, "ndim") or x.ndim < 1:
            return NamedSharding(mesh, P())
        spec = [None] * x.ndim
        spec[0] = DATA_AXES
        if (x.ndim == 3 and sp > 1
                and jnp.issubdtype(x.dtype, jnp.integer)
                and x.shape[-1] % sp == 0 and x.shape[-1] >= 2 * sp):
            spec[-1] = "sp"
        return NamedSharding(mesh, P(*spec))
    return per_leaf


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
