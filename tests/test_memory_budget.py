"""fsdp memory proof for the 1B-class STMAR flagship (VERDICT r3 item 5).

PARITY.md calls fsdp "its production training mode" for the 40-domain
d512 STMAR card (~1.5B params: 32 layers x 40 domains of adaLN tables):
fp32 params + Adam moments exceed one v5e's 16 GB HBM, so the card only
trains sharded (reference scale point: 8-node langtable finetuning,
experiments/scripts/posttraining_scripts/run_langtable_finetuning.sh:29).

This test proves the arithmetic with the ACTUAL sharding rules, not just
that tiny shapes compile: eval_shape the full card, apply
make_param_shardings on a v5e-8 mesh, and account fp32 params + both
Adam moments per device via NamedSharding.shard_shape. Also asserts the
unsharded total genuinely exceeds one chip, so the test has teeth.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hma_tpu.config import DiffusionGenieConfig
from hma_tpu.models.st_mar import STMAR
from hma_tpu.parallel.mesh import default_mesh_factors, make_mesh, make_param_shardings

V5E_HBM_BYTES = 16 * 2**30
CARD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "hma_tpu", "configs", "mar_n32_h8_d512_action.json")


def _flagship_mar_config(num_domains=40):
    card = json.load(open(CARD))
    card.pop("Diffusion", None)
    rng = np.random.default_rng(0)
    domains = [f"domain_{i}" for i in range(num_domains)]
    d_actions, stats = [], []
    for _ in range(num_domains):
        base = int(rng.integers(2, 8))
        d_actions.append(base)
        stats.append([rng.normal(size=base).tolist(),
                      (np.abs(rng.normal(size=base)) + 0.5).tolist()])
    return DiffusionGenieConfig(**card, action_domains=domains,
                                d_actions=d_actions, action_stats=stats)


@pytest.fixture(scope="module")
def flagship_shapes():
    cfg = _flagship_mar_config()
    model = STMAR(cfg)
    B = 1
    lat = jax.ShapeDtypeStruct((B, cfg.T, cfg.h, cfg.h, cfg.vae_embed_dim),
                               jnp.float32)
    act = jax.ShapeDtypeStruct((B, cfg.T, cfg.max_d_action), jnp.float32)
    mask = jax.ShapeDtypeStruct((B, cfg.T, cfg.h, cfg.h), jnp.int32)
    dom = jax.ShapeDtypeStruct((), jnp.int32)
    shapes = jax.eval_shape(
        model.init,
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "action_drop": jax.random.PRNGKey(2)}, lat, lat, act, dom, mask)
    return cfg, shapes


def _per_device_bytes(shapes, mesh):
    """fp32 params + Adam mu + nu, on the device holding the largest shard."""
    total = 0
    shardings = make_param_shardings(shapes, mesh)
    for leaf, sh in zip(jax.tree_util.tree_leaves(shapes),
                        jax.tree_util.tree_leaves(
                            shardings, is_leaf=lambda x: hasattr(x, "spec"))):
        shard = sh.shard_shape(leaf.shape)
        total += int(np.prod(shard)) * 4 * 3  # param + mu + nu, fp32
    return total


def test_flagship_mar_exceeds_one_chip_unsharded(flagship_shapes):
    cfg, shapes = flagship_shapes
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(shapes))
    assert n_params > 1.2e9, n_params  # the 1B-class claim
    unsharded = n_params * 4 * 3
    assert unsharded > V5E_HBM_BYTES, (
        "card fits one chip — the fsdp budget test would be vacuous")


@pytest.mark.parametrize("factors", ["pure_fsdp", "default"])
def test_flagship_mar_fits_v5e8_under_fsdp(flagship_shapes, factors):
    """Max per-device fp32 param+optimizer bytes under the actual
    make_param_shardings specs must leave a v5e-8 slice with real
    headroom for activations (budget: 60% of HBM for state)."""
    cfg, shapes = flagship_shapes
    if factors == "pure_fsdp":
        mesh = make_mesh(8, dp=1, fsdp=8, tp=1, sp=1)
    else:
        dp, fsdp, tp, sp = default_mesh_factors(8)
        mesh = make_mesh(8, dp=dp, fsdp=fsdp, tp=tp, sp=sp)
    per_dev = _per_device_bytes(shapes, mesh)
    assert per_dev < 0.6 * V5E_HBM_BYTES, (
        f"{per_dev/2**30:.2f} GiB/device of param+Adam state under "
        f"{dict(mesh.shape)} — exceeds the 60% HBM budget")


def test_flagship_mar_single_chip_with_bf16_moments(flagship_shapes):
    """bf16 Adam moments (train/lowp.py) are what fit the 40-domain card
    on ONE chip: fp32 params + fp32 m/v is 12 B/param and exceeds a v5e's
    HBM (the teeth), while fp32 params + bf16 m/v is 8 B/param and leaves
    >25% headroom for gradients/activations. The on-chip counterpart
    (a real train step at this config) is experiments/mar_probe.py
    train1b; this pins the arithmetic the claim rests on."""
    cfg, shapes = flagship_shapes
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(shapes))
    assert n_params * 12 > V5E_HBM_BYTES  # fp32 moments: does NOT fit
    bf16_state = n_params * (4 + 2 + 2)   # fp32 param + bf16 mu + bf16 nu
    assert bf16_state < 0.75 * V5E_HBM_BYTES, (
        f"{bf16_state/2**30:.2f} GiB of param+bf16-moment state — "
        "no headroom left for grads/activations on one v5e")


def test_shard_accounting_counts_everything(flagship_shapes):
    """Sanity on the accounting itself: per-device bytes x devices must be
    >= the unsharded total (replicated leaves count once per device), and
    pure fsdp=8 must shard at least 85% of the bytes."""
    cfg, shapes = flagship_shapes
    mesh = make_mesh(8, dp=1, fsdp=8, tp=1, sp=1)
    per_dev = _per_device_bytes(shapes, mesh)
    total = sum(int(np.prod(l.shape)) * 4 * 3
                for l in jax.tree_util.tree_leaves(shapes))
    assert per_dev * 8 >= total
    assert per_dev < 0.15 * total + 0.05 * total, (
        f"fsdp leaves {per_dev/total:.1%} of state on one device")
