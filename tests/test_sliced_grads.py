"""Sliced-gradient training (train/step.py make_train_step(stacked_mask=)).

The stacked domain tables (40 domains x 32 layers for the 1B-class MAR
card) dominate the parameter count, yet each train step touches ONE
domain's row — the reference gets the same effect for free from torch's
p.grad = None (hma/train_multi.py:896-922). A naive jax.grad instead
scatter-adds into a full-size zero tree (~6 GB fp32 at the 1B card,
the single biggest transient in the step). Sliced gradients dynamic-
slice the active row out of every stacked table BEFORE jax.grad
(models declare 1-row tables via single_domain_params; take_domain's
static size-1 rule redirects the lookup), so the backward only ever
sees one row. These tests pin exactness:

  1. forward equality: the single_domain_params model applied to
     row-sliced params == the full model, both families;
  2. trajectory equality: the sliced-grad train step == the full-grad
     step over several steps and domains (same rng), params AND moments;
  3. NaN-skip still holds under sliced grads;
  4. the guard rails (wrong optimizer / wrong model flag) raise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hma_tpu.models.st_mask_git import STMaskGIT
from hma_tpu.train.step import (
    TrainState,
    domain_stacked_mask,
    make_domain_sliced_optimizer,
    make_optimizer,
    make_train_step,
)
from tests.test_sliced_optimizer import ND, tiny_setup


def _slice_params(stacked_mask, params, d):
    return jax.tree.map(
        lambda m, p: jax.lax.dynamic_slice_in_dim(p, d, 1, axis=0)
        if m else p, stacked_mask, params)


def test_forward_matches_full_model_discrete():
    cfg, model, params, mask, batch_for = tiny_setup()
    model1 = STMaskGIT(cfg, dtype=jnp.float32, single_domain_params=True)
    for d in range(ND):
        batch = batch_for(d)
        kw = dict(deterministic=True, rngs={"action_drop": jax.random.PRNGKey(7)})
        full = model.apply(params, batch["input_ids"], batch["labels"],
                           batch["action_ids"], batch["domain_id"], **kw)
        rows = _slice_params(mask, params, jnp.asarray(d))
        one = model1.apply(rows, batch["input_ids"], batch["labels"],
                           batch["action_ids"], batch["domain_id"], **kw)
        np.testing.assert_array_equal(np.asarray(full["loss"]),
                                      np.asarray(one["loss"]))
        np.testing.assert_array_equal(np.asarray(full["acc"]),
                                      np.asarray(one["acc"]))


def test_forward_matches_full_model_continuous():
    from hma_tpu.config import DiffusionGenieConfig
    from hma_tpu.models.st_mar import STMAR

    n = 3

    def mk_cfg(k):
        return DiffusionGenieConfig(
            num_layers=2, num_heads=2, d_model=32, T=4, S=16,
            image_vocab_size=2**18, num_factored_vocabs=2,
            vae_embed_dim=4, patch_size=1, diffloss_d=2, diffloss_w=32,
            num_sampling_steps="8", maskgit_steps=4,
            action_token_size=8, action_network="concat+modulate",
            use_actions=True, jointly_predict_actions=True,
            action_domains=[f"d{i}" for i in range(k)],
            d_actions=[4] * k,
            action_stats=[[[0.0, 0.0], [1.0, 1.0]]] * k)

    cfg = mk_cfg(n)
    model = STMAR(cfg, dtype=jnp.float32)
    model1 = STMAR(cfg, dtype=jnp.float32, single_domain_params=True)
    rng = np.random.default_rng(1)
    B = 2
    lat = jnp.asarray(rng.normal(size=(B, cfg.T, 4, 4, 4)), jnp.float32)
    msk = jnp.asarray(rng.uniform(size=(B, cfg.T, 4, 4)) < 0.6, jnp.int32)
    act = jnp.asarray(rng.normal(size=(B, cfg.T, cfg.max_d_action)), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
            "action_drop": jax.random.PRNGKey(2)}
    params = model.init(rngs, lat, lat, act, jnp.asarray(0), msk)
    other = jax.eval_shape(
        STMAR(mk_cfg(n + 1), dtype=jnp.float32).init,
        rngs, lat, lat, act, jnp.asarray(0), msk)
    mask = domain_stacked_mask(params, other)

    for d in range(n):
        call = {"deterministic": True,
                "rngs": {"diffusion": jax.random.PRNGKey(3),
                         "action_drop": jax.random.PRNGKey(4)}}
        full = model.apply(params, lat, lat, act, jnp.asarray(d), msk, **call)
        rows = _slice_params(mask, params, jnp.asarray(d))
        one = model1.apply(rows, lat, lat, act, jnp.asarray(d), msk, **call)
        np.testing.assert_array_equal(np.asarray(full["loss"]),
                                      np.asarray(one["loss"]))
        np.testing.assert_array_equal(np.asarray(full["action_loss"]),
                                      np.asarray(one["action_loss"]))


def test_sliced_grads_match_full_grads():
    """Gradient equality — the one thing sliced-grads changes.

    At identical params, the sliced backward's row must equal the full
    backward's active row leafwise, and the full backward's inactive
    rows must be identically zero (that zero-ness is WHY slicing is
    exact: clip norm, moments, updates all unchanged).

    Deliberately NOT an Adam-trajectory comparison: two differently-
    fused fp32 backward graphs agree only to last-bit reduce-order
    noise, and Adam's first-step m/sqrt(v) ~ sign(g) amplifies that
    noise to O(lr) update differences wherever g ~ 0, so trajectories
    diverge measurably (grad_norm ~4% after 5 steps) without any
    semantic difference. Update semantics given identical grads are
    pinned by the oracle tests in test_sliced_optimizer.py.
    """
    cfg, model, params, mask, batch_for = tiny_setup()
    model1 = STMaskGIT(cfg, dtype=jnp.float32, single_domain_params=True)

    def make_loss(m):
        def loss(p, batch, key):
            out = m.apply(p, batch["input_ids"], batch["labels"],
                          batch["action_ids"], batch["domain_id"],
                          deterministic=True, rngs={"action_drop": key})
            l = out["loss"]
            if "action_loss" in out:
                l = l + 0.5 * out["action_loss"]
            return l
        return loss

    g_full_fn = jax.jit(jax.grad(make_loss(model)))
    g_slcd_fn = jax.jit(jax.grad(make_loss(model1)))

    for d in range(ND):
        batch = batch_for(d)
        key = jax.random.PRNGKey(d)
        g_full = g_full_fn(params, batch, key)
        g_slcd = g_slcd_fn(_slice_params(mask, params, jnp.asarray(d)),
                           batch, key)

        def check(m, gf, gs):
            gf, gs = np.asarray(gf), np.asarray(gs)
            if m:
                np.testing.assert_allclose(gf[d], gs[0],
                                           rtol=1e-3, atol=1e-6)
                rest = np.delete(gf, d, axis=0)
                np.testing.assert_array_equal(rest, np.zeros_like(rest))
            else:
                np.testing.assert_allclose(gf, gs, rtol=1e-3, atol=1e-6)

        jax.tree.map(check, mask, g_full, g_slcd)


def test_sliced_grad_nan_skip():
    cfg, model, params, mask, batch_for = tiny_setup()
    model1 = STMaskGIT(cfg, dtype=jnp.float32, single_domain_params=True)
    tx = make_domain_sliced_optimizer(
        3e-3, 0.05, params_template=params, stacked_mask=mask, num_domains=ND)
    step = jax.jit(make_train_step(model1, tx, stacked_mask=mask))
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    bad = dict(batch_for(0))
    bad["action_ids"] = jnp.full_like(bad["action_ids"], jnp.nan)
    state2, metrics = step(state, bad, jax.random.PRNGKey(0))
    assert float(metrics["skipped"]) == 1.0
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(a, b)


def test_guard_rails():
    cfg, model, params, mask, batch_for = tiny_setup()
    model1 = STMaskGIT(cfg, dtype=jnp.float32, single_domain_params=True)
    dense_tx = make_optimizer(3e-3, params_template=params)
    with pytest.raises(ValueError, match="domain-sliced optimizer"):
        make_train_step(model1, dense_tx, stacked_mask=mask)
    sliced_tx = make_domain_sliced_optimizer(
        3e-3, params_template=params, stacked_mask=mask, num_domains=ND)
    with pytest.raises(ValueError, match="single_domain_params"):
        make_train_step(model, sliced_tx, stacked_mask=mask)
