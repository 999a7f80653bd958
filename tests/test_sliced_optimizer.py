"""Domain-sliced AdamW (train/step.py DomainSlicedOptimizer).

The reference trains per-domain torch ModuleDicts under one AdamW; unused
domains' params keep p.grad = None, which torch AdamW *skips* entirely —
no moment decay, no weight decay, no per-param step increment
(hma/train_multi.py:896-922 builds the optimizer over every domain's
modules). The sliced optimizer reproduces those semantics on the
domain-stacked parameter tables and is oracle-tested here against optax
AdamW instances stepped per-domain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hma_tpu.config import GenieConfig
from hma_tpu.models.st_mask_git import STMaskGIT
from hma_tpu.parallel.mesh import batch_sharding, make_mesh, make_param_shardings
from hma_tpu.train.step import (
    TrainState,
    _prune,
    domain_stacked_mask,
    make_domain_sliced_optimizer,
    make_optimizer,
    make_train_step,
    weight_decay_mask,
)

ND = 3


def tiny_setup(num_domains=ND, d_model=32):
    def mk_cfg(n):
        return GenieConfig(
            num_layers=2, num_heads=2, d_model=d_model, T=4, S=16,
            image_vocab_size=2**18, num_factored_vocabs=2,
            action_token_size=8, action_network="concat+modulate",
            use_actions=True,
            action_domains=[f"d{i}" for i in range(n)],
            d_actions=[4] * n,
            action_stats=[[[0.0, 0.0], [1.0, 1.0]]] * n)

    cfg = mk_cfg(num_domains)
    model = STMaskGIT(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    B = 4
    tokens = np.asarray(rng.integers(0, cfg.image_vocab_size, (B, cfg.T, cfg.S)), np.int32)
    inp = tokens.copy()
    inp[:, 1:, :8] = cfg.image_vocab_size

    def batch_for(domain):
        return {
            "input_ids": jnp.asarray(inp),
            "labels": jnp.asarray(tokens),
            "action_ids": jnp.asarray(
                rng.normal(size=(B, cfg.T, cfg.max_d_action)), jnp.float32),
            "domain_id": jnp.asarray(domain, jnp.int32),
        }

    batch = batch_for(0)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        batch["input_ids"], batch["labels"],
                        batch["action_ids"], batch["domain_id"])
    other = jax.eval_shape(
        STMaskGIT(mk_cfg(num_domains + 1), dtype=jnp.float32).init,
        {"params": jax.random.PRNGKey(0)},
        batch["input_ids"], batch["labels"],
        batch["action_ids"], batch["domain_id"])
    mask = domain_stacked_mask(params, other)
    return cfg, model, params, mask, batch_for


def real_grads(model, params, batch, key):
    def loss_fn(p):
        out = model.apply(p, batch["input_ids"], batch["labels"],
                          batch["action_ids"], batch["domain_id"],
                          deterministic=True,
                          rngs={"action_drop": key})
        return out["loss"]

    return jax.grad(loss_fn)(params)


def test_stacked_mask_structure():
    cfg, model, params, mask, _ = tiny_setup()
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    for kp, m in flat:
        path = jax.tree_util.keystr(kp)
        stacked = "action_stem" in path or "action_projector" in path
        assert m == stacked, path
    # every stacked leaf really has the domain leading axis
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if "action_stem" in jax.tree_util.keystr(kp) or \
           "action_projector" in jax.tree_util.keystr(kp):
            assert leaf.shape[0] == ND


def test_inactive_domain_grads_are_exactly_zero():
    """Precondition for slicing: grads outside the active domain slice are
    bit-zero (the stacked tables are only read via gather at domain_id)."""
    cfg, model, params, mask, batch_for = tiny_setup()
    grads = real_grads(model, params, batch_for(1), jax.random.PRNGKey(1))
    stacked_g = _prune(mask, grads, True)
    for leaf in jax.tree_util.tree_leaves(stacked_g):
        inactive = np.delete(np.asarray(leaf), 1, axis=0)
        assert np.all(inactive == 0.0)
        assert np.any(np.asarray(leaf)[1] != 0.0)


def test_oracle_equivalence_multi_step():
    """Sliced optimizer == {dense optax AdamW on shared params} +
    {per-domain optax AdamW stepped only when that domain is active},
    both fed the same globally-clipped gradients."""
    cfg, model, params, mask, batch_for = tiny_setup()
    lr, wd, clip_norm = 3e-3, 0.05, 1.0

    tx = make_domain_sliced_optimizer(
        lr, wd, max_grad_norm=clip_norm, params_template=params,
        stacked_mask=mask, num_domains=ND)
    state = tx.init(params)
    p_mine = params

    # oracle state
    dense_p = _prune(mask, params, False)
    stacked_p = _prune(mask, params, True)
    dense_tx = optax.adamw(lr, weight_decay=wd,
                           mask=weight_decay_mask(dense_p))
    dense_state = dense_tx.init(dense_p)
    take = lambda tree, d: jax.tree.map(lambda x: x[d], tree)
    slice_templates = {d: take(stacked_p, d) for d in range(ND)}
    slice_tx = {d: optax.adamw(lr, weight_decay=wd,
                               mask=weight_decay_mask(slice_templates[d]))
                for d in range(ND)}
    slice_state = {d: slice_tx[d].init(slice_templates[d]) for d in range(ND)}
    slice_p = dict(slice_templates)
    clip = optax.clip_by_global_norm(clip_norm)
    clip_state = clip.init(params)

    schedule_domains = [0, 1, 0, 2, 1, 0]
    for i, d in enumerate(schedule_domains):
        g = real_grads(model, p_mine, batch_for(d), jax.random.PRNGKey(i))

        # mine
        p_mine, state, g_norm = tx.update_and_apply(
            g, state, p_mine, jnp.asarray(d), jnp.asarray(True))

        # oracle: same grads (trajectories must stay identical for grads
        # to match, which this loop verifies transitively)
        g_clipped, _ = clip.update(g, clip_state)
        assert np.isclose(float(g_norm), float(optax.global_norm(g)), rtol=1e-5)
        gd = _prune(mask, g_clipped, False)
        gs = take(_prune(mask, g_clipped, True), d)
        upd, dense_state = dense_tx.update(gd, dense_state, dense_p)
        dense_p = optax.apply_updates(dense_p, upd)
        upd_s, slice_state[d] = slice_tx[d].update(gs, slice_state[d], slice_p[d])
        slice_p[d] = optax.apply_updates(slice_p[d], upd_s)

    # compare
    flat_mine_dense = jax.tree.leaves(_prune(mask, p_mine, False))
    for a, b in zip(flat_mine_dense, jax.tree.leaves(dense_p)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
    mine_stacked = _prune(mask, p_mine, True)
    for d in range(ND):
        for a, b in zip(jax.tree.leaves(take(mine_stacked, d)),
                        jax.tree.leaves(slice_p[d])):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
    counts = np.asarray(state.count)
    assert counts.tolist() == [3, 2, 1]


def test_single_step_vs_dense_and_skip_semantics():
    """One step from identical init: shared params and the active slice
    match the dense optax path bit-for-bit-ish; inactive slices stay
    untouched under the sliced optimizer (the dense path weight-decays
    them — the torch reference would not)."""
    cfg, model, params, mask, batch_for = tiny_setup()
    lr, wd = 3e-3, 0.05

    tx_s = make_domain_sliced_optimizer(
        lr, wd, params_template=params, stacked_mask=mask, num_domains=ND)
    tx_d = make_optimizer(lr, wd, params_template=params)

    step_s = jax.jit(make_train_step(model, tx_s))
    step_d = jax.jit(make_train_step(model, tx_d))
    st_s = TrainState(params, tx_s.init(params), jnp.asarray(0))
    st_d = TrainState(params, tx_d.init(params), jnp.asarray(0))
    batch = batch_for(1)
    st_s, m_s = step_s(st_s, batch, jax.random.PRNGKey(0))
    st_d, m_d = step_d(st_d, batch, jax.random.PRNGKey(0))
    assert np.isclose(float(m_s["loss"]), float(m_d["loss"]))
    assert np.isclose(float(m_s["grad_norm"]), float(m_d["grad_norm"]), rtol=1e-5)

    ps, pd = st_s.params, st_d.params
    for a, b in zip(jax.tree.leaves(_prune(mask, ps, False)),
                    jax.tree.leaves(_prune(mask, pd, False))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
    for a, b, p0 in zip(jax.tree.leaves(_prune(mask, ps, True)),
                        jax.tree.leaves(_prune(mask, pd, True)),
                        jax.tree.leaves(_prune(mask, params, True))):
        a, b, p0 = map(np.asarray, (a, b, p0))
        np.testing.assert_allclose(a[1], b[1], rtol=1e-5, atol=1e-7)
        np.testing.assert_array_equal(np.delete(a, 1, 0), np.delete(p0, 1, 0))


def test_mup_single_step_vs_dense():
    cfg, model, params, mask, batch_for = tiny_setup()
    lr, wd, mult = 3e-3, 0.05, 2.0
    tx_s = make_domain_sliced_optimizer(
        lr, wd, params_template=params, stacked_mask=mask, num_domains=ND,
        mup_width_mult=mult)
    tx_d = make_optimizer(lr, wd, params_template=params, mup_width_mult=mult)
    step_s = jax.jit(make_train_step(model, tx_s))
    step_d = jax.jit(make_train_step(model, tx_d))
    st_s = TrainState(params, tx_s.init(params), jnp.asarray(0))
    st_d = TrainState(params, tx_d.init(params), jnp.asarray(0))
    batch = batch_for(0)
    st_s, _ = step_s(st_s, batch, jax.random.PRNGKey(0))
    st_d, _ = step_d(st_d, batch, jax.random.PRNGKey(0))
    for a, b in zip(jax.tree.leaves(_prune(mask, st_s.params, False)),
                    jax.tree.leaves(_prune(mask, st_d.params, False))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree.leaves(_prune(mask, st_s.params, True)),
                    jax.tree.leaves(_prune(mask, st_d.params, True))):
        np.testing.assert_allclose(np.asarray(a)[0], np.asarray(b)[0],
                                   rtol=1e-5, atol=1e-7)


def test_nan_skip_preserves_params():
    cfg, model, params, mask, batch_for = tiny_setup()
    tx = make_domain_sliced_optimizer(
        3e-3, 0.05, params_template=params, stacked_mask=mask, num_domains=ND)
    step = jax.jit(make_train_step(model, tx))
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    bad = dict(batch_for(0))
    bad["action_ids"] = jnp.full_like(bad["action_ids"], jnp.nan)
    state2, metrics = step(state, bad, jax.random.PRNGKey(0))
    assert float(metrics["skipped"]) == 1.0
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(a, b)


def test_sharded_matches_single_device():
    """fsdp/tp-sharded sliced step == single-device sliced step.

    eps=1e-3: with the default 1e-8, params whose gradient is
    *numerically* ~0 (1e-12 reduction noise) get a full ±lr first Adam
    step whose sign depends on cross-device reduction order — that
    amplification is Adam numerics, not a slicing/sharding bug, and a
    fat eps suppresses it (update ≈ g/eps ≈ 0 for noise-level g)."""
    cfg, model, params, mask, batch_for = tiny_setup()
    tx = make_domain_sliced_optimizer(
        3e-3, 0.05, eps=1e-3, params_template=params, stacked_mask=mask,
        num_domains=ND)

    # batch_for draws fresh actions each call — materialize once so the
    # single-device and sharded runs see identical batches
    batches = [batch_for(d) for d in [0, 2]]

    # single device
    step1 = jax.jit(make_train_step(model, tx))
    st1 = TrainState(params, tx.init(params), jnp.asarray(0))
    for i, b in enumerate(batches):
        st1, m1 = step1(st1, b, jax.random.PRNGKey(i))

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    mesh = make_mesh(8, dp=2, fsdp=2, tp=2, sp=1)
    shardings = make_param_shardings(params, mesh)
    p_sh = jax.device_put(params, shardings)
    opt_sh = jax.jit(tx.init)(p_sh)
    stm = TrainState(p_sh, opt_sh, jnp.asarray(0))
    stepm = jax.jit(make_train_step(model, tx))
    put = batch_sharding(mesh)
    for i, b0 in enumerate(batches):
        b = jax.tree.map(
            lambda x: jax.device_put(x, put(x)) if x.ndim >= 1
            else jax.device_put(x), b0)
        stm, mm = stepm(stm, b, jax.random.PRNGKey(i))
    # second-step loss carries step-1 reduction-order noise through the
    # params; 1e-4 rel is the observed envelope on the virtual mesh
    assert np.isclose(float(m1["loss"]), float(mm["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(st1.params), jax.tree.leaves(stm.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
