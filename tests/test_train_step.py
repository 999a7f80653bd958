"""Train-step + sharded multi-device tests on the virtual 8-CPU mesh."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hma_tpu.config import GenieConfig
from hma_tpu.models.st_mask_git import STMaskGIT
from hma_tpu.parallel.mesh import (
    batch_sharding,
    default_mesh_factors,
    make_mesh,
    make_param_shardings,
)
from hma_tpu.train.step import (
    TrainState,
    custom_cosine_schedule,
    make_optimizer,
    make_train_step,
    scale_lr_by_batch,
    weight_decay_mask,
)


def tiny_setup(d_model=32, heads=2):
    cfg = GenieConfig(num_layers=2, num_heads=heads, d_model=d_model, T=4, S=16,
                      image_vocab_size=2**18, num_factored_vocabs=2,
                      action_token_size=8, action_network="concat+modulate",
                      use_actions=True, action_domains=["a"], d_actions=[4],
                      action_stats=[[[0.0, 0.0], [1.0, 1.0]]])
    model = STMaskGIT(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    B = 8
    tokens = np.asarray(rng.integers(0, cfg.image_vocab_size, (B, cfg.T, cfg.S)), np.int32)
    inp = tokens.copy()
    inp[:, 1:, :8] = cfg.image_vocab_size
    batch = {
        "input_ids": jnp.asarray(inp),
        "labels": jnp.asarray(tokens),
        "action_ids": jnp.asarray(rng.normal(size=(B, cfg.T, cfg.max_d_action)), jnp.float32),
        "domain_id": jnp.asarray(0, jnp.int32),
    }
    params = model.init({"params": jax.random.PRNGKey(0)},
                        batch["input_ids"], batch["labels"],
                        batch["action_ids"], batch["domain_id"])
    return cfg, model, params, batch


def test_schedule_and_lr_scaling():
    sched = custom_cosine_schedule(1.0, warmup_steps=10, max_steps=110)
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(9)) == pytest.approx(1.0)
    assert float(sched(110)) == pytest.approx(0.1, abs=1e-6)
    assert scale_lr_by_batch(1e-4, 64) == pytest.approx(1e-4)
    assert scale_lr_by_batch(1e-4, 2048) == pytest.approx(8e-4)
    assert scale_lr_by_batch(1e-4, 8) == pytest.approx(1e-4)


def test_weight_decay_mask():
    cfg, model, params, batch = tiny_setup()
    mask = weight_decay_mask(params)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    by_name = {jax.tree_util.keystr(kp): v for kp, v in flat}
    assert any("bias" in k and v is False for k, v in by_name.items())
    assert any("kernel" in k and v is True for k, v in by_name.items())


def test_train_step_loss_decreases():
    cfg, model, params, batch = tiny_setup()
    tx = make_optimizer(3e-3, params_template=params)
    step = jax.jit(make_train_step(model, tx))
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))


def mar_tiny_setup():
    from hma_tpu.config import DiffusionGenieConfig
    from hma_tpu.models.st_mar import STMAR

    cfg = DiffusionGenieConfig(
        num_layers=2, num_heads=2, d_model=32, T=4, S=16,
        image_vocab_size=2**18, num_factored_vocabs=2,
        vae_embed_dim=4, patch_size=1, diffloss_d=1, diffloss_w=32,
        num_sampling_steps="5", maskgit_steps=2,
        action_token_size=8, action_network="concat+modulate",
        use_actions=True, action_domains=["a"], d_actions=[4],
        action_stats=[[[0.0, 0.0], [1.0, 1.0]]])
    model = STMAR(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    B = 8
    lat = rng.normal(size=(B, cfg.T, cfg.h, cfg.h, 4)).astype(np.float32)
    mask = (rng.uniform(size=(B, cfg.T, cfg.h, cfg.h)) < 0.5).astype(np.int32)
    mask[:, 1, 0, 0] = 1
    batch = {
        "input_ids": jnp.asarray(lat),
        "labels": jnp.asarray(lat),
        "masked_tokens_indicator": jnp.asarray(mask),
        "action_ids": jnp.asarray(rng.normal(size=(B, cfg.T, cfg.max_d_action)), jnp.float32),
        "domain_id": jnp.asarray(0, jnp.int32),
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "action_drop": jax.random.PRNGKey(2)},
        batch["input_ids"], batch["labels"], batch["action_ids"],
        batch["domain_id"], batch["masked_tokens_indicator"])
    return cfg, model, params, batch


def test_grad_accumulation_matches_full_batch():
    cfg, model, params, batch = tiny_setup()
    tx = make_optimizer(1e-3, params_template=params)
    full = make_train_step(model, tx)
    micro = make_train_step(model, tx, microbatch=4)
    s0 = TrainState(params, tx.init(params), jnp.asarray(0))
    # dropout rate is 0 so rng differences don't matter for the loss value;
    # grads averaged over microbatches must equal the full-batch grads.
    _, m_full = jax.jit(full)(s0, batch, jax.random.PRNGKey(0))
    _, m_micro = jax.jit(micro)(s0, batch, jax.random.PRNGKey(0))
    assert float(m_full["loss"]) == pytest.approx(float(m_micro["loss"]), rel=1e-5)
    assert float(m_full["grad_norm"]) == pytest.approx(float(m_micro["grad_norm"]), rel=1e-3)


def test_grad_accumulation_continuous_matches_manual():
    """STMAR (continuous) gradient accumulation: the diffusion head draws
    per-microbatch rng, so micro != full exactly; instead verify the scan
    accumulates exactly the mean of the per-chunk grads computed manually
    with the same folded keys."""
    import optax

    cfg, model, params, batch = mar_tiny_setup()
    tx = make_optimizer(1e-3, params_template=params)
    micro = make_train_step(model, tx, microbatch=4, continuous=True)
    s0 = TrainState(params, tx.init(params), jnp.asarray(0))
    rng = jax.random.PRNGKey(0)
    _, m_micro = jax.jit(micro)(s0, batch, rng)
    assert np.isfinite(float(m_micro["loss"]))

    # manual accumulation with the same per-chunk keys the scan uses
    def chunk_loss(p, mb, key):
        out = model.apply(
            p, mb["input_ids"], mb["labels"], mb["action_ids"],
            batch["domain_id"], mb["masked_tokens_indicator"],
            deterministic=False,
            rngs={"diffusion": key, "dropout": jax.random.fold_in(key, 1),
                  "action_drop": jax.random.fold_in(key, 2)})
        loss = out["loss"]
        if "action_loss" in out:
            loss = loss + 0.5 * out["action_loss"]
        return loss

    keys = jax.random.split(rng, 2)
    grads, losses = None, []
    for i in range(2):
        mb = {k: v[4 * i:4 * (i + 1)] for k, v in batch.items()
              if getattr(v, "ndim", 0) >= 1}
        l, g = jax.value_and_grad(chunk_loss)(params, mb, keys[i])
        losses.append(float(l))
        grads = g if grads is None else jax.tree.map(jnp.add, grads, g)
    grads = jax.tree.map(lambda x: x / 2, grads)
    want_norm = float(optax.global_norm(grads))
    # micro's grad_norm is post-clip input norm == raw accumulated norm
    assert float(m_micro["grad_norm"]) == pytest.approx(want_norm, rel=1e-4)


def test_sharded_train_step_8_devices():
    assert len(jax.devices()) == 8
    cfg, model, params, batch = tiny_setup(d_model=64, heads=4)
    dp, fsdp, tp, sp = default_mesh_factors(8)
    mesh = make_mesh(8, dp=dp, fsdp=fsdp, tp=tp, sp=sp)

    shardings = make_param_shardings(params, mesh)
    params = jax.device_put(params, shardings)
    batch = jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh)(x)) if x.ndim >= 1
        else jax.device_put(x), batch)

    tx = make_optimizer(1e-3, params_template=params)
    step = jax.jit(make_train_step(model, tx))
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

    # at least one parameter actually sharded over tp or fsdp
    leaves = jax.tree_util.tree_leaves(state.params)
    assert any(len(l.sharding.spec) and any(s is not None for s in l.sharding.spec)
               for l in leaves if hasattr(l, "sharding"))

    # sharded result equals single-device result
    cfg2, model2, params2, batch2 = tiny_setup(d_model=64, heads=4)
    tx2 = make_optimizer(1e-3, params_template=params2)
    step2 = jax.jit(make_train_step(model2, tx2))
    state2 = TrainState(params2, tx2.init(params2), jnp.asarray(0))
    _, metrics2 = step2(state2, batch2, jax.random.PRNGKey(0))
    assert float(metrics["loss"]) == pytest.approx(float(metrics2["loss"]), rel=1e-4)


def test_nan_guard_skips_update():
    cfg, model, params, batch = tiny_setup()
    tx = make_optimizer(1e-3, params_template=params)
    step = jax.jit(make_train_step(model, tx))
    bad = dict(batch)
    bad["action_ids"] = batch["action_ids"].at[0, 0, 0].set(jnp.nan)
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    new_state, metrics = step(state, bad, jax.random.PRNGKey(0))
    if not np.isfinite(float(metrics["loss"])):
        assert float(metrics["skipped"]) == 1.0
        l0 = jax.tree_util.tree_leaves(state.params)[0]
        l1 = jax.tree_util.tree_leaves(new_state.params)[0]
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


class _FiniteLossNaNGradModel(nn.Module):
    """Finite forward, NaN backward: sqrt(u) at u=0 has an infinite
    derivative, and u = w*0 gives d loss/dw = inf * 0 = NaN while the
    loss itself is exactly 1.0. This is the real-world failure shape of
    2026-08-19's d512 STMAR overfit run: the VB term's backward
    overflowed while the loss stayed finite, and a loss-only NaN guard
    let one NaN grad poison every param through clip_by_global_norm."""

    @nn.compact
    def __call__(self, input_ids, labels, action_ids=None, domain_id=None,
                 deterministic=True):
        w = self.param("w", lambda k, s: jnp.ones(s, jnp.float32), (4,))
        loss = jnp.sum(jnp.sqrt(w * 0.0)) + 1.0
        return {"loss": loss, "acc": jnp.zeros((), jnp.float32)}


def test_nan_guard_catches_finite_loss_nan_grads_dense():
    model = _FiniteLossNaNGradModel()
    batch = {"input_ids": jnp.zeros((2, 2), jnp.int32),
             "labels": jnp.zeros((2, 2), jnp.int32),
             "domain_id": jnp.asarray(0, jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), batch["input_ids"],
                        batch["labels"])
    # the trap really is finite-loss / NaN-grad
    grads = jax.grad(lambda p: model.apply(
        p, batch["input_ids"], batch["labels"])["loss"])(params)
    assert not np.all(np.isfinite(np.asarray(grads["params"]["w"])))

    tx = make_optimizer(1e-3, params_template=params)
    step = jax.jit(make_train_step(model, tx))
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert float(metrics["loss"]) == pytest.approx(1.0)
    assert float(metrics["skipped"]) == 1.0
    np.testing.assert_array_equal(
        np.asarray(new_state.params["params"]["w"]),
        np.asarray(state.params["params"]["w"]))
    for leaf in jax.tree_util.tree_leaves(new_state.opt_state):
        assert np.all(np.isfinite(np.asarray(leaf, np.float32)))


def test_nan_guard_catches_finite_loss_nan_grads_sliced():
    """Direct update_and_apply: NaN in the active domain's grad slice with
    ok=True (finite loss) must leave params unchanged and the sliced Adam
    moments finite — a poisoned moment would propagate NaN into every
    later step for that domain."""
    from hma_tpu.train.step import make_domain_sliced_optimizer

    num_domains = 3
    params = {
        "table": jnp.ones((num_domains, 4, 4), jnp.float32),
        "dense": jnp.ones((4, 4), jnp.float32),
    }
    stacked_mask = {"table": True, "dense": False}
    tx = make_domain_sliced_optimizer(
        1e-3, params_template=params, stacked_mask=stacked_mask,
        num_domains=num_domains)
    opt_state = tx.init(params)

    grads = {
        "table": jnp.zeros((num_domains, 4, 4), jnp.float32)
        .at[1, 0, 0].set(jnp.nan),
        "dense": jnp.ones((4, 4), jnp.float32),
    }
    new_params, new_state, g_norm = tx.update_and_apply(
        grads, opt_state, params, jnp.asarray(1, jnp.int32),
        jnp.asarray(True))
    assert not np.isfinite(float(g_norm))
    for k in params:
        np.testing.assert_array_equal(np.asarray(new_params[k]),
                                      np.asarray(params[k]))
    for leaf in jax.tree_util.tree_leaves(new_state):
        assert np.all(np.isfinite(np.asarray(leaf, np.float32)))

    # and a clean step afterwards still updates normally
    good = {"table": jnp.zeros_like(grads["table"]).at[1].set(0.1),
            "dense": jnp.full((4, 4), 0.1, jnp.float32)}
    p2, s2, gn2 = tx.update_and_apply(
        good, new_state, new_params, jnp.asarray(1, jnp.int32),
        jnp.asarray(True))
    assert np.isfinite(float(gn2))
    assert not np.array_equal(np.asarray(p2["dense"]),
                              np.asarray(new_params["dense"]))
    assert not np.array_equal(np.asarray(p2["table"][1]),
                              np.asarray(new_params["table"][1]))
    np.testing.assert_array_equal(np.asarray(p2["table"][0]),
                                  np.asarray(new_params["table"][0]))
