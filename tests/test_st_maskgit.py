"""Shape / loss / KV-cache-exactness tests for the STMaskGIT model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hma_tpu.config import GenieConfig
from hma_tpu.models.st_mask_git import STMaskGIT


def tiny_config(**kw):
    defaults = dict(
        num_layers=2, num_heads=2, d_model=32, T=4, S=16,
        image_vocab_size=2**18, num_factored_vocabs=2,
        action_token_size=8, action_network="concat+modulate",
        use_actions=True, jointly_predict_actions=True,
        action_domains=["domA", "domB"],
        d_actions=[4, 6],
        action_stats=[[[0.1, 0.2], [1.0, 2.0]], [[0.0, 0.0, 0.5], [1.0, 1.0, 1.0]]],
        use_mup=False,
    )
    defaults.update(kw)
    return GenieConfig(**defaults)


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_config()
    model = STMaskGIT(cfg, dtype=jnp.float32)
    B, T, S = 2, cfg.T, cfg.S
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.image_vocab_size, (B, T, S)), jnp.int32)
    actions = jnp.asarray(rng.normal(size=(B, T, cfg.max_d_action)), jnp.float32)
    domain_id = jnp.asarray(0, jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "action_drop": jax.random.PRNGKey(1)},
        tokens, tokens, actions, domain_id)
    return cfg, model, params, tokens, actions, domain_id


def test_forward_shapes(model_and_params):
    cfg, model, params, tokens, actions, domain_id = model_and_params
    logits, action_pred = model.apply(
        params, tokens, actions, domain_id, method=STMaskGIT.compute_logits)
    B, T, S = tokens.shape
    h = int(np.sqrt(S))
    assert logits.shape == (B, cfg.factored_vocab_size * cfg.num_factored_vocabs, T, h, h)
    assert action_pred.shape == (B, T, cfg.max_d_action)
    assert logits.dtype == jnp.float32


def test_loss_runs_and_masked_only(model_and_params):
    cfg, model, params, tokens, actions, domain_id = model_and_params
    mask_id = cfg.image_vocab_size
    inp = tokens.at[:, 1:, :8].set(mask_id)
    out = model.apply(params, inp, tokens, actions, domain_id,
                      rngs={"action_drop": jax.random.PRNGKey(2)})
    assert np.isfinite(float(out["loss"]))
    assert 0.0 <= float(out["acc"]) <= 1.0
    assert np.isfinite(float(out["action_loss"]))

    # fully-unmasked input: loss guard avoids NaN
    out2 = model.apply(params, tokens, tokens, actions, domain_id,
                       rngs={"action_drop": jax.random.PRNGKey(2)})
    assert np.isfinite(float(out2["loss"]))


def test_smoothed_ce_floor_matches_loss_implementation(model_and_params):
    """smoothed_ce_floor is the exact minimum of compute_video_loss_and_acc.

    Feed logits whose softmax equals the smoothed target distribution
    (the argmin of CE(q, .)): the measured loss must equal the analytic
    floor, with acc 1.0. This is what lets convergence checks (bench.py
    detail.overfit, experiments/overfit_probe.py) judge excess loss.
    """
    from hma_tpu.models.factorization import factorize_labels
    from hma_tpu.models.st_mask_git import smoothed_ce_floor

    cfg, model, params, tokens, actions, domain_id = model_and_params
    B, T, S = tokens.shape
    h = int(np.sqrt(S))
    fv, nv = cfg.factored_vocab_size, cfg.num_factored_vocabs
    targets = tokens.reshape(B, T, h, h)
    ft = factorize_labels(targets, nv, fv)          # (B, nv, T, h, h)
    eps = 0.01
    onehot = jax.nn.one_hot(ft, fv, axis=2)          # (B, nv, fv, T, h, h)
    q = (1 - eps) * onehot + eps / fv
    logits = jnp.log(q).reshape(B, nv * fv, T, h, h)
    mask = jnp.ones((B, T - 1, h, h), bool)
    loss, acc = STMaskGIT.compute_video_loss_and_acc(
        model, logits, targets, mask)
    floor = smoothed_ce_floor(nv, fv, eps)
    assert float(acc) == 1.0
    np.testing.assert_allclose(float(loss), floor, rtol=1e-5)
    # and the floor is a true lower bound: confident one-hot logits land
    # ABOVE it (over-confidence is penalized by the smoothed term)
    sharp = jnp.log(onehot * (1 - 1e-7) + 1e-7 / fv).reshape(
        B, nv * fv, T, h, h)
    loss2, _ = STMaskGIT.compute_video_loss_and_acc(
        model, sharp, targets, mask)
    assert float(loss2) > floor


def test_frame_logits_match_full_forward(model_and_params):
    """The KV-cached single-frame path must equal the full forward exactly."""
    cfg, model, params, tokens, actions, domain_id = model_and_params
    B, T, S = tokens.shape
    mask_id = cfg.image_vocab_size

    # mask the last frame, as during rollout
    inp = tokens.at[:, T - 1].set(mask_id)

    full_logits, _ = model.apply(params, inp, actions, domain_id,
                                 method=STMaskGIT.compute_logits)
    # full: (B, C, T, H, W) -> frame t, (B, S, nv, fv)
    h = int(np.sqrt(S))
    full = full_logits.reshape(B, cfg.num_factored_vocabs, cfg.factored_vocab_size, T, h, h)
    k_cache, v_cache = model.apply(params, B, method=STMaskGIT.init_cache)

    # prefill frames 0..T-2, then query frame T-1
    for t in range(T - 1):
        _, k_cache, v_cache = model.apply(
            params, inp[:, t], jnp.asarray(t, jnp.int32), k_cache, v_cache,
            actions, domain_id, method=STMaskGIT.frame_logits)

    logits_t, _, _ = model.apply(
        params, inp[:, T - 1], jnp.asarray(T - 1, jnp.int32), k_cache, v_cache,
        actions, domain_id, method=STMaskGIT.frame_logits)

    want = np.asarray(full[:, :, :, T - 1].transpose(0, 3, 4, 1, 2)).reshape(
        B, S, cfg.num_factored_vocabs, cfg.factored_vocab_size)
    np.testing.assert_allclose(np.asarray(logits_t), want, atol=2e-4, rtol=2e-4)


def test_domain_id_switches_params(model_and_params):
    cfg, model, params, tokens, actions, domain_id = model_and_params
    l0, _ = model.apply(params, tokens, actions, jnp.asarray(0, jnp.int32),
                        method=STMaskGIT.compute_logits)
    l1, _ = model.apply(params, tokens, actions, jnp.asarray(1, jnp.int32),
                        method=STMaskGIT.compute_logits)
    assert not np.allclose(np.asarray(l0), np.asarray(l1))


def test_no_action_path():
    cfg = tiny_config(use_actions=False, jointly_predict_actions=False,
                      action_domains=None, d_actions=None, action_stats=None,
                      action_network="mlp")
    model = STMaskGIT(cfg, dtype=jnp.float32)
    B = 2
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, cfg.image_vocab_size, (B, cfg.T, cfg.S)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens, tokens)
    out = model.apply(params, tokens, tokens)
    assert np.isfinite(float(out["loss"]))


def test_remat_model_matches_and_trains(model_and_params):
    """remat=True must not change forward values and must produce grads."""
    cfg, model, params, tokens, actions, domain_id = model_and_params
    from hma_tpu.models.st_mask_git import STMaskGIT as M

    rm = M(cfg, dtype=jnp.float32, remat=True)
    l1, _ = model.apply(params, tokens, actions, domain_id,
                        method=M.compute_logits)
    l2, _ = rm.apply(params, tokens, actions, domain_id,
                     method=M.compute_logits)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)
    inp = tokens.at[:, 1:, :8].set(cfg.image_vocab_size)
    g = jax.grad(lambda p: rm.apply(
        p, inp, tokens, actions, domain_id,
        rngs={"action_drop": jax.random.PRNGKey(0)})["loss"])(params)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_resident_layout_matches_transpose(model_and_params):
    """temporal_layout="resident" (no residual-stream transposes; see
    STBlock) must be value-identical to the default path, forward and
    gradient — it reorders layout plumbing, not math."""
    cfg, model, params, tokens, actions, domain_id = model_and_params
    from hma_tpu.models.st_mask_git import STMaskGIT as M

    res = M(cfg, dtype=jnp.float32, temporal_layout="resident")
    l1, a1 = model.apply(params, tokens, actions, domain_id,
                         method=M.compute_logits)
    l2, a2 = res.apply(params, tokens, actions, domain_id,
                       method=M.compute_logits)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                               atol=2e-5, rtol=1e-5)

    inp = tokens.at[:, 1:, :8].set(cfg.image_vocab_size)

    def loss(m):
        return lambda p: m.apply(
            p, inp, tokens, actions, domain_id,
            rngs={"action_drop": jax.random.PRNGKey(0)})["loss"]

    g1 = jax.grad(loss(model))(params)
    g2 = jax.grad(loss(res))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4)


def test_window_logits_matches_full_forward(model_and_params):
    """Multi-frame cached window pass equals the full forward."""
    cfg, model, params, tokens, actions, domain_id = model_and_params
    B, T, S = tokens.shape
    full_logits, _ = model.apply(params, tokens, actions, domain_id,
                                 method=STMaskGIT.compute_logits)
    h = int(np.sqrt(S))
    full = np.asarray(full_logits.reshape(
        B, cfg.num_factored_vocabs, cfg.factored_vocab_size, T, h, h)
        .transpose(0, 3, 4, 5, 1, 2)).reshape(B, T, S, cfg.num_factored_vocabs,
                                              cfg.factored_vocab_size)
    k_cache, v_cache = model.apply(params, B, method=STMaskGIT.init_cache)
    got = []
    for t0 in range(0, T, 2):
        l, k_cache, v_cache = model.apply(
            params, tokens[:, t0:t0 + 2], jnp.asarray(t0, jnp.int32),
            k_cache, v_cache, actions, domain_id, write_frames=2,
            method=STMaskGIT.window_logits)
        got.append(np.asarray(l))
    np.testing.assert_allclose(np.concatenate(got, axis=1), full,
                               atol=3e-4, rtol=3e-4)


def test_frame_logits_no_actions_with_joint_prediction(model_and_params):
    """Cached path with jointly_predict_actions=True but action_ids=None
    must append the action mask tokens exactly like compute_logits'
    elif branch (regression: it used to crash on the cache concat)."""
    cfg, model, params, tokens, actions, domain_id = model_and_params
    B, T, S = tokens.shape
    mask_id = cfg.image_vocab_size
    inp = tokens.at[:, T - 1].set(mask_id)

    full_logits, _ = model.apply(params, inp, None, domain_id,
                                 method=STMaskGIT.compute_logits)
    h = int(np.sqrt(S))
    full = full_logits.reshape(B, cfg.num_factored_vocabs,
                               cfg.factored_vocab_size, T, h, h)
    k_cache, v_cache = model.apply(params, B, method=STMaskGIT.init_cache)
    for t in range(T - 1):
        _, k_cache, v_cache = model.apply(
            params, inp[:, t], jnp.asarray(t, jnp.int32), k_cache, v_cache,
            None, domain_id, method=STMaskGIT.frame_logits)
    logits_t, _, _ = model.apply(
        params, inp[:, T - 1], jnp.asarray(T - 1, jnp.int32), k_cache,
        v_cache, None, domain_id, method=STMaskGIT.frame_logits)
    want = np.asarray(full[:, :, :, T - 1].transpose(0, 3, 4, 1, 2)).reshape(
        B, S, cfg.num_factored_vocabs, cfg.factored_vocab_size)
    np.testing.assert_allclose(np.asarray(logits_t), want, atol=2e-4,
                               rtol=2e-4)
