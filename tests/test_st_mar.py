"""STMAR forward/loss, KV-cache exactness, and MAR rollout tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hma_tpu.config import DiffusionGenieConfig
from hma_tpu.models.st_mar import STMAR, patchify, unpatchify
from hma_tpu.rollout.mar import generate_latents, mar_subset_schedule


def tiny_config(**kw):
    d = dict(num_layers=2, num_heads=2, d_model=32, T=4, S=16,
             image_vocab_size=2**18, num_factored_vocabs=2,
             vae_embed_dim=4, patch_size=1, diffloss_d=1, diffloss_w=32,
             num_sampling_steps="5", maskgit_steps=4,
             action_token_size=8, action_network="concat+modulate",
             use_actions=True, jointly_predict_actions=True,
             action_domains=["a"], d_actions=[4],
             action_stats=[[[0.0, 0.0], [1.0, 1.0]]])
    d.update(kw)
    return DiffusionGenieConfig(**d)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = STMAR(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    B, h = 2, cfg.h
    lat = jnp.asarray(rng.normal(size=(B, cfg.T, h, h, cfg.vae_embed_dim)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(B, cfg.T, h, h)) < 0.5, jnp.int32)
    mask = mask.at[:, 0].set(0).at[:, 1, 0, 0].set(1)
    actions = jnp.asarray(rng.normal(size=(B, cfg.T, cfg.max_d_action)), jnp.float32)
    dom = jnp.asarray(0, jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "action_drop": jax.random.PRNGKey(2)},
        lat, lat, actions, dom, mask)
    return cfg, model, params, lat, mask, actions, dom


def test_patchify_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 3, 8, 8, 4)), jnp.float32)
    p2 = patchify(x, 2)
    assert p2.shape == (2, 3, 4, 4, 16)
    back = unpatchify(p2, 2, 4)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_forward_losses(setup):
    cfg, model, params, lat, mask, actions, dom = setup
    out = model.apply(params, lat, lat, actions, dom, mask,
                      rngs={"diffusion": jax.random.PRNGKey(3),
                            "action_drop": jax.random.PRNGKey(4)})
    assert np.isfinite(float(out["loss"]))
    assert np.isfinite(float(out["action_loss"]))


def test_diffusion_batch_mul(setup):
    """diffusion_batch_mul tiles token rows before the diffusion loss
    (reference st_mar.py:122-140): same param tree, same loss
    expectation, more (t, noise) samples per step."""
    cfg, model, params, lat, mask, actions, dom = setup
    cfg2 = tiny_config(diffusion_batch_mul=4)
    model2 = STMAR(cfg2, dtype=jnp.float32)
    params2 = model2.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "action_drop": jax.random.PRNGKey(2)}, lat, lat, actions, dom, mask)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params2))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        assert a.shape == b.shape
    rngs = {"diffusion": jax.random.PRNGKey(3),
            "action_drop": jax.random.PRNGKey(4)}
    out1 = model.apply(params, lat, lat, actions, dom, mask, rngs=rngs)
    out4 = model2.apply(params, lat, lat, actions, dom, mask, rngs=rngs)
    assert np.isfinite(float(out4["loss"]))
    assert np.isfinite(float(out4["action_loss"]))
    # the tiled estimate draws fresh timesteps per tiled row, so it must
    # actually differ from the single-sample estimate at the same key
    assert float(out4["loss"]) != float(out1["loss"])
    # ... but estimates the same expectation: averaging many single-draw
    # estimates over keys must approach the high-mul estimate
    many = np.mean([
        float(model.apply(params, lat, lat, actions, dom, mask,
                          rngs={"diffusion": jax.random.PRNGKey(100 + i),
                                "action_drop": jax.random.PRNGKey(4)})["loss"])
        for i in range(8)])
    assert abs(many - float(out4["loss"])) < 0.5 * many


def test_remat_with_dropout_trains():
    """Regression: nn.remat(STBlock, static_argnums) must mark
    `deterministic` — positional index 4 of STBlock.__call__, because
    flax counts the module instance as argument 0 — as static. With the
    off-by-one index (3,) the Python bool reaches jax.remat traced, and
    nn.Dropout's `(rate == 0.0) or deterministic` raises
    TracerBoolConversionError for any card with mlp_drop > 0 under
    remat=True in train mode — exactly the MAR production training
    configuration (the discrete cards' drop=0.0 short-circuits, which is
    why only STMAR training hit it)."""
    cfg = tiny_config(mlp_drop=0.1)
    model = STMAR(cfg, dtype=jnp.float32, remat=True)
    rng = np.random.default_rng(5)
    B, h = 2, cfg.h
    lat = jnp.asarray(rng.normal(size=(B, cfg.T, h, h, cfg.vae_embed_dim)),
                      jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(B, cfg.T, h, h)) < 0.5, jnp.int32)
    mask = mask.at[:, 0].set(0).at[:, 1, 0, 0].set(1)
    actions = jnp.asarray(rng.normal(size=(B, cfg.T, cfg.max_d_action)),
                          jnp.float32)
    dom = jnp.asarray(0, jnp.int32)
    rngs = {"diffusion": jax.random.PRNGKey(3),
            "action_drop": jax.random.PRNGKey(4),
            "dropout": jax.random.PRNGKey(5)}
    params = model.init({"params": jax.random.PRNGKey(0), **rngs},
                        lat, lat, actions, dom, mask)

    def loss_fn(p):
        return model.apply(p, lat, lat, actions, dom, mask,
                           deterministic=False, rngs=rngs)["loss"]

    loss, g = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    total = sum(float(jnp.sum(jnp.abs(x)))
                for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_remat_off_matches_remat_on(setup):
    """remat must be a pure memory/traffic knob, never a numerics one:
    bench.py's detail.mar runs remat=False (measured 4% faster at d512,
    where activations are tiny — PROFILE_r3.md "MAR train-step
    profile") while memory-bound multi-chip training keeps remat=True.
    Loss and every gradient leaf must agree between the two."""
    cfg, model, params, lat, mask, actions, dom = setup
    rm = STMAR(cfg, dtype=jnp.float32, remat=True)
    rngs = {"diffusion": jax.random.PRNGKey(3),
            "action_drop": jax.random.PRNGKey(4)}

    def make_loss(m):
        def f(p):
            out = m.apply(p, lat, lat, actions, dom, mask, rngs=rngs)
            return out["loss"] + out["action_loss"]
        return f

    l0, g0 = jax.value_and_grad(make_loss(model))(params)
    l1, g1 = jax.value_and_grad(make_loss(rm))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_frame_latents_match_full_forward(setup):
    cfg, model, params, lat, mask, actions, dom = setup
    B, T = lat.shape[:2]
    patches = patchify(lat, cfg.patch_size)
    S = patches.shape[2] * patches.shape[3]
    patches = patches.reshape(B, T, S, -1)

    z_full, _ = model.apply(params, patches.reshape(B, T, patches.shape[2], -1),
                            actions, dom, method=STMAR.compute_latents)

    k_cache, v_cache = model.apply(params, B, method=STMAR.init_cache)
    for t in range(T):
        z_t, _, k_cache, v_cache = model.apply(
            params, patches[:, t], jnp.asarray(t, jnp.int32), k_cache, v_cache,
            actions, dom, method=STMAR.frame_latents)
    np.testing.assert_allclose(np.asarray(z_t), np.asarray(z_full[:, T - 1]),
                               atol=2e-4, rtol=2e-4)


def test_mar_subset_schedule():
    starts, counts = mar_subset_schedule(16, 4)
    assert sum(counts) == 16
    # prefix property: predicted slices tile [0, 16) in reverse
    covered = []
    for s, c in zip(starts, counts):
        covered += list(range(s, s + c))
    assert sorted(covered) == list(range(16))


def test_mar_subset_schedule_reference_compat():
    """compat='reference' must reproduce the reference loop's selection
    math exactly (st_mar.py:376-411): per step, mask_to_pred =
    order[nxt:] with nxt = clamp(floor(S*cos(pi/2*(s+1)/steps)), 1, S-1)
    under a never-updated `unmasked` state, and the final step
    re-predicts ALL positions. This numpy oracle emulates that loop
    literally (boolean masks + xor), independent of our slice algebra."""
    import math

    for S, steps in [(16, 4), (64, 16), (16, 1), (7, 3)]:
        starts, counts = mar_subset_schedule(S, steps, compat="reference")
        unmasked = np.zeros(S, bool)  # init_mask; never updated (quirk)
        order = np.arange(S)  # identity order; selection is order-algebraic
        for s in range(steps):
            mask_ratio = np.cos(math.pi / 2.0 * (s + 1) / steps)
            mask_len = int(np.floor(S * mask_ratio))
            mask_len = max(1, min(int((~unmasked).sum()) - 1, mask_len))
            mask_next = np.zeros(S, bool)
            mask_next[order[:mask_len]] = True  # mask_by_order
            mask = ~unmasked
            if s >= steps - 1:
                to_pred = mask
            else:
                to_pred = np.logical_xor(mask, mask_next)
            got = np.zeros(S, bool)
            got[order[starts[s]:starts[s] + counts[s]]] = True
            np.testing.assert_array_equal(got, to_pred, err_msg=f"{S},{steps},{s}")
        # every position is predicted at least once, and the total work
        # is strictly more than the MAR-mode schedule (the quirk's cost)
        m_starts, m_counts = mar_subset_schedule(S, steps)
        assert sum(counts) >= sum(m_counts)
        assert counts[-1] == S  # final step resamples everything


def test_mar_generation_reference_compat(setup):
    """The compat rollout runs end-to-end and actually changes the
    sampling distribution (re-sampled positions differ from the
    sample-once path under the same key); with steps=1 the two modes'
    schedules coincide exactly."""
    cfg, model, params, lat, mask, actions, dom = setup
    outs = {}
    for compat in ("mar", "reference"):
        cfg2 = tiny_config(mar_sampling_compat=compat)
        model2 = STMAR(cfg2, dtype=jnp.float32)
        outs[compat] = np.asarray(generate_latents(
            model2, params, lat, 2, actions, dom, jax.random.PRNGKey(0),
            maskgit_steps=4))
        assert np.isfinite(outs[compat]).all()
        np.testing.assert_allclose(outs[compat][:, :2],
                                   np.asarray(lat[:, :2]), rtol=1e-6)
    assert not np.allclose(outs["mar"][:, 2:], outs["reference"][:, 2:])
    assert (mar_subset_schedule(16, 1, compat="reference")
            == mar_subset_schedule(16, 1))


def test_mar_reference_compat_cached_equals_naive_full_recompute(setup):
    """The KV-cached compat='reference' rollout must equal the 1:1 port
    of the reference algorithm (full T-frame recompute per refinement
    step, resample-every-step) — the test_rollout.py cached==naive
    pattern applied to the MAR family. Both paths draw the same rng
    stream in the same row layout, so equality is to float tolerance."""
    from hma_tpu.rollout.mar import generate_latents_reference_algo

    cfg, model, params, lat, mask, actions, dom = setup
    cfg2 = tiny_config(mar_sampling_compat="reference")
    model2 = STMAR(cfg2, dtype=jnp.float32)
    cached = np.asarray(generate_latents(
        model2, params, lat, 2, actions, dom, jax.random.PRNGKey(3),
        maskgit_steps=4))
    naive = np.asarray(generate_latents_reference_algo(
        model2, params, lat, 2, actions, dom, jax.random.PRNGKey(3),
        maskgit_steps=4))
    np.testing.assert_allclose(cached, naive, rtol=2e-4, atol=2e-4)


def test_mar_generation(setup):
    cfg, model, params, lat, mask, actions, dom = setup
    out = generate_latents(model, params, lat, 2, actions, dom,
                           jax.random.PRNGKey(0), maskgit_steps=4)
    assert out.shape == lat.shape
    # prompt frames preserved exactly
    np.testing.assert_allclose(np.asarray(out[:, :2]), np.asarray(lat[:, :2]),
                               rtol=1e-6)
    assert np.isfinite(np.asarray(out)).all()
    # generated frames differ from the (masked-out) originals
    assert not np.allclose(np.asarray(out[:, 2:]), np.asarray(lat[:, 2:]))


def test_teacher_forced_latents(setup):
    """Teacher-forced per-frame MAR predictions: right shape, finite, and
    actually generated (not a copy of the GT input)."""
    from hma_tpu.rollout.mar import teacher_forced_latents

    cfg, model, params, lat, mask, actions, dom = setup
    pred = teacher_forced_latents(model, params, lat, actions, dom,
                                  jax.random.PRNGKey(0), maskgit_steps=4)
    assert pred.shape == (lat.shape[0], cfg.T - 1, *lat.shape[2:])
    assert np.isfinite(np.asarray(pred)).all()
    assert not np.allclose(np.asarray(pred), np.asarray(lat[:, 1:]))
    # patch_size > 1 exercises the patchify/unpatchify path
    cfg2 = tiny_config(patch_size=2)
    model2 = STMAR(cfg2, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    lat2 = jnp.asarray(rng.normal(size=(2, cfg2.T, cfg2.h, cfg2.h,
                                        cfg2.vae_embed_dim)), jnp.float32)
    mask2 = jnp.zeros((2, cfg2.T, cfg2.h, cfg2.h), jnp.int32).at[:, 1:].set(1)
    params2 = model2.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "action_drop": jax.random.PRNGKey(2)},
        lat2, lat2, actions, dom, mask2)
    pred2 = teacher_forced_latents(model2, params2, lat2, actions, dom,
                                   jax.random.PRNGKey(1), maskgit_steps=2)
    assert pred2.shape == (2, cfg2.T - 1, cfg2.h, cfg2.h, cfg2.vae_embed_dim)
    assert np.isfinite(np.asarray(pred2)).all()


def test_mar_generation_no_mask_leakage(setup):
    """Regression: padding rows of the static-size scatter must not
    overwrite freshly-sampled patches with the mask row (the old
    clip-to-S-1 indices collided with the step's last reveal). With the
    mask token set to a sentinel, no generated position may keep it."""
    cfg, model, params, lat, mask, actions, dom = setup
    sentinel = 7.77
    p2 = jax.tree.map(lambda x: x, params)
    p2 = {"params": dict(p2["params"])}
    p2["params"]["mask_token"] = jnp.full_like(
        params["params"]["mask_token"], sentinel)
    out = generate_latents(model, p2, lat, 2, actions, dom,
                           jax.random.PRNGKey(5), maskgit_steps=4)
    gen = np.asarray(out[:, 2:])  # (B, T-2, h, w, C)
    leaked = np.all(np.isclose(gen, sentinel, atol=1e-6), axis=-1)
    assert not leaked.any(), f"{leaked.sum()} mask-row positions leaked"


def test_action_live_zero_equals_no_actions(setup):
    """CFG's unconditional half (action_live=0) must be EXACTLY the
    trained no-actions branch: same action-mask tokens, no per-layer
    injection — otherwise guidance pits cond against an untrained
    hybrid."""
    cfg, model, params, lat, mask, actions, dom = setup
    B = lat.shape[0]
    patches = lat.reshape(B, cfg.T, -1, cfg.vae_embed_dim)[:, 0]
    kc, vc = model.apply(params, B, method=STMAR.init_cache)
    t = jnp.asarray(0, jnp.int32)
    z_live0, _, _, _ = model.apply(
        params, patches, t, kc, vc, actions, dom,
        action_live=jnp.zeros((B,), jnp.float32), update_cache=False,
        method=STMAR.frame_latents)
    z_none, _, _, _ = model.apply(
        params, patches, t, kc, vc, None, dom, update_cache=False,
        method=STMAR.frame_latents)
    np.testing.assert_allclose(np.asarray(z_live0), np.asarray(z_none),
                               atol=1e-6)
    # and live=1 equals the plain action-conditioned forward
    z_live1, _, _, _ = model.apply(
        params, patches, t, kc, vc, actions, dom,
        action_live=jnp.ones((B,), jnp.float32), update_cache=False,
        method=STMAR.frame_latents)
    z_plain, _, _, _ = model.apply(
        params, patches, t, kc, vc, actions, dom, update_cache=False,
        method=STMAR.frame_latents)
    np.testing.assert_allclose(np.asarray(z_live1), np.asarray(z_plain),
                               atol=1e-6)


def test_mar_generation_with_cfg(setup):
    """Classifier-free guidance end to end: doubled-batch rollout runs,
    output is finite/correctly shaped, prompt frames survive, and the
    guidance scale actually changes the generations.

    The diffusion head's adaLN/final layers are zero-initialized (DiT
    convention), making a freshly-init head conditioning-independent —
    perturb the params so guidance has signal to amplify."""
    cfg, model, params, lat, mask, actions, dom = setup
    prng = np.random.default_rng(7)
    params = jax.tree.map(
        lambda x: x + 0.05 * prng.standard_normal(x.shape).astype(np.float32),
        params)
    out_cfg = generate_latents(model, params, lat, 2, actions, dom,
                               jax.random.PRNGKey(0), maskgit_steps=4,
                               cfg=2.0)
    assert out_cfg.shape == lat.shape
    assert np.isfinite(np.asarray(out_cfg)).all()
    np.testing.assert_allclose(np.asarray(out_cfg[:, :2]),
                               np.asarray(lat[:, :2]), rtol=1e-6)
    out_plain = generate_latents(model, params, lat, 2, actions, dom,
                                 jax.random.PRNGKey(0), maskgit_steps=4)
    # same keys: the cond half's orders and base noise match the plain
    # rollout, so any difference is exactly the guidance term
    assert not np.allclose(np.asarray(out_cfg[:, 2:]),
                           np.asarray(out_plain[:, 2:]))
