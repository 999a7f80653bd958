"""Rollout engine tests: cached generation must match a naive
full-forward MaskGIT loop step for step."""

import jax
import jax.numpy as jnp
import numpy as np

from hma_tpu.config import GenieConfig
from hma_tpu.models.schedules import maskgit_mask_counts
from hma_tpu.models.st_mask_git import STMaskGIT
from hma_tpu.rollout.maskgit import (
    _mask_lowest,
    _sample_factored,
    generate_tokens,
    generate_tokens_full,
    teacher_forced_logits,
)


def setup_model():
    cfg = GenieConfig(num_layers=2, num_heads=2, d_model=32, T=4, S=16,
                      image_vocab_size=2**18, num_factored_vocabs=2,
                      action_token_size=8, action_network="concat+modulate",
                      use_actions=True, action_domains=["a"], d_actions=[4],
                      action_stats=[[[0.0, 0.0], [1.0, 1.0]]])
    model = STMaskGIT(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    B = 2
    tokens = jnp.asarray(rng.integers(0, cfg.image_vocab_size, (B, cfg.T, cfg.S)), jnp.int32)
    actions = jnp.asarray(rng.normal(size=(B, cfg.T, cfg.max_d_action)), jnp.float32)
    dom = jnp.asarray(0, jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        tokens, tokens, actions, dom)
    return cfg, model, params, tokens, actions, dom


def naive_generate(model, params, prompt_TS, num_prompt, actions, dom, key,
                   maskgit_steps):
    """Reference-style rollout: full T-frame forward per MaskGIT step
    (mirrors st_mask_git.py:337-467), sharing the sampling helpers."""
    cfg = model.config
    B, T, S = prompt_TS.shape
    mask_id = cfg.image_vocab_size
    cur = jnp.where((jnp.arange(T) < num_prompt)[None, :, None], prompt_TS, mask_id)
    ns = maskgit_mask_counts(maskgit_steps, S)
    for t in range(num_prompt, T):
        key, k_t = jax.random.split(key)
        unmasked = jnp.zeros((B, S), bool)
        tokens_t = jnp.full((B, S), mask_id, jnp.int32)
        step_key = k_t
        for step in range(maskgit_steps):
            inp = cur.at[:, t].set(tokens_t)
            logits_full, _ = model.apply(params, inp, actions, dom,
                                         method=STMaskGIT.compute_logits)
            nv, fv = cfg.num_factored_vocabs, cfg.factored_vocab_size
            lt = logits_full[:, :, t].reshape(B, nv, fv, cfg.h, cfg.w)
            lt = lt.transpose(0, 3, 4, 1, 2).reshape(B, S, nv, fv)
            step_key, k_samp, k_conf = jax.random.split(step_key, 3)
            samples, confidence = _sample_factored(lt, k_samp, 0.0, fv)
            prev_unmasked = unmasked
            n = ns[step]
            if n > 0:
                conf = jnp.where(unmasked, jnp.inf, confidence)
                lowest = _mask_lowest(conf, n)
                unmasked = unmasked | ~lowest
                samples = jnp.where(lowest, mask_id, samples)
            else:
                unmasked = jnp.ones_like(unmasked)
            samples = jnp.where(prev_unmasked, tokens_t, samples)
            tokens_t = samples
        cur = cur.at[:, t].set(tokens_t)
    return cur


def test_cached_rollout_matches_naive_greedy():
    cfg, model, params, tokens, actions, dom = setup_model()
    key = jax.random.PRNGKey(7)
    out_fast = generate_tokens(model, params, tokens, 2, actions, dom, key,
                               maskgit_steps=2, temperature=0.0,
                               unmask_mode="greedy")
    out_naive = naive_generate(model, params, tokens, 2, actions, dom, key,
                               maskgit_steps=2)
    np.testing.assert_array_equal(np.asarray(out_fast), np.asarray(out_naive))
    # prompt frames preserved
    np.testing.assert_array_equal(np.asarray(out_fast[:, :2]), np.asarray(tokens[:, :2]))
    assert int(out_fast.max()) < cfg.image_vocab_size


def test_full_recompute_rollout_matches_cached():
    """generate_tokens_full (the cross_attention_compat rollout path) must
    equal the cached rollout token-for-token under the same key — its
    sampling and RNG-split structure deliberately mirror _maskgit_refine.
    Covered in both unmask modes so the random-confidence draws align too."""
    cfg, model, params, tokens, actions, dom = setup_model()
    for mode in ("greedy", "random"):
        key = jax.random.PRNGKey(11)
        fast = generate_tokens(model, params, tokens, 2, actions, dom, key,
                               maskgit_steps=3, temperature=0.0,
                               unmask_mode=mode)
        full = generate_tokens_full(model, params, tokens, 2, actions, dom,
                                    key, maskgit_steps=3, temperature=0.0,
                                    unmask_mode=mode)
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(full))


def test_teacher_forced_logits_shapes():
    cfg, model, params, tokens, actions, dom = setup_model()
    samples, logits = teacher_forced_logits(model, params, tokens, actions, dom,
                                            jax.random.PRNGKey(0), maskgit_steps=2)
    B, T, S = tokens.shape
    assert samples.shape == (B, T - 1, S)
    assert logits.shape == (B, T - 1, S, cfg.num_factored_vocabs, cfg.factored_vocab_size)


def test_mask_lowest():
    conf = jnp.asarray([[0.5, 0.1, 0.9, 0.3]])
    m = _mask_lowest(conf, 2)
    np.testing.assert_array_equal(np.asarray(m), [[False, True, False, True]])


def test_sample_factored_greedy():
    logits = jnp.zeros((1, 2, 2, 4))
    logits = logits.at[0, 0, 0, 3].set(5.0).at[0, 0, 1, 1].set(5.0)
    logits = logits.at[0, 1, 0, 2].set(5.0).at[0, 1, 1, 0].set(5.0)
    ids, conf = _sample_factored(logits, jax.random.PRNGKey(0), 0.0, 4)
    np.testing.assert_array_equal(np.asarray(ids), [[3 + 1 * 4, 2 + 0 * 4]])


def test_generate_horizon():
    from hma_tpu.rollout.maskgit import generate_horizon

    cfg, model, params, tokens, actions, dom = setup_model()
    out = generate_horizon(model, params, tokens, 2, 4, actions, dom,
                           jax.random.PRNGKey(3), maskgit_steps=3)
    assert out.shape == (tokens.shape[0], 2, cfg.S)
    assert int(out.max()) < cfg.image_vocab_size
    assert int(out.min()) >= 0


def test_autoregressive_logits_degenerates_to_teacher_forced():
    """With the prompt covering every frame, autoregressive_logits must be
    bit-identical to teacher_forced_logits (same key schedule, same cache
    fills); with a short prompt it must diverge past the prompt but agree
    on the first generated frame (identical GT context at t=1)."""
    from hma_tpu.rollout.maskgit import autoregressive_logits

    cfg, model, params, tokens, actions, dom = setup_model()
    key = jax.random.PRNGKey(3)
    tf_s, tf_l = teacher_forced_logits(model, params, tokens, actions, dom,
                                       key, maskgit_steps=2)
    ar_s, ar_l = autoregressive_logits(model, params, tokens, cfg.T, actions,
                                       dom, key, maskgit_steps=2)
    np.testing.assert_array_equal(np.asarray(ar_s), np.asarray(tf_s))
    np.testing.assert_array_equal(np.asarray(ar_l), np.asarray(tf_l))

    ar2_s, _ = autoregressive_logits(model, params, tokens, 1, actions, dom,
                                     key, maskgit_steps=2)
    # t=1 conditions on GT frame 0 in both modes -> identical samples
    np.testing.assert_array_equal(np.asarray(ar2_s[:, 0]), np.asarray(tf_s[:, 0]))
    # later frames condition on the model's own samples -> they diverge
    assert not np.array_equal(np.asarray(ar2_s[:, 1:]), np.asarray(tf_s[:, 1:]))


def test_autoregressive_logits_matches_reference_context_semantics():
    """Reference --autoregressive_time context for frame t is
    [GT_0 .. GT_{t-2}, sample_{t-1}] — GT everywhere except the
    immediately previous frame (hma/evaluate.py:181-186; samples never
    accumulate). Greedy sampling is key-free, so the cached engine must
    match a naive full-forward oracle bit-for-bit."""
    from hma_tpu.rollout.maskgit import _maskgit_refine, autoregressive_logits

    cfg, model, params, tokens, actions, dom = setup_model()
    B, T, S = tokens.shape
    n_prompt = 1
    mask_id = cfg.image_vocab_size
    ns = maskgit_mask_counts(2, S)

    def naive_frame(inp_TS, t):
        """Refine frame t with FULL forwards on explicit context inp_TS."""
        unmasked = jnp.zeros((B, S), bool)
        tokens_t = jnp.full((B, S), mask_id, jnp.int32)
        for step in range(2):
            cur = inp_TS.at[:, t].set(tokens_t)
            logits_full, _ = model.apply(params, cur, actions, dom,
                                         method=STMaskGIT.compute_logits)
            nv, fv = cfg.num_factored_vocabs, cfg.factored_vocab_size
            lt = logits_full[:, :, t].reshape(B, nv, fv, cfg.h, cfg.w)
            lt = lt.transpose(0, 3, 4, 1, 2).reshape(B, S, nv, fv)
            samples, confidence = _sample_factored(lt, jax.random.PRNGKey(0),
                                                   0.0, fv)
            prev_unmasked = unmasked
            n = ns[step]
            if n > 0:
                conf = jnp.where(unmasked, jnp.inf, confidence)
                lowest = _mask_lowest(conf, n)
                unmasked = unmasked | ~lowest
                samples = jnp.where(lowest, mask_id, samples)
            else:
                unmasked = jnp.ones_like(unmasked)
            samples = jnp.where(prev_unmasked, tokens_t, samples)
            tokens_t = samples
        return tokens_t

    expected = []
    prev = tokens[:, 0]
    for t in range(1, T):
        inp = jnp.where((jnp.arange(T) < t)[None, :, None], tokens, mask_id)
        if t - 1 >= n_prompt:  # only the immediately previous frame
            inp = inp.at[:, t - 1].set(prev)
        prev = naive_frame(inp, t)
        expected.append(np.asarray(prev))

    got, _ = autoregressive_logits(model, params, tokens, n_prompt, actions,
                                   dom, jax.random.PRNGKey(0),
                                   maskgit_steps=2, unmask_mode="greedy")
    np.testing.assert_array_equal(np.asarray(got),
                                  np.stack(expected, axis=1))
