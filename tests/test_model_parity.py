"""Logits-level parity: reference torch STMaskGIT vs hma_tpu via import_torch.

The strongest possible offline check of the checkpoint-import path
(VERDICT r2 item 1): instantiate the *reference* torch model
(/root/reference/hma/model/st_mask_git.py) with seeded random weights,
export its state dict, import it through
`hma_tpu.utils.import_torch.import_stmaskgit_state_dict`, and require:

  - `compute_logits` matches elementwise (fp32, atol ~1e-4)
    (reference: st_mask_git.py:632-686);
  - training `forward` loss/acc match (st_mask_git.py:688-735);
  - action readout matches incl. the muP readout fold
    (st_mask_git.py:772-789);
  - greedy `maskgit_generate` token ids match EXACTLY against our
    KV-cached rollout (st_mask_git.py:337-467).

Covered axes: qk_norm on/off, use_mup on/off, all three action networks
("concat+modulate", "mlp", and "cross_attention" via
cross_attention_compat="reference" — the quirk-exact emulation of the
reference's head-mixing BasicCrossAttention, attention.py:111-132),
jointly_predict_actions on/off, both domains of a 2-domain setup, and
the no-action path. The cross_attention rollout parity uses the
full-recompute path (rollout.maskgit.generate_tokens_full) because the
reference quirk mixes timesteps and cannot be KV-cached.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.ref_oracle import load_reference_hma, randomize_state_dict, reference_available

from hma_tpu.config import GenieConfig
from hma_tpu.models.st_mask_git import STMaskGIT
from hma_tpu.rollout import maskgit as rollout
from hma_tpu.utils.import_torch import import_stmaskgit_state_dict

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference tree unavailable")

# Tiny but structurally complete: 2 layers, 2 heads, factored 64x64 vocab,
# two action domains of different widths (pad path exercised).
BASE = dict(
    # image_vocab_size must be 512**2: the reference's loss hardcodes the
    # factorize_labels defaults (512-sized factors, st_mask_git.py:617).
    num_layers=2, num_heads=2, d_model=32, T=4, S=16,
    image_vocab_size=262144, num_factored_vocabs=2,
    use_actions=True, action_network="concat+modulate",
    action_token_size=4,
    action_domains=["alpha", "beta"], d_actions=[6, 4],
    action_stats=[
        [[0.1, -0.2, 0.0, 0.3, -0.1, 0.2], [1.0, 0.5, 2.0, 1.5, 0.8, 1.2]],
        [[0.05, 0.0, -0.3, 0.1], [0.9, 1.1, 0.7, 1.3]],
    ],
    qkv_bias=False, proj_bias=True, qk_norm=False, use_mup=False,
    attn_drop=0.0, mlp_ratio=4.0, mlp_drop=0.0, mlp_bias=True,
    jointly_predict_states=True, jointly_predict_actions=False,
)


def _build_pair(seed=0, **overrides):
    """Same config -> (torch model w/ random weights, flax model, params)."""
    import torch

    ref = load_reference_hma()
    kw = dict(BASE, **overrides)
    # hma_tpu-only fields the reference config doesn't know
    tkw = {k: v for k, v in kw.items() if k != "cross_attention_compat"}
    tcfg = ref.GenieConfig(**tkw)
    torch.manual_seed(seed)
    tmodel = ref.STMaskGIT(tcfg)
    if tcfg.use_mup:
        tmodel.set_mup_shapes(rescale_params=False)
    tmodel.eval()
    sd = randomize_state_dict(tmodel, seed=seed)

    jcfg = GenieConfig(**kw)
    jmodel = STMaskGIT(config=jcfg, dtype=jnp.float32)
    params = import_stmaskgit_state_dict(sd, jcfg)
    return tmodel, jmodel, params, jcfg


def _inputs(jcfg, seed=1, mask_frac=0.5, domain=0):
    rng = np.random.default_rng(seed)
    B, T, S = 2, jcfg.T, jcfg.S
    tokens = rng.integers(0, jcfg.image_vocab_size, size=(B, T, S))
    labels = tokens.copy()
    # mask a fraction of frames 1.. (frame 0 always unmasked)
    m = rng.random((B, T, S)) < mask_frac
    m[:, 0] = False
    tokens = np.where(m, jcfg.mask_token_id, tokens)
    if not jcfg.d_actions:
        return tokens.astype(np.int64), labels.astype(np.int64), None, None
    d_act = jcfg.d_actions[domain]
    actions = rng.normal(size=(B, T, d_act)).astype(np.float32)
    actions_padded = np.zeros((B, T, jcfg.max_d_action), np.float32)
    actions_padded[..., :d_act] = actions
    return tokens.astype(np.int64), labels.astype(np.int64), actions, actions_padded


def _torch_logits(tmodel, tokens, actions, domain_name, action_mask=None):
    import torch

    h = tmodel.h
    x_THW = torch.from_numpy(tokens).reshape(tokens.shape[0], tokens.shape[1], h, h)
    act = torch.from_numpy(actions) if actions is not None else None
    tmodel.relevant_action_mask = (
        torch.from_numpy(action_mask) if action_mask is not None else None)
    with torch.no_grad():
        logits, act_out = tmodel.compute_logits(
            x_THW, action_ids=act, domain=[domain_name] if domain_name else None)
    return (logits.numpy() if logits is not None else None,
            act_out.numpy() if act_out is not None else None)


def _flax_logits(jmodel, params, jcfg, tokens, actions_padded, domain,
                 action_mask=None):
    logits, act_out = jmodel.apply(
        params, jnp.asarray(tokens, jnp.int32),
        jnp.asarray(actions_padded) if actions_padded is not None else None,
        jnp.asarray(domain, jnp.int32) if domain is not None else None,
        jnp.asarray(action_mask) if action_mask is not None else None,
        method=STMaskGIT.compute_logits)
    return (np.asarray(logits) if logits is not None else None,
            np.asarray(act_out) if act_out is not None else None)


@pytest.mark.parametrize("qk_norm,use_mup,action_network,domain", [
    (False, False, "concat+modulate", 0),   # the shipped card architecture
    (False, False, "concat+modulate", 1),   # other domain + width padding
    (True, False, "concat+modulate", 0),    # qk-LN path
    (False, True, "concat+modulate", 0),    # muP readout fold
    (False, False, "mlp", 0),               # additive injection, no concat
    (False, False, "cross_attention", 0),   # quirk-exact head-mix emulation
    (False, False, "cross_attention", 1),   # mispairing across domains
    (True, False, "cross_attention", 0),    # with trunk qk-LN too
])
def test_compute_logits_parity(qk_norm, use_mup, action_network, domain):
    compat = ({"cross_attention_compat": "reference"}
              if action_network == "cross_attention" else {})
    tmodel, jmodel, params, jcfg = _build_pair(
        qk_norm=qk_norm, use_mup=use_mup, action_network=action_network,
        **compat)
    tokens, _, actions, actions_padded = _inputs(jcfg, domain=domain)
    tl, _ = _torch_logits(tmodel, tokens, actions, jcfg.action_domains[domain])
    jl, _ = _flax_logits(jmodel, params, jcfg, tokens, actions_padded, domain)
    np.testing.assert_allclose(jl, tl, atol=2e-4, rtol=1e-4)


def test_compute_logits_parity_no_actions():
    kw = dict(use_actions=False, action_domains=None, d_actions=None,
              action_stats=None)
    tmodel, jmodel, params, jcfg = _build_pair(**kw)
    tokens, _, _, _ = _inputs(jcfg)
    tl, _ = _torch_logits(tmodel, tokens, None, None)
    jl, _ = _flax_logits(jmodel, params, jcfg, tokens, None, None)
    np.testing.assert_allclose(jl, tl, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("use_mup", [False, True])
def test_action_prediction_parity(use_mup):
    """jointly_predict_actions: concat masking + pooled readout (+ muP fold)."""
    tmodel, jmodel, params, jcfg = _build_pair(
        jointly_predict_actions=True, use_mup=use_mup)
    tokens, _, actions, actions_padded = _inputs(jcfg)
    B, T = tokens.shape[0], jcfg.T
    rng = np.random.default_rng(7)
    action_mask = (rng.random((B, T, 1, 1)) < 0.5).astype(np.float32)

    tl, ta = _torch_logits(tmodel, tokens, actions, "alpha", action_mask)
    jl, ja = _flax_logits(jmodel, params, jcfg, tokens, actions_padded, 0,
                          action_mask)
    np.testing.assert_allclose(jl, tl, atol=2e-4, rtol=1e-4)
    d_act = jcfg.d_actions[0]
    np.testing.assert_allclose(ja[..., :d_act], ta, atol=2e-4, rtol=1e-4)
    # padded action dims must read zero (weights are zero-padded on import)
    np.testing.assert_allclose(ja[..., d_act:], 0.0, atol=1e-6)


@pytest.mark.parametrize("qk_norm", [False, True])
def test_forward_loss_acc_parity(qk_norm):
    import torch

    tmodel, jmodel, params, jcfg = _build_pair(qk_norm=qk_norm)
    tokens, labels, actions, actions_padded = _inputs(jcfg)
    B = tokens.shape[0]

    with torch.no_grad():
        out = tmodel.forward(
            torch.from_numpy(tokens.reshape(B, -1)),
            torch.from_numpy(labels.reshape(B, -1)),
            action_ids=torch.from_numpy(actions), domain=["alpha"])
    jout = jmodel.apply(params, jnp.asarray(tokens, jnp.int32),
                        jnp.asarray(labels, jnp.int32),
                        jnp.asarray(actions_padded), jnp.asarray(0, jnp.int32))
    np.testing.assert_allclose(float(jout["loss"]), float(out.loss),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(float(jout["acc"]), float(out.acc),
                               atol=1e-6)


@pytest.mark.parametrize("qk_norm", [False, True])
def test_maskgit_generate_greedy_token_parity(qk_norm):
    """Greedy (temperature=0) MaskGIT decode: tokens must match EXACTLY.

    Reference recomputes the full T-frame stack per refinement step
    (st_mask_git.py:382-395); ours runs single-frame forwards against the
    temporal KV cache. Spatial attention is per-frame and temporal
    attention causal, so the two must agree token-for-token.
    """
    import torch

    tmodel, jmodel, params, jcfg = _build_pair(qk_norm=qk_norm)
    tokens, _, actions, actions_padded = _inputs(jcfg, mask_frac=0.0)
    B, T, S = tokens.shape
    out_t, steps = 2, 3

    prompt = tokens.copy()
    prompt[:, out_t:] = jcfg.mask_token_id
    with torch.no_grad():
        samples_t, logits_t, _ = tmodel.maskgit_generate(
            torch.from_numpy(prompt.reshape(B, T, jcfg.h, jcfg.w)).clone(),
            out_t=out_t, maskgit_steps=steps, temperature=0.0,
            unmask_mode="greedy", action_ids=torch.from_numpy(actions),
            domain=["alpha"])

    # ours: prefill the cache with frames < out_t, then refine frame out_t
    dom = jnp.asarray(0, jnp.int32)
    acts = jnp.asarray(actions_padded)
    k_cache, v_cache = jmodel.apply(params, B, method=STMaskGIT.init_cache)
    k_cache, v_cache = rollout._prefill(
        jmodel, params, jnp.asarray(prompt, jnp.int32), k_cache, v_cache,
        acts, dom, out_t)
    masked = jnp.full((B, S), jcfg.mask_token_id, jnp.int32)
    tokens_j, logits_j = rollout._maskgit_refine(
        jmodel, params, masked, jnp.asarray(out_t, jnp.int32),
        k_cache, v_cache, acts, dom, jax.random.PRNGKey(0),
        maskgit_steps=steps, temperature=0.0, unmask_mode="greedy")

    np.testing.assert_array_equal(
        np.asarray(tokens_j).reshape(B, jcfg.h, jcfg.w), samples_t.numpy())
    # original (first-pass) logits: ref (B, fv, nv, H, W) vs ours (B,S,nv,fv)
    lj = np.asarray(logits_j).reshape(B, jcfg.h, jcfg.w, jcfg.num_factored_vocabs,
                                      jcfg.factored_vocab_size)
    lt = logits_t.numpy().transpose(0, 3, 4, 2, 1)
    np.testing.assert_allclose(lj, lt, atol=2e-4, rtol=1e-4)


def test_forward_loss_acc_parity_cross_attention():
    """Training forward parity for the quirk-exact cross_attention mode."""
    import torch

    tmodel, jmodel, params, jcfg = _build_pair(
        action_network="cross_attention", cross_attention_compat="reference")
    tokens, labels, actions, actions_padded = _inputs(jcfg)
    B = tokens.shape[0]

    with torch.no_grad():
        out = tmodel.forward(
            torch.from_numpy(tokens.reshape(B, -1)),
            torch.from_numpy(labels.reshape(B, -1)),
            action_ids=torch.from_numpy(actions), domain=["alpha"])
    jout = jmodel.apply(params, jnp.asarray(tokens, jnp.int32),
                        jnp.asarray(labels, jnp.int32),
                        jnp.asarray(actions_padded), jnp.asarray(0, jnp.int32))
    np.testing.assert_allclose(float(jout["loss"]), float(out.loss),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(float(jout["acc"]), float(out.acc),
                               atol=1e-6)


def test_maskgit_generate_greedy_token_parity_cross_attention():
    """Greedy MaskGIT decode parity for cross_attention_compat="reference".

    The quirk mixes timesteps (the scrambled (H, T, D) -> (T, C) reshape),
    so the KV-cached path refuses it; the full-recompute rollout
    (generate_tokens_full, the reference's own algorithm) must match the
    torch maskgit_generate token-for-token."""
    import torch

    tmodel, jmodel, params, jcfg = _build_pair(
        action_network="cross_attention", cross_attention_compat="reference")
    tokens, _, actions, actions_padded = _inputs(jcfg, mask_frac=0.0)
    B, T, S = tokens.shape
    out_t, steps = 2, 3

    prompt = tokens.copy()
    prompt[:, out_t:] = jcfg.mask_token_id
    with torch.no_grad():
        samples_t, _, _ = tmodel.maskgit_generate(
            torch.from_numpy(prompt.reshape(B, T, jcfg.h, jcfg.w)).clone(),
            out_t=out_t, maskgit_steps=steps, temperature=0.0,
            unmask_mode="greedy", action_ids=torch.from_numpy(actions),
            domain=["alpha"])

    cur = rollout._refine_frame_full(
        jmodel, params, jnp.asarray(prompt, jnp.int32),
        jnp.asarray(out_t, jnp.int32), jnp.asarray(actions_padded),
        jnp.asarray(0, jnp.int32), jax.random.PRNGKey(0),
        maskgit_steps=steps, temperature=0.0, unmask_mode="greedy")
    np.testing.assert_array_equal(
        np.asarray(cur[:, out_t]).reshape(B, jcfg.h, jcfg.w),
        samples_t.numpy())
