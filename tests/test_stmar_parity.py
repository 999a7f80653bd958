"""Logits-level parity: reference torch STMAR vs hma_tpu via import_torch.

Continuous-model counterpart of tests/test_model_parity.py (VERDICT r2
item 3): instantiate the reference STMAR (/root/reference/hma/model/
st_mar.py) with seeded random weights, export the state dict, import via
`import_stmar_state_dict`, and require:

  - `compute_latents` conditioning z matches elementwise
    (st_mar.py:146-197), incl. the muP out_x_proj fold (st_mar.py:60);
  - the DiffLoss `SimpleMLPAdaLN` net forward matches elementwise
    (diffloss.py:151-233) — together with the schedule parity tests in
    tests/test_diffusion.py this pins the diffusion loss and sampler;
  - per-domain action diffusion heads match through the domain-stacked
    net, incl. the padded [eps | v] output layout (st_mar.py:81-100).

RNG-dependent paths (loss's timestep/noise draws, ancestral sampling)
cannot match across frameworks and are covered by the deterministic net
+ schedule parity instead.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from tests.ref_oracle import load_reference_hma, randomize_state_dict, reference_available

from hma_tpu.config import DiffusionGenieConfig
from hma_tpu.models.st_mar import STMAR, patchify
from hma_tpu.utils.import_torch import import_stmar_state_dict

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference tree unavailable")

BASE = dict(
    num_layers=2, num_heads=2, d_model=32, T=4, S=16,
    image_vocab_size=262144, num_factored_vocabs=2,
    use_actions=True, action_network="concat+modulate",
    action_token_size=4,
    action_domains=["alpha", "beta"], d_actions=[6, 4],
    action_stats=[
        [[0.1, -0.2, 0.0, 0.3, -0.1, 0.2], [1.0, 0.5, 2.0, 1.5, 0.8, 1.2]],
        [[0.05, 0.0, -0.3, 0.1], [0.9, 1.1, 0.7, 1.3]],
    ],
    qkv_bias=True, proj_bias=True, qk_norm=False, use_mup=False,
    attn_drop=0.0, mlp_ratio=4.0, mlp_drop=0.0, mlp_bias=False,
    patch_size=2, vae_embed_dim=4, diffloss_d=2, diffloss_w=32,
    num_sampling_steps="10",
    jointly_predict_states=True, jointly_predict_actions=False,
)


def _build_pair(seed=0, **overrides):
    import torch

    ref = load_reference_hma()
    kw = dict(BASE, **overrides)
    tcfg = ref.DiffusionGenieConfig(**kw)
    torch.manual_seed(seed)
    tmodel = ref.STMAR(tcfg)
    if tcfg.use_mup:
        tmodel.set_mup_shapes(rescale_params=False)
    tmodel.eval()
    sd = randomize_state_dict(tmodel, seed=seed)

    jcfg = DiffusionGenieConfig(**kw)
    jmodel = STMAR(config=jcfg, dtype=jnp.float32)
    params = import_stmar_state_dict(sd, jcfg)
    return tmodel, jmodel, params, jcfg


def _latent_inputs(jcfg, seed=1, domain=0):
    rng = np.random.default_rng(seed)
    B, T = 2, jcfg.T
    H = W = jcfg.h  # latent grid (pre-patchify)
    lat = rng.normal(size=(B, T, H, W, jcfg.vae_embed_dim)).astype(np.float32)
    d_act = jcfg.d_actions[domain]
    actions = rng.normal(size=(B, T, d_act)).astype(np.float32)
    actions_padded = np.zeros((B, T, jcfg.max_d_action), np.float32)
    actions_padded[..., :d_act] = actions
    return lat, actions, actions_padded


@pytest.mark.parametrize("use_mup,jpa,domain", [
    (False, False, 0),     # the shipped MAR card architecture
    (False, True, 1),      # action latents + other domain
    (True, False, 0),      # muP out_x_proj fold
])
def test_compute_latents_parity(use_mup, jpa, domain):
    import torch

    tmodel, jmodel, params, jcfg = _build_pair(jointly_predict_actions=jpa,
                                               use_mup=use_mup)
    lat, actions, actions_padded = _latent_inputs(jcfg, domain=domain)
    patches = np.asarray(patchify(jnp.asarray(lat), jcfg.patch_size))

    with torch.no_grad():
        tz, ta = tmodel.compute_latents(
            torch.from_numpy(patches), action_ids=torch.from_numpy(actions),
            domain=[jcfg.action_domains[domain]])
    jz, ja = jmodel.apply(params, jnp.asarray(patches),
                          jnp.asarray(actions_padded),
                          jnp.asarray(domain, jnp.int32),
                          method=STMAR.compute_latents)
    # reference z: (B, C, T, h_, w_); ours: (B, T, S_p, C)
    h_ = jcfg.h // jcfg.patch_size
    tz = tz.numpy().transpose(0, 2, 3, 4, 1).reshape(
        tz.shape[0], jcfg.T, h_ * h_, jcfg.d_model)
    np.testing.assert_allclose(np.asarray(jz), tz, atol=3e-4, rtol=1e-4)
    if jpa:
        np.testing.assert_allclose(np.asarray(ja), ta.numpy(),
                                   atol=3e-4, rtol=1e-4)
    else:
        assert ja is None and ta is None


def test_diffloss_net_parity():
    import torch

    tmodel, jmodel, params, jcfg = _build_pair()
    rng = np.random.default_rng(3)
    N, C, Z = 8, jcfg.vae_embed_dim * jcfg.patch_size**2, jcfg.d_model
    x = rng.normal(size=(N, C)).astype(np.float32)
    t = rng.integers(0, 1000, size=(N,))
    c = rng.normal(size=(N, Z)).astype(np.float32)

    with torch.no_grad():
        tout = tmodel.diffloss.net(torch.from_numpy(x),
                                   torch.from_numpy(t.astype(np.float32)),
                                   torch.from_numpy(c))
    jout = jmodel.apply(params, jnp.asarray(x), jnp.asarray(t, jnp.int32),
                        jnp.asarray(c),
                        method=lambda m, *a: m.diffloss.net(*a))
    np.testing.assert_allclose(np.asarray(jout), tout.numpy(),
                               atol=3e-4, rtol=1e-4)


@pytest.mark.parametrize("domain", [0, 1])
def test_action_diffloss_net_parity(domain):
    """Domain-stacked action head vs the per-domain reference DiffLoss,
    incl. channel padding of the [eps | v] output halves."""
    import torch

    tmodel, jmodel, params, jcfg = _build_pair(jointly_predict_actions=True)
    rng = np.random.default_rng(4)
    d_act, max_da = jcfg.d_actions[domain], jcfg.max_d_action
    N, Z = 8, jcfg.d_model
    x = rng.normal(size=(N, d_act)).astype(np.float32)
    x_padded = np.zeros((N, max_da), np.float32)
    x_padded[:, :d_act] = x
    t = rng.integers(0, 1000, size=(N,))
    c = rng.normal(size=(N, Z)).astype(np.float32)

    name = jcfg.action_domains[domain]
    with torch.no_grad():
        tout = tmodel.action_diff_losses[name].net(
            torch.from_numpy(x), torch.from_numpy(t.astype(np.float32)),
            torch.from_numpy(c)).numpy()
    jout = np.asarray(jmodel.apply(
        params, jnp.asarray(x_padded), jnp.asarray(t, jnp.int32),
        jnp.asarray(c), jnp.asarray(domain, jnp.int32),
        method=lambda m, *a: m.action_diff_loss.net(*a)))
    # padded layout [eps(max) | v(max)] vs reference [eps(d) | v(d)]
    np.testing.assert_allclose(jout[:, :d_act], tout[:, :d_act],
                               atol=3e-4, rtol=1e-4)
    np.testing.assert_allclose(jout[:, max_da:max_da + d_act],
                               tout[:, d_act:], atol=3e-4, rtol=1e-4)
