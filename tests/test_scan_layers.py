"""Scan-over-layers trunk: numerical equality with the loop layout.

The scan trunk (STTransformerDecoder.scan_layers, VERDICT r4 #7's
compile-time lever) must be a pure layout change: stacking a loop
model's per-layer params with stack_layer_params and running the scan
model must reproduce the loop model's outputs exactly, for both
families, with and without remat, and gradients must match too.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hma_tpu.config import DiffusionGenieConfig, GenieConfig
from hma_tpu.models.st_mar import STMAR
from hma_tpu.models.st_mask_git import STMaskGIT
from hma_tpu.models.st_transformer import (
    stack_layer_params,
    unstack_layer_params,
)


def _stacked(params, num_layers):
    P = dict(params["params"])
    P["decoder"] = stack_layer_params(P["decoder"], num_layers)
    return {"params": P}


def _maskgit_cfg(**kw):
    d = dict(num_layers=3, num_heads=2, d_model=32, T=4, S=16,
             image_vocab_size=2**18, num_factored_vocabs=2,
             action_token_size=8, action_network="concat+modulate",
             num_prompt_frames=2, use_actions=True,
             action_domains=["a", "b"], d_actions=[3, 2],
             action_stats=[[[0.0] * 3, [1.0] * 3], [[0.0] * 2, [1.0] * 2]])
    d.update(kw)
    return GenieConfig(**d)


@pytest.mark.parametrize("remat", [False, True])
def test_scan_equals_loop_maskgit(remat):
    cfg = _maskgit_cfg()
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.image_vocab_size,
                                      (2, cfg.T, cfg.S)), jnp.int32)
    actions = jnp.asarray(rng.normal(size=(2, cfg.T, cfg.max_d_action)),
                          jnp.float32)
    dom = jnp.asarray(0, jnp.int32)

    loop = STMaskGIT(cfg, dtype=jnp.float32, remat=remat)
    params = loop.init({"params": jax.random.PRNGKey(0)},
                       tokens, tokens, actions, dom)
    scan = STMaskGIT(cfg, dtype=jnp.float32, remat=remat, scan_layers=True)
    sparams = _stacked(params, cfg.num_layers)

    l_logits, _ = loop.apply(params, tokens, actions, dom,
                             method=STMaskGIT.compute_logits)
    s_logits, _ = scan.apply(sparams, tokens, actions, dom,
                             method=STMaskGIT.compute_logits)
    np.testing.assert_allclose(np.asarray(s_logits), np.asarray(l_logits),
                               rtol=1e-5, atol=1e-5)

    # losses + grads match: the scan layout trains the same model
    def loss(m, p):
        out = m.apply(p, tokens, tokens, actions, dom,
                      rngs={"action_drop": jax.random.PRNGKey(1)})
        return out["loss"]

    gl = jax.grad(lambda p: loss(loop, p))(params)
    gs = jax.grad(lambda p: loss(scan, p))(sparams)
    # compare a trunk leaf (restacked) and a non-trunk leaf
    gl_dec = stack_layer_params(gl["params"]["decoder"], cfg.num_layers)
    np.testing.assert_allclose(
        np.asarray(gs["params"]["decoder"]["layers_scan"]["block"]
                   ["spatial_attn"]["qkv"]["kernel"]),
        np.asarray(gl_dec["layers_scan"]["block"]
                   ["spatial_attn"]["qkv"]["kernel"]),
        rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(gs["params"]["pos_embed_TSC"]),
        np.asarray(gl["params"]["pos_embed_TSC"]), rtol=2e-5, atol=2e-5)


def test_scan_equals_loop_stmar():
    from tests.test_st_mar import tiny_config

    cfg = tiny_config(num_layers=3)
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.normal(size=(2, cfg.T, cfg.h, cfg.h,
                                       cfg.vae_embed_dim)), jnp.float32)
    mask = jnp.zeros((2, cfg.T, cfg.h, cfg.h), jnp.int32).at[:, 1:].set(1)
    actions = jnp.asarray(rng.normal(size=(2, cfg.T, cfg.max_d_action)),
                          jnp.float32)
    dom = jnp.asarray(0, jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0),
            "diffusion": jax.random.PRNGKey(1),
            "action_drop": jax.random.PRNGKey(2)}

    loop = STMAR(cfg, dtype=jnp.float32)
    params = loop.init(rngs, lat, lat, actions, dom, mask)
    scan = STMAR(cfg, dtype=jnp.float32, scan_layers=True)
    sparams = _stacked(params, cfg.num_layers)

    zl, _ = loop.apply(params, lat, actions, dom,
                       method=STMAR.compute_latents)
    zs, _ = scan.apply(sparams, lat, actions, dom,
                       method=STMAR.compute_latents)
    np.testing.assert_allclose(np.asarray(zs), np.asarray(zl),
                               rtol=1e-5, atol=1e-5)


def test_stack_unstack_roundtrip():
    cfg = _maskgit_cfg()
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(0, cfg.image_vocab_size,
                                      (1, cfg.T, cfg.S)), jnp.int32)
    actions = jnp.asarray(rng.normal(size=(1, cfg.T, cfg.max_d_action)),
                          jnp.float32)
    model = STMaskGIT(cfg, dtype=jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        tokens, tokens, actions, jnp.asarray(0))
    dec = params["params"]["decoder"]
    back = unstack_layer_params(stack_layer_params(dec, cfg.num_layers),
                                cfg.num_layers)
    flat1 = jax.tree_util.tree_leaves_with_path(dec)
    flat2 = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat1) == len(flat2)
    for (p1, a), (p2, b) in zip(flat1, flat2):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a scan-shaped init has exactly the stacked structure the converter
    # produces (so scan-trained checkpoints unstack to the loop layout)
    scan = STMaskGIT(cfg, dtype=jnp.float32, scan_layers=True)
    sp = jax.eval_shape(scan.init, {"params": jax.random.PRNGKey(0)},
                        tokens, tokens, actions, jnp.asarray(0))
    got = jax.tree_util.tree_structure(sp["params"]["decoder"])
    want = jax.tree_util.tree_structure(
        jax.tree.map(lambda x: np.asarray(x),
                     stack_layer_params(dec, cfg.num_layers)))
    assert got == want
