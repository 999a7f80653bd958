"""Reference-checkpoint importer: synthesize a torch-shaped state dict,
import it, and verify the Flax model runs with matching structure."""

import jax
import jax.numpy as jnp
import numpy as np

from hma_tpu.config import GenieConfig
from hma_tpu.models.st_mask_git import STMaskGIT
from hma_tpu.utils.import_torch import import_stmaskgit_state_dict


def synth_state_dict(cfg, rng):
    """State dict with the reference's names/shapes (torch layout)."""
    d = cfg.d_model
    sd = {}
    for i in range(cfg.num_factored_vocabs):
        sd[f"token_embed.factored_embeds.{i}.weight"] = rng.normal(
            size=(cfg.factored_vocab_size, d))
    sd["token_embed.mask_token_embed"] = rng.normal(size=(1, d))
    sd["pos_embed_TSC"] = rng.normal(
        size=(1, cfg.T, cfg.S + cfg.action_token_size, d))
    sd["action_mask_tokens"] = rng.normal(size=(1, cfg.T, 1, d))
    sd["out_x_proj.weight"] = rng.normal(
        size=(cfg.factored_vocab_size * cfg.num_factored_vocabs, d))
    sd["out_x_proj.bias"] = rng.normal(
        size=(cfg.factored_vocab_size * cfg.num_factored_vocabs,))
    hidden = int(d * cfg.mlp_ratio)
    head_dim = d // cfg.num_heads
    for i in range(cfg.num_layers):
        p = f"decoder.layers.{i}"
        for attn in ("spatial_attn", "temporal_attn"):
            sd[f"{p}.{attn}.qkv.weight"] = rng.normal(size=(3 * d, d))
            sd[f"{p}.{attn}.proj.weight"] = rng.normal(size=(d, d))
            sd[f"{p}.{attn}.proj.bias"] = rng.normal(size=(d,))
            sd[f"{p}.{attn}.norm.weight"] = rng.normal(size=(head_dim,))
            sd[f"{p}.{attn}.norm.bias"] = rng.normal(size=(head_dim,))
        sd[f"{p}.mlp.fc1.weight"] = rng.normal(size=(hidden, d))
        sd[f"{p}.mlp.fc1.bias"] = rng.normal(size=(hidden,))
        sd[f"{p}.mlp.fc2.weight"] = rng.normal(size=(d, hidden))
        sd[f"{p}.mlp.fc2.bias"] = rng.normal(size=(d,))
        for dom in cfg.action_domains:
            sd[f"{p}.action_projectors.{dom}.adaLN_modulation.0.weight"] = rng.normal(size=(d, d))
            sd[f"{p}.action_projectors.{dom}.adaLN_modulation.0.bias"] = rng.normal(size=(d,))
            sd[f"{p}.action_projectors.{dom}.adaLN_modulation.2.weight"] = rng.normal(size=(2 * d, d))
            sd[f"{p}.action_projectors.{dom}.adaLN_modulation.2.bias"] = rng.normal(size=(2 * d,))
            sd[f"{p}.action_projectors.{dom}.linear_out.weight"] = rng.normal(size=(d, d))
            sd[f"{p}.action_projectors.{dom}.linear_out.bias"] = rng.normal(size=(d,))
    for dom, da in zip(cfg.action_domains, cfg.d_actions):
        sd[f"action_mlp.{dom}.model.0.weight"] = rng.normal(size=(d, da))
        sd[f"action_mlp.{dom}.model.0.bias"] = rng.normal(size=(d,))
        sd[f"action_mlp.{dom}.model.1.weight"] = rng.normal(size=(d,))
        sd[f"action_mlp.{dom}.model.1.bias"] = rng.normal(size=(d,))
        sd[f"action_mlp.{dom}.model.3.weight"] = rng.normal(size=(d, d))
        sd[f"action_mlp.{dom}.model.3.bias"] = rng.normal(size=(d,))
    return sd


def test_import_reference_state_dict():
    cfg = GenieConfig(num_layers=2, num_heads=2, d_model=32, T=4, S=16,
                      image_vocab_size=2**18, num_factored_vocabs=2,
                      action_token_size=8, action_network="concat+modulate",
                      use_actions=True, action_domains=["a", "b"],
                      d_actions=[4, 6],
                      action_stats=[[[0.0, 0.0], [1.0, 1.0]],
                                    [[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]])
    rng = np.random.default_rng(0)
    sd = synth_state_dict(cfg, rng)
    imported = import_stmaskgit_state_dict(sd, cfg)

    model = STMaskGIT(cfg, dtype=jnp.float32)
    tokens = jnp.asarray(rng.integers(0, cfg.image_vocab_size, (2, cfg.T, cfg.S)), jnp.int32)
    actions = jnp.asarray(rng.normal(size=(2, cfg.T, cfg.max_d_action)), jnp.float32)
    ref_params = model.init({"params": jax.random.PRNGKey(0)},
                            tokens, tokens, actions, jnp.asarray(0))

    # identical tree structure and shapes
    ref_flat = jax.tree_util.tree_flatten_with_path(ref_params["params"])[0]
    imp_flat = {jax.tree_util.keystr(kp): v for kp, v in
                jax.tree_util.tree_flatten_with_path(imported["params"])[0]}
    for kp, v in ref_flat:
        k = jax.tree_util.keystr(kp)
        assert k in imp_flat, f"missing imported param {k}"
        assert imp_flat[k].shape == v.shape, (k, imp_flat[k].shape, v.shape)
    assert len(imp_flat) == len(ref_flat)

    # and the model runs with the imported params
    logits, _ = model.apply(imported, tokens, actions, jnp.asarray(0),
                            method=STMaskGIT.compute_logits)
    assert np.isfinite(np.asarray(logits)).all()

    # weight semantics spot check: torch Linear y = W x; ours y = x @ kernel
    q = imported["params"]["decoder"]["layers_0"]["spatial_attn"]["qkv"]["kernel"]
    np.testing.assert_allclose(
        q, np.asarray(sd["decoder.layers.0.spatial_attn.qkv.weight"]).T, rtol=1e-6)
    # stems are padded to max_d_action on the input dim
    fc1 = imported["params"]["action_stem"]["fc1"]["kernel"]
    assert fc1.shape == (2, cfg.max_d_action, cfg.d_model)
    np.testing.assert_array_equal(fc1[0, 4:], 0)  # domain a padded rows
