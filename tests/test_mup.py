"""muP validation (VERDICT r2 item 8): mask classification, coordinate
check, and LR-transfer smoke.

The reference relies on the mup package (MuReadout + MuAdamW,
hma/train_multi.py:896-922, st_mask_git.py:755-789); hma_tpu re-derives
it as a constant readout fold + per-partition Adam scaling
(train/step.py). These tests pin that re-derivation:

  - `mup_matrix_mask` with base shapes must classify exactly like
    mup.set_base_shapes infshapes (>= 2 width-dependent dims);
  - coordinate check: across widths, muP keeps the readout-input scale
    and the logit scale from growing with width after training steps;
  - LR transfer: the same LR trains both a narrow and a wide model
    (loss decreases for both under MuAdamW scaling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hma_tpu.config import GenieConfig
from hma_tpu.models.st_mask_git import STMaskGIT
from hma_tpu.train.step import make_optimizer, mup_matrix_mask


def _cfg(d_model, **kw):
    base = dict(num_layers=2, num_heads=2, d_model=d_model, T=2, S=4,
                image_vocab_size=4096, num_factored_vocabs=2,
                use_actions=True, action_network="concat+modulate",
                action_token_size=2, use_mup=True, qk_norm=False,
                action_domains=["a"], d_actions=[3],
                action_stats=[[[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]])
    base.update(kw)
    return GenieConfig(**base)


def _init(cfg, seed=0):
    model = STMaskGIT(config=cfg, dtype=jnp.float32)
    B, T, S = 2, cfg.T, cfg.S
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, cfg.image_vocab_size, (B, T, S))
    tokens[:, 1:, ::2] = cfg.mask_token_id
    labels = rng.integers(0, cfg.image_vocab_size, (B, T, S))
    actions = rng.normal(size=(B, T, 3)).astype(np.float32)
    batch = (jnp.asarray(tokens, jnp.int32), jnp.asarray(labels, jnp.int32),
             jnp.asarray(actions), jnp.asarray(0, jnp.int32))
    params = model.init(jax.random.PRNGKey(seed), *batch)
    return model, params, batch


def _base_shapes(cfg, batch, seed=0):
    head_dim = cfg.d_model // cfg.num_heads
    import dataclasses

    base_cfg = dataclasses.replace(
        cfg, d_model=cfg.num_heads * max(head_dim // 2, 1))
    base_model = STMaskGIT(config=base_cfg, dtype=jnp.float32)
    return jax.eval_shape(base_model.init, jax.random.PRNGKey(seed), *batch)


def test_matrix_mask_infshape_classification():
    cfg = _cfg(32)
    _, params, batch = _init(cfg)
    mask = mup_matrix_mask(params, _base_shapes(cfg, batch))
    flat = {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_flatten_with_path(mask)[0]}

    def get(substr):
        hits = [v for k, v in flat.items() if substr in k]
        assert hits, substr
        return hits

    # matrix-like: both dims grow with width
    assert all(get("layers_0']['spatial_attn']['qkv']['kernel"))
    assert all(get("layers_0']['mlp']['fc1']['kernel"))
    assert all(get("action_stem']['fc2']['kernel"))
    assert all(get("action_projector']['ada_fc1']['kernel"))
    # vector-like: readout to the FIXED factored vocab, embeddings,
    # pos embeds, mask tokens, stems from fixed action dims, all biases/LN
    assert not any(get("out_x_proj']['kernel"))
    assert not any(get("pos_embed_TSC"))
    assert not any(get("action_mask_tokens"))
    assert not any(get("factored_embeds_0"))
    assert not any(get("action_stem']['fc1']['kernel"))
    assert not any(get("bias"))
    assert not any(get("['scale"))


def _train(cfg, steps=6, lr=1e-2, seed=0):
    model, params, batch = _init(cfg, seed)
    width_mult = cfg.d_model / 16.0  # treat d=16 as the tuned base width
    tx = make_optimizer(lr, weight_decay=0.0, params_template=params,
                        mup_width_mult=width_mult,
                        mup_base_shapes=_base_shapes(cfg, batch, seed))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply(p, *batch)
            return out["loss"]
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt_state2 = tx.update(g, opt_state, params)
        return optax.apply_updates(params, up), opt_state2, loss

    losses = []
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))

    tokens, _, actions, dom = batch
    logits, _ = model.apply(params, tokens, actions, dom,
                            method=STMaskGIT.compute_logits)
    return losses, float(jnp.mean(jnp.abs(logits)))


def test_mup_coordinate_check_logit_scale():
    """After training steps, logit scale must not grow with width.

    With muP (readout fold + MuAdamW) the readout input is O(sqrt(d))
    per-coordinate... net logit magnitude stays O(1) in width; a broken
    mask or a missing fold shows up as roughly linear growth."""
    scales = {}
    for d in (16, 32, 64):
        _, scales[d] = _train(_cfg(d))
    # allow noise, forbid the ~4x growth a broken rule produces over 16->64
    assert scales[64] < 3.0 * scales[16], scales
    assert np.isfinite(list(scales.values())).all()


def test_mup_lr_transfer_smoke():
    """One LR trains all widths: loss decreases at every width with the
    same peak LR under the MuAdamW rule."""
    for d in (16, 32, 64):
        losses, _ = _train(_cfg(d), steps=8, lr=2e-2)
        assert losses[-1] < losses[0], (d, losses)
        assert np.isfinite(losses).all(), (d, losses)
