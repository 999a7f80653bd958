"""Width-scaling data point: the d488 discrete card's training step on
one real TPU chip.

PROFILE_r3.md argues the d256 flagship is HBM-bound (57.6 FLOP/byte vs
the v5e ridge at ~240) and that "MFU rises with width exactly where this
framework is intended to scale". This probe measures that claim on the
reference's own larger card (magvit_n32_h8_d512_action.json, d_model
488 — the reference's value): same trainer defaults as bench.py (full
remat, Pallas attention kernels, domain-sliced AdamW, donated state),
fewer domains (8) so fp32 master params + sliced moments fit one
v5e-lite chip — width scaling is about the trunk, whose size is
domain-count-independent.

Run: /opt/venv/bin/python experiments/d488_probe.py
Prints one JSON line; appends to /tmp/d488_probe.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_config
    from hma_tpu.config import GenieConfig
    from hma_tpu.models.st_mask_git import STMaskGIT
    from hma_tpu.train.step import (TrainState, domain_stacked_mask,
                                    make_domain_sliced_optimizer,
                                    make_train_step)

    B = 8
    cfg = _flagship_config(num_domains=8)
    card = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "hma_tpu", "configs",
        "magvit_n32_h8_d512_action.json")
    big = GenieConfig.from_pretrained(card)
    for f in ("num_layers", "num_heads", "d_model", "qk_norm", "qkv_bias",
              "proj_bias", "mlp_ratio", "mlp_bias", "mlp_drop", "use_mup"):
        if hasattr(big, f):
            setattr(cfg, f, getattr(big, f))
    cfg.__post_init__()

    model = STMaskGIT(cfg, remat=True)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        rng.integers(0, cfg.image_vocab_size, (B, cfg.T, cfg.S)), jnp.int32)
    actions = jnp.asarray(
        rng.normal(size=(B, cfg.T, cfg.max_d_action)), jnp.float32)
    domain_id = jnp.asarray(0, jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        tokens, tokens, actions, domain_id)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))

    inp = np.asarray(tokens).copy()
    inp[:, 1:, : cfg.S // 2] = cfg.image_vocab_size
    batch = {"input_ids": jnp.asarray(inp), "labels": tokens,
             "action_ids": actions, "domain_id": domain_id}

    # exact bench.py optimizer: domain-sliced AdamW (Adam touches only the
    # active domain's slice of the stacked tables) so the d488 point is
    # apples-to-apples with the d256 flagship number
    import copy

    alt = copy.deepcopy(cfg)
    alt.action_domains = list(cfg.action_domains) + ["__probe__"]
    alt.d_actions = list(cfg.d_actions) + [cfg.d_actions[-1]]
    alt.action_stats = list(cfg.action_stats) + [cfg.action_stats[-1]]
    alt.__post_init__()
    other = jax.eval_shape(
        STMaskGIT(alt).init, {"params": jax.random.PRNGKey(0)},
        tokens, tokens, actions, domain_id)
    stacked_mask = domain_stacked_mask(params, other)
    tx = make_domain_sliced_optimizer(
        1e-4, params_template=params, stacked_mask=stacked_mask,
        num_domains=cfg.num_domains)
    # FLOP-count conventions: `n_params` counts every domain's stacked
    # tables (bench.py's convention); `n_params_active` counts trunk +
    # one active domain's slice — the cross-width-comparable number,
    # since the inactive-domain share differs between the 40-domain d256
    # bench config and this 8-domain probe.
    n_active = sum(
        leaf.size // cfg.num_domains if st else leaf.size
        for leaf, st in zip(jax.tree_util.tree_leaves(params),
                            jax.tree_util.tree_leaves(stacked_mask)))
    step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    params = None

    def force(s):
        return float(jnp.sum(
            s.params["params"]["pos_embed_TSC"].astype(jnp.float32)))

    state, _ = step(state, batch, jax.random.PRNGKey(0))  # compile
    state, _ = step(state, batch, jax.random.PRNGKey(1))  # warm
    force(state)
    t0 = time.perf_counter()
    for i in range(10):
        state, _ = step(state, batch, jax.random.PRNGKey(1))
    force(state)
    dt = (time.perf_counter() - t0) / 10

    tokens_per_step = B * cfg.T * cfg.S
    rec = {
        "metric": "train_step_d488_discrete",
        "s_per_step": round(dt, 4),
        "params_M": round(n_params / 1e6, 1),
        "tokens_per_sec": round(tokens_per_step / dt),
        "params_active_M": round(n_active / 1e6, 1),
        "model_tflops_per_sec": round(
            6 * n_params * tokens_per_step / dt / 1e12, 1),
        "model_tflops_per_sec_active": round(
            6 * n_active * tokens_per_step / dt / 1e12, 1),
        "flop_convention": "6*N*tokens; N=all-domain stacks (legacy) and "
                           "N_active=trunk+one domain slice",
        "batch": B,
        "num_domains": 8,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(rec), flush=True)
    with open("/tmp/d488_probe.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
