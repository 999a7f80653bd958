"""Measure the residual-stream layout-transpose fix (VERDICT r3 item 6).

PROFILE_r3.md itemized ~17.9 ms/step of (B,T,S,C)<->(B,S,T,C) transposes
between the spatial and temporal halves of each STBlock plus ~8.6 ms of
copy/staging (~9% of the 290 ms flagship step) and only ESTIMATED the
fix. This probe measures it: the same 362M flagship train step with
temporal_layout="transpose" (baseline) vs "resident" (the residual
stream stays (B,T,S,C); the temporal kernel is fed its internal
(H,T,D,N) layout directly from the qkv tensors — see
models/attention.py temporal_resident).

Run: /opt/venv/bin/python experiments/layout_probe.py
Prints one JSON line per variant; appends to /tmp/layout_probe.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _emit(rec):
    print(json.dumps(rec), flush=True)
    with open("/tmp/layout_probe.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


def run(layout: str, B: int = 8, iters: int = 15):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_config
    from hma_tpu.models.st_mask_git import STMaskGIT
    from hma_tpu.train.step import (TrainState, domain_stacked_mask,
                                    make_domain_sliced_optimizer,
                                    make_train_step)

    cfg = _flagship_config(num_domains=40)
    model = STMaskGIT(cfg, remat=True, temporal_layout=layout)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        rng.integers(0, cfg.image_vocab_size, (B, cfg.T, cfg.S)), jnp.int32)
    actions = jnp.asarray(rng.normal(size=(B, cfg.T, cfg.max_d_action)),
                          jnp.float32)
    dom = jnp.asarray(0, jnp.int32)
    inp = np.asarray(tokens).copy()
    inp[:, 1:, : cfg.S // 2] = cfg.image_vocab_size
    batch = {"input_ids": jnp.asarray(inp), "labels": tokens,
             "action_ids": actions, "domain_id": dom}
    params = model.init({"params": jax.random.PRNGKey(0)},
                        batch["input_ids"], tokens, actions, dom)

    import copy

    alt = copy.deepcopy(cfg)
    alt.action_domains = list(cfg.action_domains) + ["__probe__"]
    alt.d_actions = list(cfg.d_actions) + [cfg.d_actions[-1]]
    alt.action_stats = list(cfg.action_stats) + [cfg.action_stats[-1]]
    alt.__post_init__()
    other = jax.eval_shape(
        STMaskGIT(alt).init, {"params": jax.random.PRNGKey(0)},
        batch["input_ids"], tokens, actions, dom)
    tx = make_domain_sliced_optimizer(
        1e-4, params_template=params,
        stacked_mask=domain_stacked_mask(params, other),
        num_domains=cfg.num_domains)
    step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    params = None

    def force(s):
        return float(jnp.sum(
            s.params["params"]["pos_embed_TSC"].astype(jnp.float32)))

    t0 = time.perf_counter()
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    force(state)
    compile_s = time.perf_counter() - t0
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    force(state)
    t0 = time.perf_counter()
    for i in range(iters):
        state, _ = step(state, batch, jax.random.PRNGKey(1))
    force(state)
    dt = (time.perf_counter() - t0) / iters
    _emit({"variant": f"train_step_{layout}", "s_per_step": round(dt, 4),
           "batch": B, "compile_s": round(compile_s, 1)})
    del state, step, tx
    jax.clear_caches()
    return dt


if __name__ == "__main__":
    which = sys.argv[1:] or ["transpose", "resident"]
    results = {}
    for layout in which:
        results[layout] = run(layout)
    if len(results) == 2:
        a, b = results["transpose"], results["resident"]
        _emit({"variant": "layout_delta",
               "transpose_s": round(a, 4), "resident_s": round(b, 4),
               "saving_ms": round((a - b) * 1000, 1),
               "saving_pct": round((1 - b / a) * 100, 2)})
