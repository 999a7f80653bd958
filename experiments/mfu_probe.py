"""Train-step MFU probe on one real TPU chip.

Times the flagship 362M discrete train step under combinations of
{donate, remat policy, batch size, Pallas attention} and prints one JSON
line per variant. Used to pick the bench.py / trainer defaults
(VERDICT round-1 item 3: raise training MFU from 28%).

Run: python experiments/mfu_probe.py [variant ...]
Variants default to all. Results land in /tmp/mfu_probe.jsonl too.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    # name: (remat, policy, donate, B)
    # Historical results (v5e, 2026-08-16): remat "dots" LOST to "full"
    # (0.800 vs 0.667 s/step at B=8) and the Pallas whole-S^2 attention
    # kernel LOST to XLA (0.885 vs 0.800 s/step) and was removed.
    "base_full_nodonate_b8": (True, "full", False, 8),
    "full_donate_b8": (True, "full", True, 8),
    "dots_donate_b8": (True, "dots", True, 8),
    "noremat_donate_b8": (False, "full", True, 8),
    "full_donate_b16": (True, "full", True, 16),
    "full_donate_b32": (True, "full", True, 32),
    # round 3 (reference-exact qk_norm=false card): B=16/32 LOST to B=8
    # (168.4 / 155.5 vs 181.2 TFLOP/s). "attn" saves the
    # checkpoint_name-tagged attention outputs; clean bake-off at B=8 was
    # a wash (179.5 vs 181.2) so "full" stays the trainer default.
    "attn_donate_b8": (True, "attn", True, 8),
    "attn_donate_b16": (True, "attn", True, 16),
}


def run_scan_steps(B=8, n_inner=8):
    """Time n_inner train steps fused in one lax.scan'd jit call — isolates
    per-dispatch (tunnel) overhead from device step time."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_config
    from hma_tpu.models.st_mask_git import STMaskGIT
    from hma_tpu.train.step import TrainState, make_optimizer, make_train_step

    cfg = _flagship_config(num_domains=40)
    model = STMaskGIT(cfg, remat=True, remat_policy="full")
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.image_vocab_size, (B, cfg.T, cfg.S)), jnp.int32)
    actions = jnp.asarray(rng.normal(size=(B, cfg.T, cfg.max_d_action)), jnp.float32)
    domain_id = jnp.asarray(0, jnp.int32)
    inp = np.asarray(tokens).copy()
    inp[:, 1:, : cfg.S // 2] = cfg.image_vocab_size
    batch = {"input_ids": jnp.asarray(inp), "labels": tokens,
             "action_ids": actions, "domain_id": domain_id}
    params = model.init({"params": jax.random.PRNGKey(0)},
                        tokens, tokens, actions, domain_id)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    tx = make_optimizer(1e-4, params_template=params)
    step = make_train_step(model, tx)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(state, batch, rng):
        def body(state, key):
            state, m = step(state, batch, key)
            return state, m["loss"]
        return jax.lax.scan(body, state, jax.random.split(rng, n_inner))

    state = TrainState(params, tx.init(params), jnp.asarray(0))

    def force(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    state, losses = multi_step(state, batch, jax.random.PRNGKey(0))
    force(losses)
    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        state, losses = multi_step(state, batch, jax.random.PRNGKey(i))
    force(losses)
    dt = (time.perf_counter() - t0) / (iters * n_inner)
    toks = B * cfg.T * cfg.S
    rec = {"variant": f"scan{n_inner}_full_donate_b{B}", "step_s": round(dt, 4),
           "tokens_per_sec": round(toks / dt),
           "model_tflops_per_sec": round(6 * n_params * toks / dt / 1e12, 1)}
    print(json.dumps(rec), flush=True)
    with open("/tmp/mfu_probe.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


def run_variant(name, remat, policy, donate, B):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_config
    from hma_tpu.models.st_mask_git import STMaskGIT
    from hma_tpu.train.step import TrainState, make_optimizer, make_train_step

    cfg = _flagship_config(num_domains=40)
    model = STMaskGIT(cfg, remat=remat, remat_policy=policy)

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.image_vocab_size, (B, cfg.T, cfg.S)), jnp.int32)
    actions = jnp.asarray(rng.normal(size=(B, cfg.T, cfg.max_d_action)), jnp.float32)
    domain_id = jnp.asarray(0, jnp.int32)
    inp = np.asarray(tokens).copy()
    inp[:, 1:, : cfg.S // 2] = cfg.image_vocab_size
    batch = {"input_ids": jnp.asarray(inp), "labels": tokens,
             "action_ids": actions, "domain_id": domain_id}

    params = model.init({"params": jax.random.PRNGKey(0)},
                        tokens, tokens, actions, domain_id)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    tx = make_optimizer(1e-4, params_template=params)
    step = make_train_step(model, tx)
    step = jax.jit(step, donate_argnums=(0,)) if donate else jax.jit(step)
    state = TrainState(params, tx.init(params), jnp.asarray(0))

    def force(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    t_c0 = time.perf_counter()
    state, m = step(state, batch, jax.random.PRNGKey(0))
    # force the UPDATED PARAMS, not the metrics: the loss is computed
    # mid-step, so syncing on it stops the clock before the final
    # backward+optimizer finish (measured ~45 ms/step optimistic bias)
    force(state.params["params"]["pos_embed_TSC"])
    compile_s = time.perf_counter() - t_c0

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, jax.random.PRNGKey(i))
    force(state.params["params"]["pos_embed_TSC"])
    dt = (time.perf_counter() - t0) / iters

    toks = B * cfg.T * cfg.S
    rec = {
        "variant": name, "step_s": round(dt, 4),
        "tokens_per_sec": round(toks / dt),
        "model_tflops_per_sec": round(6 * n_params * toks / dt / 1e12, 1),
        "params_M": round(n_params / 1e6, 1),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(rec), flush=True)
    with open("/tmp/mfu_probe.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


def run_sliced(B=8):
    """Flagship step with the DomainSlicedOptimizer (trainer default):
    Adam touches only the active domain's slice of the 339.7M stacked
    params instead of all 40 domains."""
    import copy
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_config
    from hma_tpu.models.st_mask_git import STMaskGIT
    from hma_tpu.train.step import (
        TrainState, domain_stacked_mask, make_domain_sliced_optimizer,
        make_train_step)

    cfg = _flagship_config(num_domains=40)
    model = STMaskGIT(cfg, remat=True, remat_policy="full")
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.image_vocab_size, (B, cfg.T, cfg.S)), jnp.int32)
    actions = jnp.asarray(rng.normal(size=(B, cfg.T, cfg.max_d_action)), jnp.float32)
    domain_id = jnp.asarray(0, jnp.int32)
    inp = np.asarray(tokens).copy()
    inp[:, 1:, : cfg.S // 2] = cfg.image_vocab_size
    batch = {"input_ids": jnp.asarray(inp), "labels": tokens,
             "action_ids": actions, "domain_id": domain_id}
    params = model.init({"params": jax.random.PRNGKey(0)},
                        tokens, tokens, actions, domain_id)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))

    alt = copy.deepcopy(cfg)
    alt.action_domains = list(cfg.action_domains) + ["__probe__"]
    alt.d_actions = list(cfg.d_actions) + [cfg.d_actions[-1]]
    alt.action_stats = list(cfg.action_stats) + [cfg.action_stats[-1]]
    alt.__post_init__()
    other = jax.eval_shape(
        STMaskGIT(alt, remat=True).init, {"params": jax.random.PRNGKey(0)},
        tokens, tokens, actions, domain_id)
    tx = make_domain_sliced_optimizer(
        1e-4, params_template=params,
        stacked_mask=domain_stacked_mask(params, other),
        num_domains=cfg.num_domains)
    step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))
    state = TrainState(params, tx.init(params), jnp.asarray(0))

    def force(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    t_c0 = time.perf_counter()
    state, m = step(state, batch, jax.random.PRNGKey(0))
    force(state.params["params"]["pos_embed_TSC"])
    compile_s = time.perf_counter() - t_c0

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, jax.random.PRNGKey(i))
    force(state.params["params"]["pos_embed_TSC"])
    dt = (time.perf_counter() - t0) / iters
    toks = B * cfg.T * cfg.S
    rec = {"variant": f"sliced_donate_b{B}", "step_s": round(dt, 4),
           "tokens_per_sec": round(toks / dt),
           "model_tflops_per_sec": round(6 * n_params * toks / dt / 1e12, 1),
           "params_M": round(n_params / 1e6, 1),
           "compile_s": round(compile_s, 1)}
    print(json.dumps(rec), flush=True)
    with open("/tmp/mfu_probe.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


def run_decompose(B=8, remat=True, policy="dots"):
    """Time fwd-only, fwd+bwd, and the full step to locate the cost."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_config
    from hma_tpu.models.st_mask_git import STMaskGIT
    from hma_tpu.train.step import TrainState, make_optimizer, make_train_step

    cfg = _flagship_config(num_domains=40)
    model = STMaskGIT(cfg, remat=remat, remat_policy=policy)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.image_vocab_size, (B, cfg.T, cfg.S)), jnp.int32)
    actions = jnp.asarray(rng.normal(size=(B, cfg.T, cfg.max_d_action)), jnp.float32)
    domain_id = jnp.asarray(0, jnp.int32)
    inp = np.asarray(tokens).copy()
    inp[:, 1:, : cfg.S // 2] = cfg.image_vocab_size
    inp = jnp.asarray(inp)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        tokens, tokens, actions, domain_id)

    def loss_fn(params, key):
        out = model.apply(params, inp, tokens, actions, domain_id,
                          deterministic=False,
                          rngs={"dropout": key, "action_drop": key})
        return out["loss"]

    fwd = jax.jit(loss_fn)
    vg = jax.jit(lambda p, k: jax.value_and_grad(loss_fn)(p, k))

    def force(x):
        return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))

    def timed(fn, *args, iters=10):
        force(fn(*args))
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = fn(*args)
        force(o)
        return (time.perf_counter() - t0) / iters

    k = jax.random.PRNGKey(0)
    t_fwd = timed(fwd, params, k)
    t_vg = timed(vg, params, k)
    # optimizer-only: apply a fixed grad repeatedly
    tx = make_optimizer(1e-4, params_template=params)
    _, grads = vg(params, k)
    opt_state = tx.init(params)

    @jax.jit
    def opt_only(params, opt_state, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax
        return optax.apply_updates(params, updates), opt_state

    force(opt_only(params, opt_state, grads)[0]["params"]["pos_embed_TSC"])
    t0 = time.perf_counter()
    p, s = params, opt_state
    for _ in range(10):
        p, s = opt_only(p, s, grads)
    force(p["params"]["pos_embed_TSC"])
    t_opt = (time.perf_counter() - t0) / 10

    rec = {"variant": f"decompose_b{B}_{policy if remat else 'noremat'}",
           "fwd_s": round(t_fwd, 4), "fwd_bwd_s": round(t_vg, 4),
           "opt_s": round(t_opt, 4)}
    print(json.dumps(rec), flush=True)
    with open("/tmp/mfu_probe.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    if sys.argv[1:2] == ["decompose"]:
        run_decompose()
        return
    if sys.argv[1:2] == ["scan"]:
        run_scan_steps(B=int(sys.argv[2]) if len(sys.argv) > 2 else 8)
        return
    if sys.argv[1:2] == ["sliced"]:
        run_sliced(B=int(sys.argv[2]) if len(sys.argv) > 2 else 8)
        return
    names = sys.argv[1:] or list(VARIANTS)
    if len(names) == 1 and names[0] in VARIANTS:
        run_variant(names[0], *VARIANTS[names[0]])
        return
    # parent mode: one subprocess per variant (env flags + fresh imports)
    import subprocess
    for name in names:
        rc = subprocess.run([sys.executable, __file__, name]).returncode
        if rc != 0:
            print(json.dumps({"variant": name, "error": f"rc={rc}"}), flush=True)


if __name__ == "__main__":
    main()
