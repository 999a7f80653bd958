"""Continuous-flagship (STMAR, d512 card ~1B params incl. 40-domain
tables) throughput probe on one real TPU chip.

Measures (a) the training step (unified make_train_step, remat, donate)
and (b) the KV-cached MAR rollout (maskgit_steps x diffusion sampling per
frame) — the second model family bench.py's discrete headline doesn't
cover. Writes one JSON line per measurement to /tmp/mar_probe.jsonl.

Run: python experiments/mar_probe.py [train|rollout]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _config(num_domains=40):
    import json as _json

    from hma_tpu.config import DiffusionGenieConfig

    card = _json.load(open(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "hma_tpu/configs/mar_n32_h8_d512_action.json")))
    card.pop("Diffusion", None)
    rng = np.random.default_rng(0)
    domains = [f"domain_{i}" for i in range(num_domains)]
    d_actions, stats = [], []
    for _ in range(num_domains):
        base = int(rng.integers(2, 8))
        stride = int(rng.integers(1, 4))
        d_actions.append(base * stride)
        stats.append([rng.normal(size=base).tolist(),
                      (np.abs(rng.normal(size=base)) + 0.5).tolist()])
    return DiffusionGenieConfig(**card, action_domains=domains,
                                d_actions=d_actions, action_stats=stats)


def _data(cfg, B):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    h = cfg.h
    lat = jnp.asarray(rng.normal(size=(B, cfg.T, h, h, cfg.vae_embed_dim)),
                      jnp.float32)
    mask = np.asarray(rng.uniform(size=(B, cfg.T, h, h)) < 0.7, np.int32)
    mask[:, 0] = 0
    actions = jnp.asarray(rng.normal(size=(B, cfg.T, cfg.max_d_action)),
                          jnp.float32)
    return lat, jnp.asarray(mask), actions, jnp.asarray(0, jnp.int32)


def _force(x):
    import jax
    import jax.numpy as jnp

    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def _emit(rec):
    print(json.dumps(rec), flush=True)
    with open("/tmp/mar_probe.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


def run_train(B=8, num_domains=8):
    # num_domains=8 on one chip: the full 40-domain card is ~1.5B params
    # (32 layers x 40 domains of adaLN tables) -> ~18 GB of fp32
    # params+Adam, beyond one v5e's 16 GB HBM. The 40-domain config is a
    # multi-chip (fsdp) training config — see __graft_entry__.
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hma_tpu.models.st_mar import STMAR
    from hma_tpu.train.step import TrainState, make_optimizer, make_train_step

    cfg = _config(num_domains)
    model = STMAR(cfg, remat=True)
    lat, mask, actions, dom = _data(cfg, B)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "action_drop": jax.random.PRNGKey(2)}, lat, lat, actions, dom, mask)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    tx = make_optimizer(1e-4, params_template=params)
    step = jax.jit(make_train_step(model, tx, continuous=True),
                   donate_argnums=(0,))
    batch = {"input_ids": lat, "labels": lat, "action_ids": actions,
             "domain_id": dom, "masked_tokens_indicator": mask}
    state = TrainState(params, tx.init(params), jnp.asarray(0))

    t0 = time.perf_counter()
    state, m = step(state, batch, jax.random.PRNGKey(0))
    _force(state.params["params"]["pos_embed_TSC"])
    compile_s = time.perf_counter() - t0

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, jax.random.PRNGKey(i))
    _force(state.params["params"]["pos_embed_TSC"])
    dt = (time.perf_counter() - t0) / iters
    toks = B * cfg.T * (cfg.h // cfg.patch_size) ** 2
    _emit({"variant": f"mar_train_b{B}_dom{num_domains}", "step_s": round(dt, 4),
           "params_M": round(n_params / 1e6, 1),
           "tokens_per_sec": round(toks / dt),
           "model_tflops_per_sec": round(6 * n_params * toks / dt / 1e12, 1),
           "compile_s": round(compile_s, 1)})


def run_train1b(B=8, remat=True):
    """The FULL 40-domain d512 card (~1.5B params) training on ONE chip —
    the configuration run_train's docstring calls multi-chip-only under
    fp32 Adam state. Two features combine to make it fit a 16 GB chip:
      - bf16 stochastic-rounded moments (train/lowp.py): persistent
        state 12 -> 8 B/param;
      - sliced gradients (make_train_step(stacked_mask=...)): the
        backward computes one domain row instead of a full-size fp32
        zero tree over the stacked tables (~6 GB transient at this
        card — with full grads the step needs 22.7 GB and OOMs even
        before activations).
    remat=True by default here (memory headroom first; the remat=False
    speed win from bench.py's 8-domain config is re-measured at this
    scale via run_train1b(remat=False))."""
    import copy

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hma_tpu.models.st_mar import STMAR
    from hma_tpu.train.step import (
        TrainState,
        domain_stacked_mask,
        make_domain_sliced_optimizer,
        make_train_step,
    )

    cfg = _config(40)
    model = STMAR(cfg, remat=remat)
    lat, mask, actions, dom = _data(cfg, B)
    init_rngs = {"params": jax.random.PRNGKey(0),
                 "diffusion": jax.random.PRNGKey(1),
                 "action_drop": jax.random.PRNGKey(2)}
    params = model.init(init_rngs, lat, lat, actions, dom, mask)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))

    # structural stacked-leaf mask exactly as the trainer derives it
    # (eval_shape at num_domains+1 -> zero extra HBM)
    alt = copy.deepcopy(cfg)
    alt.action_domains = list(cfg.action_domains) + ["__probe__"]
    alt.d_actions = list(cfg.d_actions) + [cfg.d_actions[-1]]
    alt.action_stats = list(cfg.action_stats) + [cfg.action_stats[-1]]
    alt.__post_init__()
    other = jax.eval_shape(STMAR(alt, remat=remat).init, init_rngs,
                           lat, lat, actions, dom, mask)
    stacked_mask = domain_stacked_mask(params, other)
    tx = make_domain_sliced_optimizer(
        1e-4, params_template=params,
        stacked_mask=stacked_mask,
        num_domains=cfg.num_domains, moment_dtype=jnp.bfloat16)
    model_sliced = STMAR(cfg, remat=remat, single_domain_params=True)
    step = jax.jit(make_train_step(model_sliced, tx, continuous=True,
                                   stacked_mask=stacked_mask),
                   donate_argnums=(0,))
    batch = {"input_ids": lat, "labels": lat, "action_ids": actions,
             "domain_id": dom, "masked_tokens_indicator": mask}
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    params = None  # donated

    t0 = time.perf_counter()
    state, m = step(state, batch, jax.random.PRNGKey(0))
    _force(state.params["params"]["pos_embed_TSC"])
    compile_s = time.perf_counter() - t0

    iters = 20
    losses = []
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, jax.random.PRNGKey(i + 1))
    losses.append(float(m["loss"]))
    dt = (time.perf_counter() - t0) / iters

    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
    toks = B * cfg.T * (cfg.h // cfg.patch_size) ** 2
    assert all(np.isfinite(l) for l in losses), losses
    _emit({"variant": f"mar_train1b_b{B}_dom40_bf16mom_remat{int(remat)}",
           "step_s": round(dt, 4),
           "params_M": round(n_params / 1e6, 1),
           "tokens_per_sec": round(toks / dt),
           "model_tflops_per_sec": round(6 * n_params * toks / dt / 1e12, 1),
           "loss_final": round(losses[-1], 4),
           "peak_hbm_gib": (round(peak / 2**30, 2) if peak else None),
           "compile_s": round(compile_s, 1)})


def run_rollout(B=8, maskgit_steps=None, sampling_steps=None):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hma_tpu.models.st_mar import STMAR
    from hma_tpu.rollout.mar import make_mar_generator

    cfg = _config()
    if maskgit_steps is not None:
        cfg.maskgit_steps = maskgit_steps
    if sampling_steps is not None:
        cfg.num_sampling_steps = sampling_steps
    model = STMAR(cfg)
    lat, _mask, actions, dom = _data(cfg, B)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "action_drop": jax.random.PRNGKey(2)}, lat, lat, actions, dom,
        jnp.zeros((B, cfg.T, cfg.h, cfg.h), jnp.int32))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    num_prompt = 2
    run = make_mar_generator(model, num_prompt_frames=num_prompt,
                             maskgit_steps=cfg.maskgit_steps)

    t0 = time.perf_counter()
    out = run(params, lat, actions, dom, jax.random.PRNGKey(0))
    _force(out)
    compile_s = time.perf_counter() - t0

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        out = run(params, lat, actions, dom, jax.random.PRNGKey(i))
    _force(out)
    dt = (time.perf_counter() - t0) / iters
    gen_frames = cfg.T - num_prompt
    _emit({"variant": f"mar_rollout_b{B}", "window_s": round(dt, 4),
           "frames_per_sec": round(B * gen_frames / dt, 2),
           "maskgit_steps": cfg.maskgit_steps,
           "diffusion_steps": cfg.num_sampling_steps,
           "compile_s": round(compile_s, 1)})


def run_trace(B=8):
    """Capture a jax.profiler device trace of the MAR rollout window and
    print the per-segment breakdown (parser shared with trace_step.py)."""
    import jax
    import jax.numpy as jnp

    import trace_step

    trace_step.TRACE_DIR = "/tmp/hma_mar_trace"

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hma_tpu.models.st_mar import STMAR
    from hma_tpu.rollout.mar import make_mar_generator

    cfg = _config()
    model = STMAR(cfg)
    lat, _mask, actions, dom = _data(cfg, B)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "action_drop": jax.random.PRNGKey(2)}, lat, lat, actions, dom,
        jnp.zeros((B, cfg.T, cfg.h, cfg.h), jnp.int32))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    run = make_mar_generator(model, num_prompt_frames=2,
                             maskgit_steps=cfg.maskgit_steps)
    _force(run(params, lat, actions, dom, jax.random.PRNGKey(0)))  # compile
    with jax.profiler.trace("/tmp/hma_mar_trace"):
        out = run(params, lat, actions, dom, jax.random.PRNGKey(1))
        _force(out)
    trace_step.parse()


if __name__ == "__main__":
    which = sys.argv[1:] or ["train", "rollout"]
    if "train" in which:
        run_train()
    if "train1b" in which:
        run_train1b()
    if "train1b_noremat" in which:
        run_train1b(remat=False)
    if "rollout" in which:
        run_rollout()
    if "trace" in which:
        run_trace()
    if "breakdown" in which:
        # Decompose the rollout window: vary maskgit x diffusion steps.
        # window ~= maskgit*(trunk_fwd + diff_steps*mlp_step) + const, so
        # these three points solve for the trunk and diffusion-head costs.
        run_rollout(maskgit_steps=16, sampling_steps="100")
        run_rollout(maskgit_steps=16, sampling_steps="25")
        run_rollout(maskgit_steps=4, sampling_steps="100")
