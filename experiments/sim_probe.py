"""Interactive-simulator latency on one real TPU chip.

Measures GenieSimulator.step() p50 for the discrete flagship (and the
continuous d512 STMAR if requested) with random weights — latency is
architecture-, not weight-, dependent. Validates the README latency
claim against current code.

Run: python experiments/sim_probe.py [discrete|continuous]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_discrete(n_steps=30):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_config
    from hma_tpu.models.st_mask_git import STMaskGIT
    from hma_tpu.sim.simulator import GenieSimulator

    cfg = _flagship_config(num_domains=40)
    model = STMaskGIT(cfg)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        rng.integers(0, cfg.image_vocab_size, (1, cfg.T, cfg.S)), jnp.int32)
    actions = jnp.asarray(rng.normal(size=(1, cfg.T, cfg.max_d_action)),
                          jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        tokens, tokens, actions, jnp.asarray(0, jnp.int32))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    sim = GenieSimulator(model, params, prompt_horizon=3, maskgit_steps=2)
    prompt = np.asarray(rng.integers(0, cfg.image_vocab_size,
                                     (3, cfg.h, cfg.h)), np.uint32)
    prompt_actions = np.asarray(rng.normal(size=(3, cfg.max_d_action)),
                                np.float32)
    sim.set_initial_state(prompt, prompt_actions)
    sim.step(np.zeros(4, np.float32))  # compile
    sim._step_times.clear()
    for i in range(n_steps):
        sim.step(rng.normal(size=4).astype(np.float32))
    stats = sim.measure_step_time()
    stats["p50_onchip_ms"] = _onchip_ms(sim)
    rec = {"variant": "sim_discrete_362M", **{k: (round(v, 2)
           if isinstance(v, float) else v) for k, v in stats.items()}}
    print(json.dumps(rec), flush=True)
    with open("/tmp/sim_probe.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


def _onchip_ms(sim, iters=20):
    """Per-step device time with the ~31 ms dev-tunnel round-trip
    amortized: enqueue `iters` identical step programs, sync once.
    This is the latency a locally-attached chip would see."""
    import time

    import jax
    import jax.numpy as jnp

    window = jnp.asarray(sim._make_window())
    actions = jnp.asarray(
        np.concatenate([sim._action_cache,
                        np.zeros((1, sim.config.max_d_action), np.float32)])[None])
    key = jax.random.PRNGKey(7)
    out = sim._step_fn(sim.params, window, actions, key)  # warm
    float(jnp.sum(jnp.asarray(out, jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = sim._step_fn(sim.params, window, actions, key)
    float(jnp.sum(jnp.asarray(out, jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1000


def run_continuous(n_steps=20):
    """STMAR d512 interactive latency (16 MaskGIT x 100 diffusion steps
    per frame by the reference's demo defaults; here maskgit_steps=2 to
    match the discrete probe's interactive setting)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mar_probe import _config as _mar_config
    from hma_tpu.models.st_mar import STMAR
    from hma_tpu.sim.simulator import GenieSimulator

    cfg = _mar_config(num_domains=8)
    model = STMAR(cfg)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(1, cfg.T, cfg.h, cfg.h,
                                       cfg.vae_embed_dim)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(1, cfg.T, cfg.h, cfg.h)) < 0.5,
                       jnp.int32)
    actions = jnp.asarray(rng.normal(size=(1, cfg.T, cfg.max_d_action)),
                          jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "action_drop": jax.random.PRNGKey(2)},
        lat, lat, actions, jnp.asarray(0, jnp.int32), mask)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    sim = GenieSimulator(model, params, prompt_horizon=3, maskgit_steps=2)
    prompt = np.asarray(rng.normal(size=(3, cfg.h, cfg.h, cfg.vae_embed_dim)),
                        np.float32)
    sim.set_initial_state(prompt)
    sim.step(np.zeros(4, np.float32))  # compile
    sim._step_times.clear()
    for _ in range(n_steps):
        sim.step(rng.normal(size=4).astype(np.float32))
    stats = sim.measure_step_time()
    stats["p50_onchip_ms"] = _onchip_ms(sim)
    rec = {"variant": "sim_continuous_d512", **{k: (round(v, 2)
           if isinstance(v, float) else v) for k, v in stats.items()}}
    print(json.dumps(rec), flush=True)
    with open("/tmp/sim_probe.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "discrete"
    if which in ("discrete", "all"):
        run_discrete()
    if which in ("continuous", "all"):
        run_continuous()
