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
    rec = {"variant": "sim_discrete_362M", **{k: (round(v, 2)
           if isinstance(v, float) else v) for k, v in stats.items()}}
    print(json.dumps(rec), flush=True)
    with open("/tmp/sim_probe.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    run_discrete()
