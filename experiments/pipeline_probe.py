"""Sustained input-pipeline integration on-chip (VERDICT r3 item 7).

Runs the REAL jitted 362M flagship train step fed by the C++ native
loader (cpp/hma_loader.cpp via data/native_loader.py) for ~100 steps on
the TPU and compares steps/s against the same step on one synthetic
resident batch. The CPU-side loader throughput tests
(tests/test_native_loader.py) prove the loader is fast in isolation;
only this probe proves no host starvation at production batch shapes —
the loader must hide mmap + collation + host->device transfer behind the
~0.3 s device step (the reference leans on torch DataLoader workers for
the same property, hma/train_multi.py:926-950).

Also covers the fp16 STMAR entry point (--mar) with the d512 continuous
step fed by NativeFeatureLoader.

Run: /opt/venv/bin/python experiments/pipeline_probe.py [--steps 100] [--mar]
Prints one JSON line per family; appends to /tmp/pipeline_probe.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _emit(rec):
    print(json.dumps(rec), flush=True)
    with open("/tmp/pipeline_probe.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


def _force(x):
    import jax
    import jax.numpy as jnp

    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def probe_discrete(steps: int, B: int = 8):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_config
    from hma_tpu.data.datasets import write_token_dataset
    from hma_tpu.data.native_loader import NativeTokenLoader
    from hma_tpu.models.st_mask_git import STMaskGIT
    from hma_tpu.train.step import (TrainState, domain_stacked_mask,
                                    make_domain_sliced_optimizer,
                                    make_train_step)

    cfg = _flagship_config(num_domains=40)
    # dataset on disk: enough frames that 100 windows never repeat hot in
    # the page cache unrealistically (still mmap'd, as in production)
    rng = np.random.default_rng(0)
    N, h = 6000, cfg.h
    d_act = cfg.d_actions[0]
    tmp = tempfile.mkdtemp(prefix="pipe_probe_")
    video = rng.integers(0, cfg.image_vocab_size, size=(N, h, h)).astype(np.uint32)
    segs = np.repeat(np.arange(N // 100), 100).astype(np.int32)
    actions = rng.normal(size=(N, d_act)).astype(np.float32)
    write_token_dataset(os.path.join(tmp, "ds"), video, segs, actions,
                        {"name": "pipeline_probe"})

    loader = NativeTokenLoader(os.path.join(tmp, "ds"), cfg, batch_size=B,
                               stride=1, seed=0, num_threads=4, queue_depth=6,
                               action_width=cfg.max_d_action)

    model = STMaskGIT(cfg, remat=True)
    b0 = loader.next_batch()
    batch0 = {"input_ids": jnp.asarray(b0["input_ids"]),
              "labels": jnp.asarray(b0["labels"]),
              "action_ids": jnp.asarray(b0["action_ids"]),
              "domain_id": jnp.asarray(0, jnp.int32)}
    params = model.init({"params": jax.random.PRNGKey(0)},
                        batch0["input_ids"], batch0["labels"],
                        batch0["action_ids"], batch0["domain_id"])
    import copy

    alt = copy.deepcopy(cfg)
    alt.action_domains = list(cfg.action_domains) + ["__probe__"]
    alt.d_actions = list(cfg.d_actions) + [cfg.d_actions[-1]]
    alt.action_stats = list(cfg.action_stats) + [cfg.action_stats[-1]]
    alt.__post_init__()
    other = jax.eval_shape(
        STMaskGIT(alt).init, {"params": jax.random.PRNGKey(0)},
        batch0["input_ids"], batch0["labels"], batch0["action_ids"],
        batch0["domain_id"])
    tx = make_domain_sliced_optimizer(
        1e-4, params_template=params,
        stacked_mask=domain_stacked_mask(params, other),
        num_domains=cfg.num_domains)
    step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    params = None
    state, _ = step(state, batch0, jax.random.PRNGKey(0))  # compile
    state, _ = step(state, batch0, jax.random.PRNGKey(1))  # warm
    _force(state.params["params"]["pos_embed_TSC"])

    # synthetic baseline: same resident batch every step
    t0 = time.perf_counter()
    for i in range(steps):
        state, _ = step(state, batch0, jax.random.PRNGKey(i))
    _force(state.params["params"]["pos_embed_TSC"])
    dt_syn = (time.perf_counter() - t0) / steps

    # loader-fed: fresh batch from the C++ loader every step
    t0 = time.perf_counter()
    for i in range(steps):
        nb = loader.next_batch()
        batch = {"input_ids": jnp.asarray(nb["input_ids"]),
                 "labels": jnp.asarray(nb["labels"]),
                 "action_ids": jnp.asarray(nb["action_ids"]),
                 "domain_id": batch0["domain_id"]}
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    _force(state.params["params"]["pos_embed_TSC"])
    dt_fed = (time.perf_counter() - t0) / steps
    loader.close()

    _emit({"probe": "pipeline_discrete_362M", "steps": steps, "batch": B,
           "synthetic_s_per_step": round(dt_syn, 4),
           "loader_fed_s_per_step": round(dt_fed, 4),
           "overhead_pct": round((dt_fed / dt_syn - 1) * 100, 2),
           "ok": bool(dt_fed < dt_syn * 1.05)})


def probe_mar(steps: int, B: int = 8):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hma_tpu.data.datasets import write_token_dataset
    from hma_tpu.data.native_loader import NativeFeatureLoader
    from hma_tpu.models.st_mar import STMAR
    from hma_tpu.train.step import TrainState, make_optimizer, make_train_step
    from mar_probe import _config

    cfg = _config(8)
    rng = np.random.default_rng(0)
    N, h, C = 4000, cfg.h, cfg.vae_embed_dim
    d_act = cfg.d_actions[0]
    tmp = tempfile.mkdtemp(prefix="pipe_probe_mar_")
    lat = rng.normal(size=(N, C, h, h)).astype(np.float16)
    segs = np.repeat(np.arange(N // 100), 100).astype(np.int32)
    actions = rng.normal(size=(N, d_act)).astype(np.float32)
    write_token_dataset(os.path.join(tmp, "ds"), lat, segs, actions,
                        {"name": "pipeline_probe", "latent_channels": C})

    loader = NativeFeatureLoader(os.path.join(tmp, "ds"), cfg, batch_size=B,
                                 stride=1, seed=0, num_threads=4,
                                 queue_depth=6, action_width=cfg.max_d_action)

    model = STMAR(cfg, remat=True)

    def to_batch(nb):
        return {"input_ids": jnp.asarray(nb["input_ids"]),
                "labels": jnp.asarray(nb["labels"]),
                "action_ids": jnp.asarray(nb["action_ids"]),
                "domain_id": jnp.asarray(0, jnp.int32),
                "masked_tokens_indicator":
                    jnp.asarray(nb["masked_tokens_indicator"])}

    batch0 = to_batch(loader.next_batch())
    params = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "action_drop": jax.random.PRNGKey(2)},
        batch0["input_ids"], batch0["labels"], batch0["action_ids"],
        batch0["domain_id"], batch0["masked_tokens_indicator"])
    tx = make_optimizer(1e-4, params_template=params)
    step = jax.jit(make_train_step(model, tx, continuous=True),
                   donate_argnums=(0,))
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    params = None
    state, _ = step(state, batch0, jax.random.PRNGKey(0))
    state, _ = step(state, batch0, jax.random.PRNGKey(1))
    _force(state.params["params"]["pos_embed_TSC"])

    t0 = time.perf_counter()
    for i in range(steps):
        state, _ = step(state, batch0, jax.random.PRNGKey(i))
    _force(state.params["params"]["pos_embed_TSC"])
    dt_syn = (time.perf_counter() - t0) / steps

    t0 = time.perf_counter()
    for i in range(steps):
        state, _ = step(state, to_batch(loader.next_batch()),
                        jax.random.PRNGKey(i))
    _force(state.params["params"]["pos_embed_TSC"])
    dt_fed = (time.perf_counter() - t0) / steps
    loader.close()

    _emit({"probe": "pipeline_mar_d512_dom8", "steps": steps, "batch": B,
           "synthetic_s_per_step": round(dt_syn, 4),
           "loader_fed_s_per_step": round(dt_fed, 4),
           "overhead_pct": round((dt_fed / dt_syn - 1) * 100, 2),
           "ok": bool(dt_fed < dt_syn * 1.05)})


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--mar", action="store_true")
    ap.add_argument("--mar-steps", type=int, default=40)
    args = ap.parse_args()
    probe_discrete(args.steps)
    if args.mar:
        probe_mar(args.mar_steps)
