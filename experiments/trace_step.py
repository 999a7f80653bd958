"""Capture a jax.profiler trace of the flagship train step and print a
device-time breakdown by HLO category and source line.

Run: python experiments/trace_step.py [trace|parse]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/hma_step_trace"


def trace():
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
    model = STMaskGIT(cfg, remat=True, remat_policy="full")
    B = 8
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
    # trainer-default sliced optimizer, as in bench.py
    import copy

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

    state, m = step(state, batch, jax.random.PRNGKey(0))
    force(m["loss"])
    with jax.profiler.trace(TRACE_DIR):
        for i in range(2):
            state, m = step(state, batch, jax.random.PRNGKey(i))
        force(m["loss"])


def parse():
    paths = sorted(glob.glob(TRACE_DIR + "/plugins/profile/*/*.trace.json.gz"))
    assert paths, "no trace found"
    d = json.load(gzip.open(paths[-1]))
    ev = d["traceEvents"]
    pids = {e["pid"]: e["args"].get("name") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    by_cat = collections.Counter()
    by_src = collections.Counter()
    by_name = collections.Counter()
    bytes_by_src = collections.Counter()
    total = 0.0
    flops = 0
    bytes_total = 0
    for e in ev:
        if e.get("ph") != "X" or "TPU" not in str(pids.get(e["pid"], "")):
            continue
        args = e.get("args", {})
        dur = e.get("dur", 0.0)  # us
        if not args.get("hlo_category"):
            continue
        total += dur
        cat = args.get("hlo_category", "?")
        src = args.get("source", "?")
        src = "/".join(src.rsplit("/", 2)[-2:]) if src else "?"
        by_cat[cat] += dur
        by_src[(cat, src)] += dur
        by_name[e["name"].rstrip("0123456789.")] += dur
        bytes_by_src[(cat, src)] += int(args.get("bytes_accessed", 0))
        flops += int(float(args.get("model_flops", 0) or 0))
        bytes_total += int(args.get("bytes_accessed", 0))
    n_steps = 2
    print(f"total device us per step: {total / n_steps:.0f}")
    # Roofline accounting from XLA's own op annotations (v5e: 197 TFLOP/s
    # bf16 MXU peak, 819 GB/s HBM). "real" = FLOPs XLA actually executes
    # (incl. remat recompute), vs the 6·N·tokens "model" convention.
    sec = total / n_steps / 1e6
    rf = flops / n_steps
    rb = bytes_total / n_steps
    print(f"real executed: {rf / 1e12:.2f} TFLOP/step, {rb / 1e9:.1f} GB/step")
    print(f"real-FLOP rate {rf / sec / 1e12:.1f} TFLOP/s = "
          f"{rf / sec / 197e12 * 100:.1f}% of v5e bf16 peak; "
          f"HBM {rb / sec / 1e9:.0f} GB/s = {rb / sec / 819e9 * 100:.1f}% of peak; "
          f"lower bounds: compute {rf / 197e12 * 1e3:.0f} ms, "
          f"HBM {rb / 819e9 * 1e3:.0f} ms")
    print("\n-- by category (ms/step) --")
    for k, v in by_cat.most_common(15):
        print(f"{v / n_steps / 1e3:8.2f}  {k}")
    print("\n-- by (category, source) (ms/step, GB/step) --")
    for k, v in by_src.most_common(25):
        gb = bytes_by_src[k] / n_steps / 1e9
        print(f"{v / n_steps / 1e3:8.2f}  {gb:6.2f}GB  {k}")
    print("\n-- by op-name prefix (ms/step) --")
    for k, v in by_name.most_common(20):
        print(f"{v / n_steps / 1e3:8.2f}  {k}")


if __name__ == "__main__":
    if sys.argv[1:2] == ["parse"]:
        parse()
    else:
        trace()
        parse()
