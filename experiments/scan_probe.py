"""Scan-over-layers compile-time bake-off (VERDICT r4 #7).

Same d512 STMAR card, same remat, same optimizer — one trunk inlines 32
STBlocks into the HLO (loop layout), the other carries a single scanned
block body (scan_layers=True). Measures jit compile wall time and
steady-state step time for both, same session (the remote compile
service's load varies day to day — 2026-08-20 it was ~3-4x slower than
round 4 — so only same-session ratios are meaningful).

Run: python experiments/scan_probe.py [--num-domains 8] [--order scan,loop]
Writes experiments/artifacts/scan_layers_r5.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(variant: str, num_domains: int, batch: int):
    import jax
    import jax.numpy as jnp

    from mar_probe import _config, _data

    from hma_tpu.models.st_mar import STMAR
    from hma_tpu.models.st_transformer import stack_layer_params
    from hma_tpu.train.step import TrainState, make_optimizer, make_train_step

    cfg = _config(num_domains)
    lat, mask, actions, dom = _data(cfg, batch)
    rngs = {"params": jax.random.PRNGKey(0),
            "diffusion": jax.random.PRNGKey(1),
            "action_drop": jax.random.PRNGKey(2)}

    # init once in the loop layout (cached from the overfit probe), then
    # restack for the scan variant — initialization programs stay warm
    loop_model = STMAR(_config(num_domains), remat=True)
    params = loop_model.init(rngs, lat, lat, actions, dom, mask)
    if variant == "scan":
        P = dict(params["params"])
        P["decoder"] = stack_layer_params(P["decoder"], cfg.num_layers)
        params = {"params": jax.tree.map(jnp.asarray, P)}
        model = STMAR(_config(num_domains), remat=True, scan_layers=True)
    else:
        model = loop_model

    tx = make_optimizer(1e-4, params_template=params)
    step = jax.jit(make_train_step(model, tx, continuous=True),
                   donate_argnums=(0,))
    batch_d = {"input_ids": lat, "labels": lat, "action_ids": actions,
               "domain_id": dom, "masked_tokens_indicator": mask}
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    params = None

    t0 = time.perf_counter()
    state, m = step(state, batch_d, jax.random.PRNGKey(0))
    loss0 = float(m["loss"])
    compile_s = time.perf_counter() - t0

    state, m = step(state, batch_d, jax.random.PRNGKey(1))  # warm
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(10):
        state, m = step(state, batch_d, jax.random.PRNGKey(2 + i))
    float(m["loss"])
    dt = (time.perf_counter() - t0) / 10
    del state, step, tx
    jax.clear_caches()
    return {"compile_s": round(compile_s, 1), "s_per_step": round(dt, 4),
            "first_loss": round(loss0, 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-domains", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--order", default="scan,loop")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rec = {"probe": "scan_over_layers_bakeoff",
           "card": f"d512 STMAR {args.num_domains}-domain, remat, dense adamw",
           "batch": args.batch}
    for variant in args.order.split(","):
        rec[variant] = measure(variant, args.num_domains, args.batch)
        print(variant, rec[variant], flush=True)
    if "scan" in rec and "loop" in rec:
        rec["compile_speedup"] = round(
            rec["loop"]["compile_s"] / max(rec["scan"]["compile_s"], 1e-9), 2)
        rec["step_overhead"] = round(
            rec["scan"]["s_per_step"] / max(rec["loop"]["s_per_step"], 1e-9), 3)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "artifacts", "scan_layers_r5.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
