"""Bake-off for the d512 STMAR train step (B=8, 8 domains — the exact
config bench.py's detail.mar times).

The mar_trace.py breakdown shows the step at 97.7% of HBM peak moving
192 GB/step, so the candidates are all traffic cuts:

- remat=False: activations at d512/6144-rows are tiny (~6 MB/tensor);
  storing them costs far less HBM than re-streaming weights+activations
  through a full recompute pass. Total state (1.7 GB fp32 params +
  3.4 GB Adam + grads + activations) fits one v5e either way.
- domain-sliced AdamW: ~300M of the 432M params are 8-domain-stacked
  adaLN tables of which one domain slice is touched per step; dense
  optax AdamW streams all of them every step (train/step.py:410 showed
  11.8 GB in the trace).

Writes one JSON line per variant to /tmp/mar_step_probe.jsonl.

Run: python experiments/mar_step_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _emit(rec):
    print(json.dumps(rec), flush=True)
    with open("/tmp/mar_step_probe.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")


def run_variant(remat: bool, sliced: bool, B=8, num_domains=8, iters=20,
                sliced_grads: bool = False):
    import jax
    import jax.numpy as jnp

    from mar_probe import _config, _data

    from hma_tpu.models.st_mar import STMAR
    from hma_tpu.train.step import (TrainState, domain_stacked_mask,
                                    make_domain_sliced_optimizer,
                                    make_optimizer, make_train_step)

    cfg = _config(num_domains)
    model = STMAR(cfg, remat=remat)
    lat, mask, actions, dom = _data(cfg, B)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "action_drop": jax.random.PRNGKey(2)}, lat, lat, actions, dom, mask)
    stacked_mask = None
    if sliced:
        # identify the domain-stacked tables by growing the domain axis
        alt = _config(num_domains + 1)
        other = jax.eval_shape(
            STMAR(alt, remat=remat).init,
            {"params": jax.random.PRNGKey(0),
             "diffusion": jax.random.PRNGKey(1),
             "action_drop": jax.random.PRNGKey(2)},
            lat, lat, actions, dom, mask)
        stacked_mask = domain_stacked_mask(params, other)
        tx = make_domain_sliced_optimizer(
            1e-4, params_template=params,
            stacked_mask=stacked_mask,
            num_domains=num_domains)
    else:
        tx = make_optimizer(1e-4, params_template=params)
    # sliced_grads: row-slice the stacked tables BEFORE jax.grad (no
    # full-size zero grad tree; see make_train_step docstring). Changes
    # the optimizer's input traffic too: the no-remat+sliced pathology
    # (0.5444 s/step) came from XLA losing in-place aliasing on the full
    # gather/scatter chains, which this removes from the graph.
    step_model = (STMAR(cfg, remat=remat, single_domain_params=True)
                  if sliced_grads else model)
    step = jax.jit(make_train_step(step_model, tx, continuous=True,
                                   stacked_mask=(stacked_mask if sliced_grads
                                                 else None)),
                   donate_argnums=(0,))
    batch = {"input_ids": lat, "labels": lat, "action_ids": actions,
             "domain_id": dom, "masked_tokens_indicator": mask}
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    params = None

    def force(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    t0 = time.perf_counter()
    state, m = step(state, batch, jax.random.PRNGKey(0))
    force(m["loss"])
    compile_s = time.perf_counter() - t0
    state, m = step(state, batch, jax.random.PRNGKey(1))
    force(m["loss"])

    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, jax.random.PRNGKey(i))
    force(state.params["params"]["pos_embed_TSC"])
    dt = (time.perf_counter() - t0) / iters
    loss = float(m["loss"])
    _emit({"variant": (f"mar_step_remat{int(remat)}_sliced{int(sliced)}"
                       + ("_sg" if sliced_grads else "")),
           "s_per_step": round(dt, 4), "compile_s": round(compile_s, 1),
           "loss": round(loss, 4), "B": B, "num_domains": num_domains})
    del state, step, tx, model
    jax.clear_caches()
    return dt


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    base = run_variant(remat=True, sliced=False)   # bench baseline
    a = run_variant(remat=False, sliced=False)
    b = run_variant(remat=True, sliced=True)
    c = run_variant(remat=False, sliced=True)
    _emit({"variant": "summary", "base_s": round(base, 4),
           "no_remat_s": round(a, 4), "sliced_s": round(b, 4),
           "both_s": round(c, 4),
           "best_saving_pct": round((1 - min(a, b, c) / base) * 100, 1)})


def main_grads():
    """Round-4 follow-up: does sliced-GRADS rescue the no-remat+sliced
    combo (and beat the 0.2330 no-remat+dense winner)?"""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    a = run_variant(remat=False, sliced=True, sliced_grads=True)
    b = run_variant(remat=True, sliced=True, sliced_grads=True)
    _emit({"variant": "summary_grads",
           "no_remat_sliced_sg_s": round(a, 4),
           "remat_sliced_sg_s": round(b, 4)})


if __name__ == "__main__":
    main_grads() if "grads" in sys.argv[1:] else main()
