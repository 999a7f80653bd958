"""Capture a jax.profiler trace of the d512 STMAR train step (the exact
config bench.py's detail.mar times: 8 domains, B=8, remat, donation) and
print a device-time breakdown by HLO category and source line.

The discrete flagship's step has a full roofline writeup
(experiments/PROFILE_r3.md); this is the continuous family's
counterpart, used to decide where the 0.245 s/step goes.

This trace (remat=True, dense AdamW) drove the mar_step_probe.py
bake-off; bench.py has since switched detail.mar to the measured winner
remat=False (see PROFILE_r3.md "MAR train-step profile").

Run: python experiments/mar_trace.py [trace|parse]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import trace_step

TRACE_DIR = "/tmp/hma_mar_trace"
trace_step.TRACE_DIR = TRACE_DIR


def trace():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mar_probe import _config, _data

    from hma_tpu.models.st_mar import STMAR
    from hma_tpu.train.step import TrainState, make_optimizer, make_train_step

    B = 8
    cfg = _config(8)
    model = STMAR(cfg, remat=True)
    lat, mask, actions, dom = _data(cfg, B)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "action_drop": jax.random.PRNGKey(2)}, lat, lat, actions, dom, mask)
    tx = make_optimizer(1e-4, params_template=params)
    step = jax.jit(make_train_step(model, tx, continuous=True),
                   donate_argnums=(0,))
    batch = {"input_ids": lat, "labels": lat, "action_ids": actions,
             "domain_id": dom, "masked_tokens_indicator": mask}
    state = TrainState(params, tx.init(params), jnp.asarray(0))

    def force(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    state, m = step(state, batch, jax.random.PRNGKey(0))
    force(m["loss"])
    with jax.profiler.trace(TRACE_DIR):
        for i in range(2):
            state, m = step(state, batch, jax.random.PRNGKey(i))
        force(m["loss"])


if __name__ == "__main__":
    if sys.argv[1:2] == ["parse"]:
        trace_step.parse()
    else:
        trace()
        trace_step.parse()
