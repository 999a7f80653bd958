"""Capture a jax.profiler trace of the flagship KV-cached rollout (the
bench.py headline program) and print a device-time breakdown.

Run: python experiments/rollout_trace.py [trace|parse]

Findings (v5e, 362M flagship, B=8, 2026-08-17): the parser counts `while`
ops INCLUSIVE of their body's children, so subtract them; leaf device time
is ~204 ms/window (matches bench 0.2058 s). Leaf hotspots:
  69 ms  st_transformer.py:283 frame_step loop fusions (64 GB claimed)
  69 ms  linen Dense matmuls (24 GB)
  45 ms  attention einsums/softmax (~106 GB claimed vs ~45 GB mandatory
         KV reads: (.., T=12, H=8, D=32) minors pad to (8,128) lanes)
Negative result (measured): rewriting decode_step/decode_window to
concatenate (B, H, n, T+n) fp32 LOGITS instead of the full k/v caches —
to avoid the apparent per-layer cache copy — made the rollout 3x SLOWER
(388.7 -> 129.6 f/s). The re-trace showed XLA inserting 263 ms/window of
`data formatting` (44.6 GB): with the einsum split in two, it physically
transposes the cache per step, whereas the cache-concat version fuses
concat + mask + einsum with no materialization. The claimed
bytes_accessed on fusions double-count fused operands; the concat
version is in fact within ~10% of the HBM roofline for its mandatory
traffic, so the decode path stays as-is.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import trace_step  # noqa: E402  (sibling module: reuse the parser)

TRACE_DIR = "/tmp/hma_rollout_trace"
N_RUNS = 2


def trace():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_config
    from hma_tpu.models.st_mask_git import STMaskGIT
    from hma_tpu.rollout.maskgit import make_generator

    cfg = _flagship_config(num_domains=40)
    model = STMaskGIT(cfg)
    B = 8
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(
        rng.integers(0, cfg.image_vocab_size, (B, cfg.T, cfg.S)), jnp.int32)
    actions = jnp.asarray(rng.normal(size=(B, cfg.T, cfg.max_d_action)),
                          jnp.float32)
    domain_id = jnp.asarray(0, jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        tokens, tokens, actions, domain_id)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    run = make_generator(model, num_prompt_frames=2, maskgit_steps=2)

    def force(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    key = jax.random.PRNGKey(0)
    force(run(params, tokens, actions, domain_id, key))  # compile + warm
    with jax.profiler.trace(TRACE_DIR):
        out = None
        for _ in range(N_RUNS):
            out = run(params, tokens, actions, domain_id, key)
        force(out)


if __name__ == "__main__":
    trace_step.TRACE_DIR = TRACE_DIR
    if sys.argv[1:2] == ["parse"]:
        trace_step.parse()
    else:
        trace()
        trace_step.parse()
