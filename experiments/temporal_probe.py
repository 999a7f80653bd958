"""Temporal-attention kernel vs XLA at the flagship shape (2560, 12, 8, 32).

Run: python experiments/temporal_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from hma_tpu.models.attention import _attend
    from hma_tpu.ops.temporal_attention import fused_temporal_attention

    N, T, H, D = 2560, 12, 8, 32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(N, T, H, D)), jnp.bfloat16) * 0.2
    k = jnp.asarray(rng.normal(size=(N, T, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(N, T, H, D)), jnp.bfloat16)

    def force(x):
        return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))

    def timed(fn, *args, iters=30):
        force(fn(*args))
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = fn(*args)
        force(o)
        return (time.perf_counter() - t0) / iters

    r = {}
    f_xla = jax.jit(lambda q, k, v: _attend(q, k, v, causal=True))
    r["xla_fwd_ms"] = timed(f_xla, q, k, v) * 1e3
    g_xla = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        _attend(q, k, v, causal=True).astype(jnp.float32)), argnums=(0, 1, 2)))
    r["xla_fwdbwd_ms"] = timed(g_xla, q, k, v) * 1e3

    f_ours = jax.jit(lambda q, k, v: fused_temporal_attention(q, k, v))
    got = np.asarray(f_ours(q, k, v), np.float32)
    want = np.asarray(f_xla(q, k, v), np.float32)
    r["ours_maxerr"] = float(np.max(np.abs(got - want)))
    r["ours_fwd_ms"] = timed(f_ours, q, k, v) * 1e3
    g_ours = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        fused_temporal_attention(q, k, v).astype(jnp.float32)),
        argnums=(0, 1, 2)))
    r["ours_fwdbwd_ms"] = timed(g_ours, q, k, v) * 1e3

    r = {k2: round(v2, 4) for k2, v2 in r.items()}
    print(json.dumps(r), flush=True)
    with open("/tmp/temporal_probe.json", "w") as f:
        json.dump(r, f)


if __name__ == "__main__":
    main()
