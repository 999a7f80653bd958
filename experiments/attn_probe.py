"""Fused-attention bake-off at the ST-transformer training shapes.

Compares XLA attention (hma_tpu.models.attention._attend) against jax's
stock Pallas TPU flash kernel (jax.experimental.pallas.ops.tpu.
flash_attention) for forward and forward+backward at:
  - spatial shape: (B*T=96, H=8, S=320, D=32), bidirectional
  - temporal shape: (B*S=2560, H=8, T=12, D=32), causal

Run: python experiments/attn_probe.py
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

    results = {}
    rng = np.random.default_rng(0)

    for name, (B, H, S, D, causal) in {
        "spatial": (96, 8, 320, 32, False),
        "temporal": (2560, 8, 12, 32, True),
        # rollout's per-frame spatial pass (frame_step): B=8 — exercises
        # the (B, H) per-head grid variant of ops/fused_attention
        "rollout_spatial": (8, 8, 320, 32, False),
    }.items():
        # _attend takes (B, S, H, D) with q pre-scaled
        q_bshd = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16) * 0.2
        k_bshd = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
        v_bshd = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)

        f_xla = jax.jit(lambda q, k, v: _attend(q, k, v, causal=causal))
        results[f"{name}_xla_fwd_ms"] = timed(f_xla, q_bshd, k_bshd, v_bshd) * 1e3
        g_xla = jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(_attend(q, k, v, causal=causal)
                                    .astype(jnp.float32)), argnums=(0, 1, 2)))
        results[f"{name}_xla_fwdbwd_ms"] = timed(g_xla, q_bshd, k_bshd, v_bshd) * 1e3

        try:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes, flash_attention)

            # flash kernel takes (B, H, S, D)
            q = q_bshd.transpose(0, 2, 1, 3)
            k = k_bshd.transpose(0, 2, 1, 3)
            v = v_bshd.transpose(0, 2, 1, 3)
            bs = BlockSizes(
                block_q=min(512, S), block_k_major=min(512, S),
                block_k=min(512, S), block_b=1,
                block_q_major_dkv=min(512, S), block_k_major_dkv=min(512, S),
                block_k_dkv=min(512, S), block_q_dkv=min(512, S),
                block_k_major_dq=min(512, S), block_k_dq=min(512, S),
                block_q_dq=min(512, S),
            )
            f_fl = jax.jit(lambda q, k, v: flash_attention(
                q, k, v, causal=causal, block_sizes=bs))
            # numerics sanity
            got = np.asarray(f_fl(q, k, v).transpose(0, 2, 1, 3), np.float32)
            want = np.asarray(f_xla(q_bshd, k_bshd, v_bshd), np.float32)
            err = float(np.max(np.abs(got - want)))
            results[f"{name}_flash_maxerr"] = err
            results[f"{name}_flash_fwd_ms"] = timed(f_fl, q, k, v) * 1e3
            g_fl = jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(flash_attention(
                    q, k, v, causal=causal, block_sizes=bs)
                    .astype(jnp.float32)), argnums=(0, 1, 2)))
            results[f"{name}_flash_fwdbwd_ms"] = timed(g_fl, q, k, v) * 1e3
        except Exception as e:  # noqa
            results[f"{name}_flash_error"] = repr(e)[:200]

        try:
            from hma_tpu.ops.fused_attention import fused_attention

            f_ours = jax.jit(lambda q, k, v: fused_attention(q, k, v, causal))
            got = np.asarray(f_ours(q_bshd, k_bshd, v_bshd), np.float32)
            want = np.asarray(f_xla(q_bshd, k_bshd, v_bshd), np.float32)
            results[f"{name}_ours_maxerr"] = float(np.max(np.abs(got - want)))
            results[f"{name}_ours_fwd_ms"] = timed(f_ours, q_bshd, k_bshd, v_bshd) * 1e3
            g_ours = jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(fused_attention(q, k, v, causal)
                                        .astype(jnp.float32)), argnums=(0, 1, 2)))
            results[f"{name}_ours_fwdbwd_ms"] = timed(g_ours, q_bshd, k_bshd, v_bshd) * 1e3
        except Exception as e:  # noqa
            results[f"{name}_ours_error"] = repr(e)[:300]

    results = {k: (round(v, 4) if isinstance(v, float) else v)
               for k, v in results.items()}
    print(json.dumps(results, indent=1), flush=True)
    with open("/tmp/attn_probe.json", "w") as f:
        json.dump(results, f)


if __name__ == "__main__":
    main()
