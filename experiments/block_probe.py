"""Per-component timing of one STBlock at the flagship training shape.

Times jitted sub-parts (spatial attn, temporal attn, MLP, modulate
inject, full block fwd, full block fwd+bwd) on the real chip to locate
the train-step bandwidth bottleneck. Also attempts a jax.profiler trace
(may be unsupported through the axon tunnel).

Run: python experiments/block_probe.py
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

    from hma_tpu.models.st_transformer import STBlock
    from hma_tpu.models.attention import SelfAttention, _attend
    from hma_tpu.models.action_stems import DomainModulate

    B, T, S, C, H = 8, 12, 320, 256, 8
    ND = 40
    rng = np.random.default_rng(0)
    x_TSC = jnp.asarray(rng.normal(size=(B, T, S, C)), jnp.bfloat16)
    x_SC = jnp.asarray(rng.normal(size=(B * T, S, C)), jnp.bfloat16)
    x_TC = jnp.asarray(rng.normal(size=(B * S, T, C)), jnp.bfloat16)
    cond = jnp.asarray(rng.normal(size=(B, T, C)), jnp.bfloat16)
    did = jnp.asarray(0, jnp.int32)

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

    block = STBlock(num_heads=H, d_model=C, action_processing="concat+modulate",
                    num_domains=ND)
    pb = block.init({"params": jax.random.PRNGKey(0)}, x_TSC, cond, did)
    f_block = jax.jit(lambda p, x: block.apply(p, x, cond, did))
    results["block_fwd_ms"] = timed(f_block, pb, x_TSC) * 1e3

    g_block = jax.jit(jax.grad(
        lambda p, x: jnp.sum(block.apply(p, x, cond, did).astype(jnp.float32))))
    results["block_fwd_bwd_ms"] = timed(g_block, pb, x_TSC) * 1e3

    attn = SelfAttention(num_heads=H, d_model=C)
    pa = attn.init(jax.random.PRNGKey(0), x_SC)
    f_sp = jax.jit(lambda p, x: attn.apply(p, x, causal=False))
    results["spatial_attn_fwd_ms"] = timed(f_sp, pa, x_SC) * 1e3

    pt = attn.init(jax.random.PRNGKey(0), x_TC)
    f_tp = jax.jit(lambda p, x: attn.apply(p, x, causal=True))
    results["temporal_attn_fwd_ms"] = timed(f_tp, pt, x_TC) * 1e3

    # attention internals: qkv+norm only vs full
    def qkv_only(p, x):
        return attn.apply(p, x, method=lambda m, x: m._qkv(x))
    f_qkv = jax.jit(qkv_only)
    results["spatial_qkv_norm_ms"] = timed(f_qkv, pa, x_SC) * 1e3

    # bare attention math at the spatial shape (no projections)
    q = jnp.asarray(rng.normal(size=(B * T, S, H, C // H)), jnp.bfloat16)
    f_att = jax.jit(lambda q: _attend(q, q, q, causal=False))
    results["bare_attend_spatial_ms"] = timed(f_att, q) * 1e3

    from hma_tpu.models.st_transformer import Mlp
    mlp = Mlp(d_model=C)
    pm = mlp.init(jax.random.PRNGKey(0), x_TC)
    f_mlp = jax.jit(lambda p, x: mlp.apply(p, x))
    results["mlp_fwd_ms"] = timed(f_mlp, pm, x_TC) * 1e3

    mod = DomainModulate(num_domains=ND, d_model=C)
    x_BSTC = x_TSC.transpose(0, 2, 1, 3)
    pmod = mod.init(jax.random.PRNGKey(0), x_BSTC, cond[:, None], did)
    f_mod = jax.jit(lambda p, x: mod.apply(p, x, cond[:, None], did))
    results["modulate_fwd_ms"] = timed(f_mod, pmod, x_BSTC) * 1e3

    results = {k: round(v, 3) for k, v in results.items()}
    print(json.dumps(results), flush=True)
    with open("/tmp/block_probe.json", "w") as f:
        json.dump(results, f)

    # profiler attempt
    try:
        with jax.profiler.trace("/tmp/hma_trace"):
            for _ in range(3):
                o = f_block(pb, x_TSC)
            force(o)
        print("trace written:", os.listdir("/tmp/hma_trace"))
    except Exception as e:  # noqa
        print("profiler unsupported:", repr(e))


if __name__ == "__main__":
    main()
