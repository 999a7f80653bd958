"""Window-decode bake-off: F-frame cached pass vs F single-frame passes.

VERDICT r4 weak #5: `STMaskGIT.window_logits` (one cached forward over
frames [t0, t0+F)) was measured ~5x the per-frame cost at F=2 — Mosaic
tiles the (N, F, H, D) temporal tensors poorly for tiny F — and the
production rollout routes around it, but the decision was never captured
as an artifact. This probe measures both paths at the flagship card for
F in {1, 2, 3} and writes experiments/artifacts/window_r5.json; the
verdict (retire vs adopt) lives in the `retire_window_logits` field and
PROFILE_r3.md gets the number.

Run: python experiments/window_probe.py
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

    from __graft_entry__ import _flagship_config
    from hma_tpu.models.st_mask_git import STMaskGIT

    cfg = _flagship_config(num_domains=40)
    model = STMaskGIT(cfg)
    B = 8
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.image_vocab_size,
                                      (B, cfg.T, cfg.S)), jnp.int32)
    actions = jnp.asarray(rng.normal(size=(B, cfg.T, cfg.max_d_action)),
                          jnp.float32)
    dom = jnp.asarray(0, jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        tokens, tokens, actions, dom)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    def force(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    def timed(fn, *args, iters=20):
        force(fn(*args))  # compile+warm
        force(fn(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        force(out)
        return (time.perf_counter() - t0) / iters

    k_cache, v_cache = model.apply(params, B, with_actions=True,
                                   method=STMaskGIT.init_cache)

    @jax.jit
    def frame_pass(params, k_cache, v_cache, t):
        frame = jnp.take(tokens, t, axis=1)
        logits, k_cache, v_cache = model.apply(
            params, frame, t, k_cache, v_cache, actions, dom,
            method=STMaskGIT.frame_logits)
        return logits

    def window_pass(F):
        @jax.jit
        def run(params, k_cache, v_cache, t0):
            win = jax.lax.dynamic_slice_in_dim(tokens, 0, F, axis=1)
            logits, k_cache, v_cache = model.apply(
                params, win, t0, k_cache, v_cache, actions, dom,
                method=STMaskGIT.window_logits)
            return logits

        return run

    t = jnp.asarray(2, jnp.int32)
    dt_frame = timed(frame_pass, params, k_cache, v_cache, t)
    rec = {"probe": "window_decode_bakeoff", "batch": B,
           "card": "d256 40-domain flagship",
           "frame_pass_ms": round(dt_frame * 1000, 2), "windows": {}}
    for F in (2, 3):
        dt_w = timed(window_pass(F), params, k_cache, v_cache, t)
        rec["windows"][str(F)] = {
            "window_pass_ms": round(dt_w * 1000, 2),
            "per_frame_ms": round(dt_w / F * 1000, 2),
            "vs_F_frame_passes": round(dt_w / (F * dt_frame), 2),
        }
        print(f"F={F}: window {dt_w*1000:.2f} ms vs {F}x frame "
              f"{F*dt_frame*1000:.2f} ms -> {dt_w/(F*dt_frame):.2f}x",
              flush=True)
    worst = max(w["vs_F_frame_passes"] for w in rec["windows"].values())
    # adopt only if a window pass beats 1.5x the equivalent frame passes
    rec["retire_window_logits"] = bool(worst > 1.5)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "artifacts", "window_r5.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
