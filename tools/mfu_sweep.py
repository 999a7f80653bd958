"""Training-MFU sweep on the real TPU chip: batch x remat policy x attn.

Writes one JSON line per config to tools/mfu_results.jsonl. Run inside
tmux (compiles take minutes through the axon tunnel):

    python tools/mfu_sweep.py [--configs 8:full 32:dots ...]

Token accounting matches bench.py: model TFLOP/s = 6 * params * tokens/s
(the reference's FLOPs meter, hma/train_multi.py:1037-1038).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="*",
                   default=["8:full:0", "8:dots:0", "16:dots:0", "32:dots:0",
                            "32:full:0", "32:dots:1", "16:dots:1"],
                   help="B:remat_policy:pallas triples")
    p.add_argument("--one", default=None,
                   help="run a single config in-process (child mode)")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--out", default="tools/mfu_results.jsonl")
    args = p.parse_args()

    if args.one is None:
        # parent: one subprocess per config so device memory is released
        # between configs (a failed/OOM config must not poison the next)
        import subprocess
        for spec in args.configs:
            subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--one", spec, "--iters", str(args.iters),
                            "--out", args.out])
        return

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _flagship_config
    from hma_tpu.models.st_mask_git import STMaskGIT
    from hma_tpu.train.step import TrainState, make_optimizer, make_train_step

    cfg = _flagship_config(num_domains=40)

    def force(x):
        return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))

    results = []
    for spec in [args.one]:
        parts = spec.split(":")
        B, policy, pallas = int(parts[0]), parts[1], parts[2] == "1"
        os.environ["HMA_TPU_PALLAS_ATTN"] = "1" if pallas else "0"
        # attention.py reads the env at import; reload the flag
        import hma_tpu.models.attention as attn_mod
        attn_mod._USE_PALLAS = pallas

        rng = np.random.default_rng(0)
        tokens = jnp.asarray(rng.integers(0, cfg.image_vocab_size,
                                          (B, cfg.T, cfg.S)), jnp.int32)
        inp = np.asarray(tokens).copy()
        inp[:, 1:, : cfg.S // 2] = cfg.image_vocab_size
        actions = jnp.asarray(rng.normal(size=(B, cfg.T, cfg.max_d_action)),
                              jnp.float32)
        batch = {"input_ids": jnp.asarray(inp), "labels": tokens,
                 "action_ids": actions, "domain_id": jnp.asarray(0, jnp.int32)}

        model = STMaskGIT(cfg, remat=policy != "none", remat_policy=policy)
        try:
            params = model.init({"params": jax.random.PRNGKey(0)},
                                batch["input_ids"], batch["labels"],
                                actions, batch["domain_id"])
            n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
            tx = make_optimizer(1e-4, params_template=params)
            step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))
            state = TrainState(params, tx.init(params), jnp.asarray(0))
            t_c0 = time.perf_counter()
            state, _ = step(state, batch, jax.random.PRNGKey(0))
            force(state.params["params"]["pos_embed_TSC"])
            compile_s = time.perf_counter() - t_c0
            # timed run: enqueue all, sync once
            t0 = time.perf_counter()
            s = state
            for i in range(args.iters):
                s, _ = step(s, batch, jax.random.PRNGKey(i))
            force(s.params["params"]["pos_embed_TSC"])
            dt = (time.perf_counter() - t0) / args.iters
            toks = B * cfg.T * cfg.S
            rec = {"B": B, "remat": policy, "pallas": pallas,
                   "step_s": round(dt, 4),
                   "tokens_per_sec": round(toks / dt),
                   "model_tflops_per_sec": round(6 * n_params * toks / dt / 1e12, 1),
                   "compile_s": round(compile_s, 1)}
        except Exception as e:  # OOM etc. — record and continue
            rec = {"B": B, "remat": policy, "pallas": pallas,
                   "error": str(e)[:300]}
        results.append(rec)
        print(json.dumps(rec), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")



if __name__ == "__main__":
    main()
