"""Localize the d512 STMAR NaN-grad blowup (overfit probe, ~step 275).

Two production runs (2026-08-20) hit it: train until ~step 225-275, then
every backward goes non-finite and the NaN-guard freezes training. The
[0,1] frac clamp in learned_range_log_variance turned the inf into NaN
but did not remove it, so a second source exists. This probe reproduces
the run to the FIRST skipped step with the exact production stack, then
reports, per parameter leaf, the count of non-finite gradient entries —
the leaf map says which submodule's backward detonates (diffloss
variance column? trunk attention? action stems?) — plus the forward
loss decomposition (mse vs vb) at the blowup state.

Run: python experiments/mar_nan_probe.py [--lr 3e-4] [--max-steps 600]
Writes experiments/artifacts/mar_nan_r5.json.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--max-steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--num-domains", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mar_probe import _config, _data

    from hma_tpu.models.st_mar import STMAR
    from hma_tpu.train.step import TrainState, make_optimizer, make_train_step

    cfg = _config(args.num_domains)
    model = STMAR(cfg, remat=False)
    B = args.batch
    lat, mask0, actions, dom = _data(cfg, B)
    n_tail = cfg.T - 1

    params = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "action_drop": jax.random.PRNGKey(2)}, lat, lat, actions, dom, mask0)
    tx = make_optimizer(args.lr, weight_decay=0.0, params_template=params)
    inner_step = make_train_step(model, tx, continuous=True)
    mmin = cfg.dataloader_mask_ratio_min

    def step_with_collate(state, key):
        k_mask, k_step = jax.random.split(key)
        u = jax.random.uniform(k_mask, (B, n_tail, 1, 1))
        prob = jnp.cos((u * (1.0 - mmin) + mmin) * jnp.pi / 2)
        r = jax.random.uniform(jax.random.fold_in(k_mask, 1),
                               (B, n_tail, cfg.h, cfg.h))
        tail = (r < prob).astype(jnp.int32)
        indicator = jnp.concatenate(
            [jnp.zeros((B, 1, cfg.h, cfg.h), jnp.int32), tail], axis=1)
        batch = {"input_ids": lat, "labels": lat, "action_ids": actions,
                 "domain_id": dom, "masked_tokens_indicator": indicator}
        return inner_step(state, batch, k_step)

    step = jax.jit(step_with_collate, donate_argnums=(0,))
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    params = None

    t0 = time.perf_counter()
    bad_step, bad_key = None, None
    for i in range(1, args.max_steps + 1):
        state, m = step(state, jax.random.PRNGKey(i))
        if float(m["skipped"]) > 0:
            bad_step, bad_key = i, jax.random.PRNGKey(i)
            print(f"first skipped step: {i} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
            break
        if i % 50 == 0:
            print(f"step {i}: loss={float(m['loss']):.4f} "
                  f"gnorm={float(m['grad_norm']):.3f}", flush=True)
    rec = {"probe": "mar_nan_localizer", "lr": args.lr,
           "first_skipped_step": bad_step}
    if bad_step is None:
        print("no skip within budget — nothing to localize", flush=True)
    else:
        # the skipping step left params untouched; recompute its exact
        # gradients leaf by leaf (mirrors make_train_step.loss_fn)
        def loss_fn(p, key):
            k_mask, k_step = jax.random.split(key)
            u = jax.random.uniform(k_mask, (B, n_tail, 1, 1))
            prob = jnp.cos((u * (1.0 - mmin) + mmin) * jnp.pi / 2)
            r = jax.random.uniform(jax.random.fold_in(k_mask, 1),
                                   (B, n_tail, cfg.h, cfg.h))
            tail = (r < prob).astype(jnp.int32)
            indicator = jnp.concatenate(
                [jnp.zeros((B, 1, cfg.h, cfg.h), jnp.int32), tail], axis=1)
            rngs = {"dropout": jax.random.fold_in(k_step, 1),
                    "action_drop": jax.random.fold_in(k_step, 2),
                    "diffusion": k_step}
            out = model.apply(p, lat, lat, actions, dom, indicator,
                              deterministic=False, rngs=rngs)
            loss = out["loss"]
            if "action_loss" in out:
                loss = loss + 0.5 * out["action_loss"]
            return loss, out

        grad_fn = jax.jit(jax.grad(loss_fn, has_aux=True))
        grads, out = grad_fn(state.params, bad_key)
        report = []
        for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
            bad = int(jnp.sum(~jnp.isfinite(leaf.astype(jnp.float32))))
            if bad:
                name = "/".join(str(getattr(k, "key", k)) for k in path)
                finite = jnp.where(jnp.isfinite(leaf), jnp.abs(leaf), 0.0)
                report.append({"leaf": name, "nonfinite": bad,
                               "size": int(leaf.size),
                               "max_finite": float(jnp.max(finite))})
        report.sort(key=lambda r: -r["nonfinite"])
        rec["out_terms"] = {k: float(v) for k, v in out.items()
                            if getattr(v, "ndim", 1) == 0}
        rec["nonfinite_leaves"] = report[:40]
        rec["total_nonfinite_leaves"] = len(report)
        print(json.dumps(rec["out_terms"]), flush=True)
        for r in report[:20]:
            print(r, flush=True)

    out_p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "artifacts", "mar_nan_r5.json")
    os.makedirs(os.path.dirname(out_p), exist_ok=True)
    with open(out_p, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
