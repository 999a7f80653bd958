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
        # gradients (mirrors make_train_step.loss_fn). Free the dense
        # fp32 Adam moments first and reduce the report to two stacked
        # scalar vectors inside jit — the first draft OOMed holding
        # opt_state + the full grad tree + per-leaf host pulls.
        bad_params = state.params
        del state
        # persist the blowup state so follow-up forensics (activation
        # scans, fix A/Bs) don't pay the 278-step retrain
        dump = os.environ.get("HMA_TPU_NAN_DUMP", "/tmp/mar_nan_state.npz")
        if dump:
            flat = {
                "/".join(str(getattr(k, "key", k)) for k in path):
                    np.asarray(leaf)
                for path, leaf in
                jax.tree_util.tree_leaves_with_path(bad_params)}
            np.savez(dump, __bad_step__=np.asarray(bad_step), **flat)
            print(f"dumped blowup state -> {dump}", flush=True)

        def loss_fn(p, key, w_img=1.0, w_act=0.5):
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
            # static weights + Python branches: a zero-weight term must be
            # absent from the jaxpr entirely (0.0 * NaN = NaN — XLA keeps
            # NaN semantics, so multiplying by zero would not isolate it)
            loss = w_img * out["loss"] if w_img else jnp.zeros(())
            if w_act and "action_loss" in out:
                loss = loss + w_act * out["action_loss"]
            return loss, out

        from functools import partial

        @partial(jax.jit, static_argnums=(2, 3))
        def leaf_stats(p, key, w_img, w_act):
            grads, out = jax.grad(loss_fn, has_aux=True)(p, key, w_img, w_act)
            leaves = jax.tree_util.tree_leaves(grads)
            bad = jnp.stack([jnp.sum(~jnp.isfinite(g.astype(jnp.float32)))
                             for g in leaves])
            mx = jnp.stack([jnp.max(jnp.where(jnp.isfinite(g), jnp.abs(g),
                                              0.0).astype(jnp.float32))
                            for g in leaves])
            scalars = {k: v for k, v in out.items()
                       if getattr(v, "ndim", 1) == 0}
            return bad, mx, scalars

        paths = [
            "/".join(str(getattr(k, "key", k)) for k in path)
            for path, _ in jax.tree_util.tree_leaves_with_path(
                jax.eval_shape(lambda p: p, bad_params))]
        sizes = [int(l.size) for l in jax.tree_util.tree_leaves(bad_params)]
        rec["total_leaves"] = len(paths)
        # per-term backward: which loss term's backward detonates, and
        # the clean/bad leaf boundary for each
        for term, (wi, wa) in (("image_diffloss", (1.0, 0.0)),
                               ("action_diffloss", (0.0, 1.0))):
            bad_v, mx_v, out = leaf_stats(bad_params, bad_key, wi, wa)
            bad_v, mx_v = np.asarray(bad_v), np.asarray(mx_v)
            report = [{"leaf": n, "nonfinite": int(b), "size": s,
                       "max_finite": float(m)}
                      for n, b, s, m in zip(paths, bad_v, sizes, mx_v)]
            nbad = sum(1 for r in report if r["nonfinite"])
            rec[term] = {
                "out_terms": {k: float(v) for k, v in out.items()},
                "bad_leaves": nbad,
                "partial_leaves": [r for r in report
                                   if 0 < r["nonfinite"] < r["size"]][:40],
                "clean_leaves": [r["leaf"] for r in report
                                 if not r["nonfinite"]][:80],
                "worst": sorted((r for r in report if r["nonfinite"]),
                                key=lambda r: -r["nonfinite"])[:24],
            }
            print(f"{term}: bad={nbad}/{len(paths)} "
                  f"out={rec[term]['out_terms']}", flush=True)
            for r in rec[term]["partial_leaves"][:10]:
                print(" partial:", r, flush=True)
            for n in rec[term]["clean_leaves"][:15]:
                print(" clean:", n, flush=True)

    out_p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "artifacts", "mar_nan_r5.json")
    os.makedirs(os.path.dirname(out_p), exist_ok=True)
    with open(out_p, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
