"""Continuous-family convergence probe: overfit ONE batch of latents on
the real chip with the EXACT production STMAR stack bench.py times.

Counterpart of experiments/overfit_probe.py (discrete 362M flagship) for
the continuous family — the reference's de-facto convergence smoke
(`--overfit_first_batch`, hma/train_multi.py:238-244) applies to both
families. Config: the d512 mar card (8 domains — the one-chip training
config; see bench.py), remat=False + dense AdamW (the measured-fastest
step, PROFILE_r3.md "MAR train-step profile"), bf16 activations,
mlp_drop=0.05 live (deterministic=False — the production objective).

Masking is re-sampled per step inside jit with the feature collator's
exact schedule (hma_tpu/data/collators.py:106-121, reference
hma/data.py:103): first_masked_frame=1, mask_prob =
cos((u*(1-min)+min)*pi/2) per (example, frame). (The collator's
resample-while-empty loop is omitted: at (8, 11, 8, 8) and min=0.1 an
all-empty mask has probability ~0.)

Why the diffusion loss CAN converge to ~0 here: with x0 memorized, eps
= (x_t - sqrt(abar_t) x0) / sqrt(1 - abar_t) is exactly recoverable
from (x_t, t, z), so the eps-MSE floor of a perfectly fit conditional
is 0 (unlike the discrete family's label-smoothing floor). Convergence
is judged on a FIXED-mask, fixed-rng eval loss (make_eval_step,
deterministic — no dropout noise in the criterion); the training curve
is logged alongside.

Then the proof the whole pipeline learned: a KV-cached MAR rollout
(16 maskgit x 100 denoise, greedy-free sampling) from a 2-frame prompt
must reproduce the training latents — reported as rollout latent MSE
relative to the latent variance (~1.0 for the N(0,1) probe batch), vs
the same ratio for the fresh-init model.

Writes a loss curve + summary to experiments/artifacts/mar_overfit_r5.json
and one JSON line to stdout / /tmp/mar_overfit_probe.jsonl.

Run: python experiments/mar_overfit_probe.py [--lr 1e-4] [--max-steps 5000]
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


def run_overfit(lr: float = 1e-4, wd: float = 0.0, max_steps: int = 5000,
                target_loss: float = 0.05, batch: int = 8,
                log_every: int = 50, num_domains: int = 8,
                skip_rollout_check: bool = False) -> dict:
    """The probe body, importable by bench.py (its `detail.mar.overfit`
    section) with identical shapes/HLO so compile-cache entries are
    shared. skip_rollout_check drops the rollout-reproduces-the-batch
    stage (one extra large compile) for the bench context."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/hma_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mar_probe import _config, _data

    from hma_tpu.models.st_mar import STMAR
    from hma_tpu.rollout.mar import generate_latents
    from hma_tpu.train.step import (TrainState, make_eval_step,
                                    make_optimizer, make_train_step)

    cfg = _config(num_domains)
    model = STMAR(cfg, remat=False)
    B = batch
    lat, mask0, actions, dom = _data(cfg, B)
    n_tail = cfg.T - 1

    params = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "action_drop": jax.random.PRNGKey(2)}, lat, lat, actions, dom, mask0)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    tx = make_optimizer(lr, weight_decay=wd, params_template=params)
    inner_step = make_train_step(model, tx, continuous=True)
    eval_step = jax.jit(make_eval_step(model, continuous=True))

    mmin = cfg.dataloader_mask_ratio_min

    def step_with_collate(state, key):
        """Resample the mask (feature-collator cosine schedule) + one
        train step, all inside one jit."""
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

    eval_batch = {"input_ids": lat, "labels": lat, "action_ids": actions,
                  "domain_id": dom, "masked_tokens_indicator": mask0}
    eval_key = jax.random.PRNGKey(7)

    state = TrainState(params, tx.init(params), jnp.asarray(0))

    t0 = time.perf_counter()
    state, m = step(state, jax.random.PRNGKey(1))
    em = eval_step(state.params, eval_batch, eval_key)
    init_eval = float(em["loss"])
    compile_s = time.perf_counter() - t0
    print(f"compiled in {compile_s:.1f}s; params={n_params/1e6:.1f}M; "
          f"init eval loss {init_eval:.4f}", flush=True)

    curve = []
    final_train, final_eval, steps_done = None, None, 0
    # device-side lazy accumulator: counts NaN-guard skips without a
    # per-step host sync (the 2026-08-19 run showed the production config
    # CAN emit finite-loss/NaN-grad steps through the VB term's backward;
    # the train-step guard now skips them — this tracks how often).
    skip_acc = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for i in range(2, max_steps + 1):
        state, m = step(state, jax.random.PRNGKey(i))
        skip_acc = skip_acc + m["skipped"]
        if i % log_every == 0 or i == max_steps:
            em = eval_step(state.params, eval_batch, eval_key)
            tr, ev = float(m["loss"]), float(em["loss"])
            act = float(em.get("action_loss", jnp.nan))
            gn, sk = float(m["grad_norm"]), float(skip_acc)
            curve.append({"step": i, "train_loss": round(tr, 5),
                          "eval_loss": round(ev, 5),
                          "eval_action_loss": round(act, 5),
                          "grad_norm": round(gn, 4),
                          "skipped_total": int(sk)})
            print(f"step {i}: train={tr:.4f} eval={ev:.4f} action={act:.4f}"
                  f" gnorm={gn:.3f} skipped={int(sk)}"
                  f" ({time.perf_counter()-t0:.0f}s)", flush=True)
            final_train, final_eval, steps_done = tr, ev, i
            if ev < target_loss:
                break
    train_s = time.perf_counter() - t0
    total_skipped = int(float(skip_acc))

    rec = {
        "probe": "mar_overfit_one_batch_d512",
        "params_M": round(n_params / 1e6, 1),
        "lr": lr,
        "weight_decay": wd,
        "batch": B,
        "steps": steps_done,
        "init_eval_loss": round(init_eval, 4),
        "final_train_loss": final_train,
        "final_eval_loss": final_eval,
        "steps_skipped_by_nan_guard": total_skipped,
        "converged": bool(final_eval is not None
                          and final_eval < target_loss),
        "compile_s": round(compile_s, 1),
        "train_s": round(train_s, 1),
        "curve": curve,
    }
    if skip_rollout_check:
        return rec

    # --- rollout check: reproduce the training latents from a 2-frame
    # prompt, production inference numerics (bf16 params). Free the
    # dense fp32 Adam moments FIRST and sequence the two rollouts so
    # only one fp32 param tree is ever resident — with the full train
    # state still alive the first attempt died with a TPU allocator
    # error at the bf16 cast (~7 GB state + 2.3 GB init params + KV
    # caches on the 16 GB chip).
    num_prompt = 2
    tgt = np.asarray(lat)[:, num_prompt:]
    var = float(np.var(tgt))

    def rollout_rel_mse(p):
        p16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
        out = generate_latents(model, p16, lat, num_prompt, actions, dom,
                               jax.random.PRNGKey(0),
                               maskgit_steps=cfg.maskgit_steps)
        mse = float(np.mean((np.asarray(out)[:, num_prompt:] - tgt) ** 2))
        return mse / var

    try:
        trained = state.params
        del state, step, inner_step, tx
        params = None
        rel = rollout_rel_mse(trained)
        del trained
        # fresh-init baseline: regenerate deterministically (same seed
        # as the training init) rather than holding it through training
        fresh = model.init(
            {"params": jax.random.PRNGKey(0),
             "diffusion": jax.random.PRNGKey(1),
             "action_drop": jax.random.PRNGKey(2)}, lat, lat, actions,
            dom, mask0)
        rel_fresh = rollout_rel_mse(fresh)
        del fresh
        print(f"rollout latent MSE / var: overfit {rel:.4f} vs fresh-init "
              f"{rel_fresh:.4f}", flush=True)
        rec["rollout_rel_mse"] = round(rel, 4)
        rec["rollout_rel_mse_fresh_init"] = round(rel_fresh, 4)
    except Exception:
        import traceback

        rec["rollout_error"] = traceback.format_exc(limit=2)
    return rec


def main():
    ap = argparse.ArgumentParser()
    # trainer-default lr: 3e-4 detonates this card at step ~278 via the
    # reference-inherited temporal-attention runaway (mar_nan_probe.py)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--wd", type=float, default=0.0)
    ap.add_argument("--max-steps", type=int, default=5000)
    ap.add_argument("--target-loss", type=float, default=0.05)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--num-domains", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts",
        "mar_overfit_r5.json"))
    args = ap.parse_args()

    rec = run_overfit(lr=args.lr, wd=args.wd, max_steps=args.max_steps,
                      target_loss=args.target_loss, batch=args.batch,
                      log_every=args.log_every,
                      num_domains=args.num_domains)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    line = {k: v for k, v in rec.items() if k != "curve"}
    print(json.dumps(line), flush=True)
    with open("/tmp/mar_overfit_probe.jsonl", "a") as f:
        f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
