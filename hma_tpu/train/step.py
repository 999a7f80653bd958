"""Jitted training step, optimizer and LR schedules.

Mirrors the reference training semantics (hma/train_multi.py):
  - AdamW with two parameter groups: weight decay on everything except
    biases and layer-norm scales (train_multi.py:906-918);
  - LR scaled by min(max(1, effective_batch/64), 8) (train_multi.py:902);
  - "custom_cosine" warmup+cosine decaying to 10% of peak
    (train_multi.py:962-977);
  - gradient clipping by global norm (train_multi.py:593);
  - NaN-loss skip: a non-finite loss zeroes the update instead of
    poisoning the weights (the reference does a dummy backward,
    train_multi.py:572-583).

The step is a single jit'd function over the (dp, fsdp, tp) mesh; the
gradient all-reduce is inserted by XLA from the sharding annotations —
there is no torch-DDP-style wrapper to replicate. Gradient accumulation
on TPU is expressed by scanning microbatches inside the step.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def custom_cosine_schedule(base_lr: float, warmup_steps: int, max_steps: int,
                           end_ratio: float = 0.1) -> optax.Schedule:
    """Linear warmup then cosine decay to end_ratio * peak
    (reference: train_multi.py:962-977)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = (step + 1) / max(warmup_steps, 1)
        remaining = max(max_steps - warmup_steps, 1)
        cos = (1 + jnp.cos(jnp.pi * (step - warmup_steps) / remaining)) / 2
        decay = cos * (1 - end_ratio) + end_ratio
        return base_lr * jnp.where(step < warmup_steps, warm, decay)

    return schedule


def scale_lr_by_batch(lr: float, effective_batch_size: int) -> float:
    """(reference: train_multi.py:902-904)"""
    return lr * min(max(1, effective_batch_size / 64), 8)


def weight_decay_mask(params) -> Any:
    """True where weight decay applies: excludes biases and norm scales
    (reference no_decay = ["bias", "layer_norm.weight"])."""

    def decide(path, _):
        names = [str(getattr(k, "key", k)) for k in path]
        leaf = names[-1]
        if leaf == "bias":
            return False
        if leaf == "scale":  # layer-norm / domain-layer-norm scales
            return False
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def mup_matrix_mask(params, base_shapes=None) -> Any:
    """True for matrix-like params — the ones whose Adam LR scales by
    1/width_mult under muP (mup.MuAdamW; the reference pins base width
    256, st_mask_git.py:755-760).

    With `base_shapes` (a shape pytree of the same model at a *different*
    width) this reproduces mup.set_base_shapes' infshape semantics
    exactly: a dim is "infinite" iff it differs from the base shape, and
    a param is matrix-like iff >= 2 of its dims are infinite. That
    correctly classifies e.g. pos_embed_TSC / action_mask_tokens /
    diffloss internals as vector-like (one or zero width-dependent dims)
    and the STMaskGIT readout (d_model -> fixed factored vocab) as
    vector-like, where any name/ndim heuristic misfires.
    """
    if base_shapes is not None:
        shapes = jax.tree.map(lambda b: tuple(b.shape), base_shapes)
        return jax.tree.map(
            lambda leaf, bs: sum(int(a != b) for a, b in
                                 zip(leaf.shape, bs)) >= 2,
            params, shapes)

    def decide(path, leaf):
        names = [str(getattr(k, "key", k)) for k in path]
        if leaf.ndim < 2 or names[-1] == "bias":
            return False
        if "embed" in ".".join(names) and "token_embed" in ".".join(names):
            return False  # input embeddings are vector-like under muP
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def make_optimizer(learning_rate, weight_decay: float = 0.01,
                   beta1: float = 0.9, beta2: float = 0.999,
                   eps: float = 1e-8, max_grad_norm: float = 1.0,
                   params_template=None,
                   mup_width_mult: Optional[float] = None,
                   mup_base_shapes=None) -> optax.GradientTransformation:
    """AdamW with decay masking; with `mup_width_mult` (= d_model /
    base_d_model), matrix-like params take the MuAdamW rule
    (mup/optim.py semantics): lr /= width_mult and weight_decay *=
    width_mult, so the per-step decay lr*wd is width-invariant while the
    Adam update shrinks 1/width. That's what makes one tuned LR transfer
    across widths."""
    mask = weight_decay_mask(params_template) if params_template is not None else None
    if (mup_width_mult is None or mup_width_mult == 1.0
            or params_template is None):
        return optax.chain(
            optax.clip_by_global_norm(max_grad_norm),
            optax.adamw(learning_rate, b1=beta1, b2=beta2, eps=eps,
                        weight_decay=weight_decay, mask=mask))

    mmask = mup_matrix_mask(params_template, mup_base_shapes)
    labels = jax.tree.map(lambda m: "matrix" if m else "other", mmask)
    if callable(learning_rate):
        matrix_lr = lambda s: learning_rate(s) / mup_width_mult
    else:
        matrix_lr = learning_rate / mup_width_mult
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.multi_transform(
            # matrix partition is all kernels -> decay applies everywhere;
            # "other" gets the decay mask as a callable so it re-derives
            # over the partitioned (MaskedNode-bearing) tree.
            {"matrix": optax.adamw(matrix_lr, b1=beta1, b2=beta2, eps=eps,
                                   weight_decay=weight_decay * mup_width_mult),
             "other": optax.adamw(learning_rate, b1=beta1, b2=beta2, eps=eps,
                                  weight_decay=weight_decay,
                                  mask=weight_decay_mask)},
            labels))


def make_train_step(model, tx: optax.GradientTransformation,
                    *, action_loss_weight: float = 0.5,
                    microbatch: int = 0, continuous: bool = False) -> Callable:
    """Build train_step(state, batch, rng) -> (state, metrics).

    batch: dict with input_ids/labels (B, T, S) int32 (discrete) or
    (B, T, h, w, C) f32 latents + masked_tokens_indicator (continuous),
    optional action_ids (B, T, max_da) f32, domain_id scalar int32.
    If microbatch > 0, the batch is split into B//microbatch chunks and
    gradients are accumulated with lax.scan (manual grad accumulation,
    reference: train_multi.py:561-586). Both model families share this
    one step so accumulation/NaN-skip semantics are identical.
    """

    def loss_fn(params, batch, rng):
        extra = ((batch["masked_tokens_indicator"],) if continuous else ())
        rngs = {"dropout": jax.random.fold_in(rng, 1),
                "action_drop": jax.random.fold_in(rng, 2)}
        if continuous:
            rngs["diffusion"] = rng
        out = model.apply(
            params, batch["input_ids"], batch["labels"],
            batch.get("action_ids"), batch.get("domain_id"), *extra,
            deterministic=False, rngs=rngs)
        loss = out["loss"]
        metrics = {"loss": out["loss"], "acc": out["acc"]}
        if "action_loss" in out:
            loss = loss + action_loss_weight * out["action_loss"]
            metrics["action_loss"] = out["action_loss"]
        return loss, metrics

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def compute_grads(params, batch, rng):
        if microbatch <= 0:
            (loss, metrics), grads = grad_fn(params, batch, rng)
            return grads, metrics

        B = batch["input_ids"].shape[0]
        n_micro = B // microbatch
        array_keys = [k for k, v in batch.items()
                      if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == B]

        def reshape(v):
            return v.reshape(n_micro, microbatch, *v.shape[1:])

        stacked = {k: reshape(batch[k]) for k in array_keys}
        static = {k: v for k, v in batch.items() if k not in array_keys}

        def body(carry, xs):
            grads_acc, metrics_acc = carry
            mb, key = xs
            (loss, metrics), grads = grad_fn(params, {**mb, **static}, key)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            metrics_acc = jax.tree.map(jnp.add, metrics_acc, metrics)
            return (grads_acc, metrics_acc), None

        zeros_g = jax.tree.map(jnp.zeros_like, params)
        mb0 = {k: v[0] for k, v in stacked.items()}
        metrics_shape = jax.eval_shape(
            lambda p, b, r: grad_fn(p, b, r)[0][1], params, {**mb0, **static}, rng)
        zeros_m = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), metrics_shape)
        keys = jax.random.split(rng, n_micro)
        (grads, metrics), _ = jax.lax.scan(body, (zeros_g, zeros_m), (stacked, keys))
        inv = 1.0 / n_micro
        return (jax.tree.map(lambda g: g * inv, grads),
                jax.tree.map(lambda m: m * inv, metrics))

    def train_step(state: TrainState, batch, rng):
        grads, metrics = compute_grads(state.params, batch, rng)
        # NaN guard: skip the update if the loss went non-finite. Zero the
        # grads (opt_state moments still decay, matching the reference's
        # dummy backward) and apply updates scaled by `ok` — one fused
        # multiply-add instead of a separate params-restoring where-pass.
        ok = jnp.isfinite(metrics["loss"])
        ok_f = ok.astype(jnp.float32)
        # where, not multiply: NaN * 0 = NaN would leak through the guard
        grads = jax.tree.map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(
            lambda p, u: p + u * ok_f.astype(u.dtype), state.params, updates)
        metrics["skipped"] = 1.0 - ok_f
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_eval_step(model, *, action_loss_weight: float = 0.5,
                   continuous: bool = False) -> Callable:
    """Jittable teacher-forced eval step for either model family; rng is
    threaded so the continuous model's diffusion-timestep draws differ
    across eval batches (reference: train_multi.py:641-728)."""

    def eval_step(params, batch, rng):
        extra = ((batch["masked_tokens_indicator"],) if continuous else ())
        rngs = {"action_drop": jax.random.fold_in(rng, 1)}
        if continuous:
            rngs["diffusion"] = rng
        out = model.apply(params, batch["input_ids"], batch["labels"],
                          batch.get("action_ids"), batch.get("domain_id"),
                          *extra, deterministic=True, rngs=rngs)
        metrics = {"loss": out["loss"], "acc": out["acc"],
                   "perplexity": jnp.exp(out["loss"])}
        if "action_loss" in out:
            metrics["action_loss"] = out["action_loss"]
        return metrics
    return eval_step
