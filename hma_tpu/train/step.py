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

import functools
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


def _adamw_core(learning_rate, weight_decay, beta1, beta2, eps,
                params_template, mup_width_mult, mup_base_shapes,
                moment_dtype=None):
    """The AdamW part of the optimizer, WITHOUT the global-norm clip (so
    the sliced-domain optimizer can apply one clip over dense+sliced).

    `moment_dtype` (e.g. jnp.bfloat16) stores Adam m/v low-precision with
    stochastic rounding (train/lowp.py); None keeps the fp32 optax path.
    """

    def adamw(lr, wd, mask):
        if moment_dtype is None:
            return optax.adamw(lr, b1=beta1, b2=beta2, eps=eps,
                               weight_decay=wd, mask=mask)
        from hma_tpu.train.lowp import adamw_lowp
        return adamw_lowp(lr, b1=beta1, b2=beta2, eps=eps, weight_decay=wd,
                          mask=mask, moment_dtype=moment_dtype)

    mask = weight_decay_mask(params_template) if params_template is not None else None
    if (mup_width_mult is None or mup_width_mult == 1.0
            or params_template is None):
        return adamw(learning_rate, weight_decay, mask)

    mmask = mup_matrix_mask(params_template, mup_base_shapes)
    labels = jax.tree.map(lambda m: "matrix" if m else "other", mmask)
    if callable(learning_rate):
        matrix_lr = lambda s: learning_rate(s) / mup_width_mult
    else:
        matrix_lr = learning_rate / mup_width_mult
    return optax.multi_transform(
        # matrix partition is all kernels -> decay applies everywhere;
        # "other" gets the decay mask as a callable so it re-derives
        # over the partitioned (MaskedNode-bearing) tree.
        {"matrix": adamw(matrix_lr, weight_decay * mup_width_mult, None),
         "other": adamw(learning_rate, weight_decay, weight_decay_mask)},
        labels)


def make_optimizer(learning_rate, weight_decay: float = 0.01,
                   beta1: float = 0.9, beta2: float = 0.999,
                   eps: float = 1e-8, max_grad_norm: float = 1.0,
                   params_template=None,
                   mup_width_mult: Optional[float] = None,
                   mup_base_shapes=None,
                   moment_dtype=None) -> optax.GradientTransformation:
    """AdamW with decay masking; with `mup_width_mult` (= d_model /
    base_d_model), matrix-like params take the MuAdamW rule
    (mup/optim.py semantics): lr /= width_mult and weight_decay *=
    width_mult, so the per-step decay lr*wd is width-invariant while the
    Adam update shrinks 1/width. That's what makes one tuned LR transfer
    across widths. `moment_dtype=jnp.bfloat16` stores m/v in bf16 with
    stochastic rounding (halves optimizer HBM; see train/lowp.py)."""
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        _adamw_core(learning_rate, weight_decay, beta1, beta2, eps,
                    params_template, mup_width_mult, mup_base_shapes,
                    moment_dtype))


# ---------------------------------------------------------------------------
# Domain-sliced AdamW
# ---------------------------------------------------------------------------

class SlicedAdamState(NamedTuple):
    dense: Any       # inner optax state over the shared (non-stacked) leaves
    m: Any           # first moments, full stacked shapes
    v: Any           # second moments, full stacked shapes
    count: jax.Array   # (num_domains,) int32 — per-domain Adam steps
    gcount: jax.Array  # () int32 — global steps, drives the LR schedule


class DomainSlicedOptimizer(NamedTuple):
    """AdamW that updates only the active domain's slice of the
    domain-stacked parameter tables (~90% of the flagship's params live in
    (num_domains, ...) stacks, of which one slice has nonzero grads per
    step).

    Semantics match the torch reference more closely than a dense AdamW:
    per-domain ModuleDicts leave unused domains' p.grad = None, which
    torch AdamW *skips* — no moment decay, no weight decay, no step-count
    increment (hma/train_multi.py builds one AdamW over all per-domain
    modules). The dense optax update instead kept applying stale momentum
    and decay to the 39 inactive domains every step. Bias correction uses
    a per-domain step count, exactly like torch's per-param `step`; the
    LR schedule uses the global step, like torch's scheduler.

    Also a large HBM win: the optimizer pass reads/writes the active
    slice only (~1.3 GB/step instead of ~10.5 GB on the 375M flagship).
    """
    init: Callable[[Any], SlicedAdamState]
    # (grads, state, params, domain_id, ok) ->
    #     (new_params, new_state, grad_norm)
    update_and_apply: Callable


def domain_stacked_mask(params_template, params_template_other) -> Any:
    """True for leaves that are domain-stacked, decided structurally: the
    same model `eval_shape`'d at a different num_domains changes exactly
    the stacked leaves' shapes. Exact for any config (no leading-dim
    heuristic that could collide with T/S/d_model)."""
    return jax.tree.map(lambda a, b: tuple(a.shape) != tuple(b.shape),
                        params_template, params_template_other)


def _prune(mask, tree, keep: bool):
    """Replace leaves where mask != keep with None (empty subtrees), so
    paths of the surviving leaves are preserved for path-based masks."""
    return jax.tree.map(lambda m, x: x if m == keep else None, mask, tree)


def _combine(mask, dense_tree, stacked_tree):
    mask_leaves, treedef = jax.tree.flatten(mask)
    it_d = iter(jax.tree.leaves(dense_tree))
    it_s = iter(jax.tree.leaves(stacked_tree))
    return jax.tree.unflatten(
        treedef, [next(it_s) if m else next(it_d) for m in mask_leaves])


def make_domain_sliced_optimizer(
        learning_rate, weight_decay: float = 0.01,
        beta1: float = 0.9, beta2: float = 0.999,
        eps: float = 1e-8, max_grad_norm: float = 1.0,
        *, params_template, stacked_mask, num_domains: int,
        mup_width_mult: Optional[float] = None,
        mup_base_shapes=None,
        moment_dtype=None) -> DomainSlicedOptimizer:
    """Build the sliced-domain AdamW. `stacked_mask` comes from
    `domain_stacked_mask`; dense (shared) leaves get the standard
    `_adamw_core` chain, stacked leaves get the manual sliced update.

    `moment_dtype=jnp.bfloat16` stores m/v (stacked AND dense) in bf16
    with stochastic rounding on write, fp32 math (train/lowp.py) —
    halves the resident optimizer state, which is what fits the
    40-domain d512 1B-class card on a single v5e chip."""
    dense_template = _prune(stacked_mask, params_template, False)
    stacked_template = _prune(stacked_mask, params_template, True)
    dense_base = (None if mup_base_shapes is None
                  else _prune(stacked_mask, mup_base_shapes, False))
    inner = _adamw_core(learning_rate, weight_decay, beta1, beta2, eps,
                        dense_template, mup_width_mult, dense_base,
                        moment_dtype)
    m_dtype = moment_dtype  # None -> match param dtype (fp32 path)

    # Per-stacked-leaf effective lr multiplier / weight decay under muP.
    wd_mask = weight_decay_mask(stacked_template)
    if mup_width_mult is not None and mup_width_mult != 1.0:
        mmask = mup_matrix_mask(stacked_template,
                                _prune(stacked_mask, mup_base_shapes, True)
                                if mup_base_shapes is not None else None)
        lr_mult = jax.tree.map(
            lambda m: 1.0 / mup_width_mult if m else 1.0, mmask)
        wd_leaf = jax.tree.map(
            lambda m, w: (weight_decay * mup_width_mult if m
                          else (weight_decay if w else 0.0)), mmask, wd_mask)
    else:
        lr_mult = jax.tree.map(lambda _: 1.0, wd_mask)
        wd_leaf = jax.tree.map(
            lambda w: weight_decay if w else 0.0, wd_mask)

    def init(params) -> SlicedAdamState:
        stacked = _prune(stacked_mask, params, True)
        zeros = (jnp.zeros_like if m_dtype is None
                 else (lambda p: jnp.zeros(jnp.shape(p), m_dtype)))
        return SlicedAdamState(
            dense=inner.init(_prune(stacked_mask, params, False)),
            m=jax.tree.map(zeros, stacked),
            v=jax.tree.map(zeros, stacked),
            count=jnp.zeros((num_domains,), jnp.int32),
            gcount=jnp.zeros((), jnp.int32))

    def update_and_apply(grads, state: SlicedAdamState, params, domain_id,
                         ok: jax.Array):
        dense_g = _prune(stacked_mask, grads, False)
        stacked_g = _prune(stacked_mask, grads, True)
        dense_p = _prune(stacked_mask, params, False)
        stacked_p = _prune(stacked_mask, params, True)

        d = jnp.asarray(domain_id, jnp.int32)
        take = functools.partial(jax.lax.dynamic_index_in_dim,
                                 index=d, axis=0, keepdims=False)
        # Grads may arrive pre-sliced to one row (sliced-gradient step,
        # make_train_step(stacked_mask=...)): leading axis 1 means "the
        # active domain's row", so index 0. With num_domains == 1 the two
        # cases coincide (d must be 0). Param/moment leaves stay full.
        g_slices = jax.tree.map(
            lambda g: jax.lax.index_in_dim(g, 0, axis=0, keepdims=False)
            if g.shape[0] == 1 and num_domains != 1 else take(g), stacked_g)

        # Global grad norm over dense grads + the active slices — equal to
        # the full-tree norm (inactive slices are exactly zero) without
        # reading the ~1.3 GB of zeros. Clip formula matches
        # optax.clip_by_global_norm.
        sq = sum(jnp.sum(jnp.square(g)) for g in
                 jax.tree.leaves(dense_g) + jax.tree.leaves(g_slices))
        g_norm = jnp.sqrt(sq)
        scale = jnp.where(g_norm < max_grad_norm, 1.0,
                          max_grad_norm / jnp.maximum(g_norm, 1e-20))

        # NaN/inf guard, part 2: a finite loss does not imply finite grads
        # (backward-only overflow). Fold grad finiteness into `ok` and
        # zero the grads on a skipped step (where, not multiply — NaN*0 is
        # NaN), so the m/v moment update below only decays instead of
        # permanently absorbing a NaN. The caller recomputes the combined
        # ok from the returned g_norm for its skip metric.
        ok = jnp.logical_and(ok, jnp.isfinite(g_norm))
        dense_g = jax.tree.map(
            lambda g: jnp.where(ok, g * scale.astype(g.dtype),
                                jnp.zeros_like(g)), dense_g)
        g_slices = jax.tree.map(
            lambda g: jnp.where(ok, g * scale.astype(g.dtype),
                                jnp.zeros_like(g)), g_slices)

        updates, new_dense = inner.update(dense_g, state.dense, dense_p)
        ok_f = ok.astype(jnp.float32)
        new_dense_p = jax.tree.map(
            lambda p, u: p + u * ok_f.astype(u.dtype), dense_p, updates)

        c_d = state.count[d] + 1
        lr_t = (learning_rate(state.gcount) if callable(learning_rate)
                else jnp.asarray(learning_rate, jnp.float32))
        bc1 = 1.0 - beta1 ** c_d.astype(jnp.float32)
        bc2 = 1.0 - beta2 ** c_d.astype(jnp.float32)

        if m_dtype is not None:
            from hma_tpu.train.lowp import _leaf_keys, stochastic_round
            srbase = jax.random.fold_in(jax.random.PRNGKey(0x51AD),
                                        state.gcount)
            mkeys = _leaf_keys(jax.random.fold_in(srbase, 0), stacked_p)
            vkeys = _leaf_keys(jax.random.fold_in(srbase, 1), stacked_p)
        else:
            # dummy key tree so upd_leaf's signature is uniform
            mkeys = jax.tree.map(lambda _: 0, stacked_p)
            vkeys = mkeys

        def upd_leaf(p, g_d, m, v, lmul, wd, mk, vk):
            # moments may be stored low-precision: math in fp32
            # (upcast-on-read), stochastic round on write (train/lowp.py)
            m_d = beta1 * take(m).astype(jnp.float32) + (1.0 - beta1) * g_d
            v_d = (beta2 * take(v).astype(jnp.float32)
                   + (1.0 - beta2) * jnp.square(g_d))
            mhat = m_d / bc1
            vhat = v_d / bc2
            step_d = mhat / (jnp.sqrt(vhat) + eps) + wd * take(p)
            p_d = take(p) - (lr_t * lmul * ok_f) * step_d
            put = lambda full, sl: jax.lax.dynamic_update_index_in_dim(
                full, sl, d, axis=0)
            if m_dtype is not None:
                m_d = stochastic_round(m_d, m_dtype, mk)
                v_d = stochastic_round(v_d, m_dtype, vk)
            # Barrier between the row compute (which READS take(p/m/v))
            # and the scatter WRITES of the same buffers. Without it XLA
            # fuses read+compute+DUS into one kernel, which makes the
            # in-place update illegal (same buffer read and written inside
            # one fusion), and copy-insertion falls back to materializing
            # a full fresh copy of every stacked table: ~4 GB of 40 MB
            # copy temps on the 40-domain d512 card — the difference
            # between the 1B-class card fitting one 16 GB chip (11.3 GB
            # donated state) and an 18 GB compile-time OOM. The barrier
            # costs three row-sized (~1 MB) materializations per table.
            p_d, m_d, v_d = jax.lax.optimization_barrier((p_d, m_d, v_d))
            return put(p, p_d), put(m, m_d), put(v, v_d)

        out = jax.tree.map(upd_leaf, stacked_p, g_slices, state.m, state.v,
                           lr_mult, wd_leaf, mkeys, vkeys)
        # out is a tree of 3-tuples; transpose into three trees
        outer = jax.tree.structure(stacked_p)
        new_stacked_p = jax.tree.unflatten(
            outer, [t[0] for t in jax.tree.leaves(out, is_leaf=lambda x: isinstance(x, tuple))])
        new_m = jax.tree.unflatten(
            outer, [t[1] for t in jax.tree.leaves(out, is_leaf=lambda x: isinstance(x, tuple))])
        new_v = jax.tree.unflatten(
            outer, [t[2] for t in jax.tree.leaves(out, is_leaf=lambda x: isinstance(x, tuple))])

        new_params = _combine(stacked_mask, new_dense_p, new_stacked_p)
        new_state = SlicedAdamState(
            dense=new_dense, m=new_m, v=new_v,
            count=state.count.at[d].add(1),
            gcount=state.gcount + 1)
        return new_params, new_state, g_norm

    return DomainSlicedOptimizer(init=init, update_and_apply=update_and_apply)


def make_train_step(model, tx: optax.GradientTransformation,
                    *, action_loss_weight: float = 0.5,
                    microbatch: int = 0, continuous: bool = False,
                    stacked_mask=None) -> Callable:
    """Build train_step(state, batch, rng) -> (state, metrics).

    batch: dict with input_ids/labels (B, T, S) int32 (discrete) or
    (B, T, h, w, C) f32 latents + masked_tokens_indicator (continuous),
    optional action_ids (B, T, max_da) f32, domain_id scalar int32.
    If microbatch > 0, the batch is split into B//microbatch chunks and
    gradients are accumulated with lax.scan (manual grad accumulation,
    reference: train_multi.py:561-586). Both model families share this
    one step so accumulation/NaN-skip semantics are identical.

    `stacked_mask` (from `domain_stacked_mask`) turns on SLICED
    GRADIENTS: the active domain's row is dynamic-sliced out of every
    stacked param table BEFORE jax.grad, so the backward computes
    gradients for one domain row instead of scatter-adding into
    num_domains rows of zeros — exact (inactive rows' grads are
    identically zero, so even the global-norm clip is unchanged) and it
    removes the full-size fp32 grad tree from peak HBM, which is what
    lets the 40-domain d512 1B-class card train on one chip alongside
    bf16 moments. Requires `model` built with single_domain_params=True
    and `tx` a DomainSlicedOptimizer (params/moments stay full-size; only
    the grad tree is sliced).
    """
    if stacked_mask is not None:
        if not isinstance(tx, DomainSlicedOptimizer):
            raise ValueError("sliced gradients need the domain-sliced "
                             "optimizer (make_domain_sliced_optimizer)")
        if not getattr(model, "single_domain_params", False):
            raise ValueError("sliced gradients need the model built with "
                             "single_domain_params=True")

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

    sliced = isinstance(tx, DomainSlicedOptimizer)

    def train_step(state: TrainState, batch, rng):
        if stacked_mask is not None:
            d = jnp.asarray(batch["domain_id"], jnp.int32)
            loss_params = jax.tree.map(
                lambda m, p: jax.lax.dynamic_slice_in_dim(p, d, 1, axis=0)
                if m else p, stacked_mask, state.params)
        else:
            loss_params = state.params
        grads, metrics = compute_grads(loss_params, batch, rng)
        # NaN guard: skip the update if the loss OR any gradient went
        # non-finite. Guarding on the loss alone is not enough — a step
        # whose forward is finite but whose backward overflows (e.g. the
        # VB term's exp() at large learned-variance logits) would send NaN
        # grads through clip_by_global_norm (NaN norm → NaN scale → every
        # update NaN) and poison params + Adam moments permanently. Zero
        # the grads (opt_state moments still decay, matching the
        # reference's dummy backward) and apply updates scaled by `ok` —
        # one fused multiply-add instead of a params-restoring where-pass.
        ok_loss = jnp.isfinite(metrics["loss"])
        if sliced:
            # update_and_apply folds isfinite(g_norm) into the guard itself
            # (its norm covers every leaf that can carry a NaN: dense grads
            # + the active domain's slices; inactive slices are exactly
            # zero) and zeroes the grads internally before the moment
            # update, so neither params nor m/v can be poisoned.
            params, opt_state, g_norm = tx.update_and_apply(
                grads, state.opt_state, state.params,
                batch["domain_id"], ok_loss)
            ok = jnp.logical_and(ok_loss, jnp.isfinite(g_norm))
        else:
            g_norm = optax.global_norm(grads)
            ok = jnp.logical_and(ok_loss, jnp.isfinite(g_norm))
            # where, not multiply: NaN * 0 = NaN would leak through
            grads = jax.tree.map(
                lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            ok_f = ok.astype(jnp.float32)
            params = jax.tree.map(
                lambda p, u: p + u * ok_f.astype(u.dtype), state.params, updates)
        metrics["grad_norm"] = g_norm
        metrics["skipped"] = 1.0 - ok.astype(jnp.float32)
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
