"""Jitted MaskGIT rollout engine with temporal KV caching.

The reference rolls out frame-by-frame, recomputing the full T-frame
transformer stack on every MaskGIT refinement step —
(T - prompt) * maskgit_steps full forwards per window
(reference: hma/generate.py:157-172, hma/model/st_mask_git.py:337-467).

Here each refinement step runs a *single-frame* forward against the
temporal KV cache (exact: spatial attention is per-frame, temporal
attention is causal), and the whole rollout is one compiled XLA program
structured as lax.scan over frames and over MaskGIT steps, so the
32-layer stack is traced once — not (T * steps) times — keeping both
compile time and HLO size flat in T.

Sampling semantics match the reference: per-factor greedy argmax when
temperature ~ 0 (bit-exact), else categorical sampling; re-masking keeps
the n least-confident tokens masked per the cosine schedule, with
"random" (default) or "greedy" confidence ordering
(reference: st_mask_git.py:387-453).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hma_tpu.models.schedules import maskgit_mask_counts
from hma_tpu.models.st_mask_git import STMaskGIT


def _sample_factored(logits_SNF: jax.Array, key: jax.Array, temperature: float,
                     factored_vocab_size: int):
    """Sample token ids and confidences from factored logits.

    logits_SNF: (B, S, nv, fv) fp32. Returns (ids (B,S) int32,
    confidence (B,S) f32 = prod over factors of the sampled prob).
    Factors combine as sum_k id_k * fv**k (reference: st_mask_git.py:408-420).
    """
    B, S, nv, fv = logits_SNF.shape
    probs = jax.nn.softmax(logits_SNF, axis=-1)
    if temperature <= 1e-8:
        samples = jnp.argmax(probs, axis=-1)  # (B, S, nv)
    else:
        keys = jax.random.split(key, nv)
        samples = jnp.stack(
            [jax.random.categorical(keys[k], logits_SNF[..., k, :] / temperature, axis=-1)
             for k in range(nv)], axis=-1)
    conf = jnp.take_along_axis(probs, samples[..., None], axis=-1)[..., 0]
    confidence = jnp.prod(conf, axis=-1)
    powers = factored_vocab_size ** jnp.arange(nv, dtype=jnp.int32)
    ids = jnp.sum(samples.astype(jnp.int32) * powers, axis=-1)
    return ids, confidence


def _mask_lowest(conf: jax.Array, n) -> jax.Array:
    """Boolean (B, S) mask selecting EXACTLY the n smallest-confidence
    entries, ties broken by index (stable rank), so saturated softmaxes
    with exact ties cannot over-mask — preserving the bit-exactness
    contract. n may be a traced scalar (rank compare, no boolean shapes).
    """
    n = jnp.asarray(n, jnp.int32)
    order = jnp.argsort(conf, axis=1, stable=True)
    ranks = jnp.argsort(order, axis=1, stable=True)
    return ranks < n


def _maskgit_refine(model: STMaskGIT, params, tokens_t, t, k_cache, v_cache,
                    action_ids, domain_id, key, *, maskgit_steps: int,
                    temperature: float, unmask_mode: str):
    """Scan over MaskGIT refinement steps for frame t. Caches are read-only.

    Returns (final_tokens (B,S), orig_logits (B,S,nv,fv))."""
    cfg = model.config
    B, S = tokens_t.shape
    ns = jnp.asarray(maskgit_mask_counts(maskgit_steps, S), jnp.int32)
    unmasked0 = tokens_t != model.mask_token_id
    orig0 = jnp.zeros((B, S, cfg.num_factored_vocabs, cfg.factored_vocab_size), jnp.float32)

    def step_body(carry, xs):
        tokens_t, unmasked, orig_logits = carry
        n, step_idx, key = xs
        logits, _, _ = model.apply(params, tokens_t, t, k_cache, v_cache,
                                   action_ids, domain_id,
                                   update_cache=False,
                                   method=STMaskGIT.frame_logits)
        orig_logits = jnp.where(step_idx == 0, logits, orig_logits)
        k_samp, k_conf = jax.random.split(key)
        samples, confidence = _sample_factored(logits, k_samp, temperature,
                                               cfg.factored_vocab_size)
        if unmask_mode == "greedy":
            conf = confidence
        elif unmask_mode == "random":
            conf = jax.random.uniform(k_conf, confidence.shape)
        else:
            raise NotImplementedError(unmask_mode)
        conf = jnp.where(unmasked, jnp.inf, conf)
        lowest = _mask_lowest(conf, n)  # empty when n == 0 (final step)
        prev_unmasked = unmasked
        unmasked = jnp.where(n > 0, unmasked | ~lowest, jnp.ones_like(unmasked))
        samples = jnp.where(lowest, model.mask_token_id, samples)
        samples = jnp.where(prev_unmasked, tokens_t, samples)
        return (samples, unmasked, orig_logits), None

    keys = jax.random.split(key, maskgit_steps)
    steps = jnp.arange(maskgit_steps)
    (tokens_t, _, orig_logits), _ = jax.lax.scan(
        step_body, (tokens_t, unmasked0, orig0), (ns, steps, keys))
    return tokens_t, orig_logits


def generate_frame(model: STMaskGIT, params, tokens_t, t, k_cache, v_cache,
                   action_ids, domain_id, key, *, maskgit_steps: int,
                   temperature: float = 0.0, unmask_mode: str = "random"):
    """MaskGIT-decode a single (fully or partially masked) frame t.

    Returns (final_tokens (B,S), orig_logits (B,S,nv,fv), k_cache, v_cache)
    with the caches filled from the *final* sampled tokens.
    """
    tokens_t, orig_logits = _maskgit_refine(
        model, params, tokens_t, t, k_cache, v_cache, action_ids, domain_id,
        key, maskgit_steps=maskgit_steps, temperature=temperature,
        unmask_mode=unmask_mode)
    # Cache-fill pass with the finalized frame so later frames attend to it.
    _, k_cache, v_cache = model.apply(params, tokens_t, t, k_cache, v_cache,
                                      action_ids, domain_id,
                                      method=STMaskGIT.frame_logits)
    return tokens_t, orig_logits, k_cache, v_cache


def _prefill(model: STMaskGIT, params, tokens_TS, k_cache, v_cache,
             action_ids, domain_id, num_frames: int):
    """Fill the temporal KV caches from ground-truth frames [0, num_frames)."""

    def body(carry, t):
        k_cache, v_cache = carry
        _, k_cache, v_cache = model.apply(
            params, jnp.take(tokens_TS, t, axis=1), t,
            k_cache, v_cache, action_ids, domain_id,
            method=STMaskGIT.frame_logits)
        return (k_cache, v_cache), None

    (k_cache, v_cache), _ = jax.lax.scan(
        body, (k_cache, v_cache), jnp.arange(num_frames))
    return k_cache, v_cache


def generate_tokens(model: STMaskGIT, params, prompt_TS, num_prompt_frames: int,
                    action_ids, domain_id, key, *, maskgit_steps: int = 2,
                    temperature: float = 0.0, unmask_mode: str = "random",
                    return_logits: bool = False):
    """Autoregressive rollout: keep `num_prompt_frames`, generate the rest.

    prompt_TS: (B, T, S) int32; frames >= num_prompt_frames are ignored and
    regenerated (reference: STMaskGIT.generate, st_mask_git.py:253-329).
    """
    cfg = model.config
    B, T, S = prompt_TS.shape
    k_cache, v_cache = model.apply(params, B, with_actions=action_ids is not None,
                                   method=STMaskGIT.init_cache)

    out = jnp.where(
        (jnp.arange(T) < num_prompt_frames)[None, :, None],
        prompt_TS, model.mask_token_id)
    k_cache, v_cache = _prefill(model, params, out, k_cache, v_cache,
                                action_ids, domain_id, num_prompt_frames)

    def frame_body(carry, xs):
        out, k_cache, v_cache = carry
        t, key = xs
        masked = jnp.full((B, S), model.mask_token_id, jnp.int32)
        tokens_t, logits_t, k_cache, v_cache = generate_frame(
            model, params, masked, t, k_cache, v_cache, action_ids, domain_id,
            key, maskgit_steps=maskgit_steps, temperature=temperature,
            unmask_mode=unmask_mode)
        out = jax.lax.dynamic_update_slice_in_dim(out, tokens_t[:, None], t, axis=1)
        return (out, k_cache, v_cache), logits_t

    ts = jnp.arange(num_prompt_frames, T)
    keys = jax.random.split(key, T - num_prompt_frames)
    (out, _, _), logits = jax.lax.scan(frame_body, (out, k_cache, v_cache), (ts, keys))

    if return_logits:
        return out, jnp.moveaxis(logits, 0, 1)  # (B, T-p, S, nv, fv)
    return out


def _refine_frame_full(model: STMaskGIT, params, cur_TS, t, action_ids,
                       domain_id, key, *, maskgit_steps: int,
                       temperature: float, unmask_mode: str):
    """MaskGIT-refine frame t by full-stack recompute (the reference's own
    algorithm, st_mask_git.py:382-453). Sampling/re-masking and the RNG
    split structure match _maskgit_refine exactly, so with the same key the
    cached and full paths produce identical tokens (when the model supports
    caching at all)."""
    cfg = model.config
    B, T, S = cur_TS.shape
    nv, fv = cfg.num_factored_vocabs, cfg.factored_vocab_size
    ns = jnp.asarray(maskgit_mask_counts(maskgit_steps, S), jnp.int32)
    unmasked0 = jax.lax.dynamic_slice_in_dim(
        cur_TS, t, 1, axis=1)[:, 0] != model.mask_token_id

    def step_body(carry, xs):
        cur, unmasked = carry
        n, key = xs
        logits_full, _ = model.apply(params, cur, action_ids, domain_id,
                                     method=STMaskGIT.compute_logits)
        lt = jax.lax.dynamic_slice_in_dim(logits_full, t, 1, axis=2)
        lt = lt.reshape(B, nv, fv, S).transpose(0, 3, 1, 2)  # (B, S, nv, fv)
        k_samp, k_conf = jax.random.split(key)
        samples, confidence = _sample_factored(lt, k_samp, temperature, fv)
        if unmask_mode == "greedy":
            conf = confidence
        elif unmask_mode == "random":
            conf = jax.random.uniform(k_conf, confidence.shape)
        else:
            raise NotImplementedError(unmask_mode)
        conf = jnp.where(unmasked, jnp.inf, conf)
        lowest = _mask_lowest(conf, n)
        prev_unmasked = unmasked
        unmasked = jnp.where(n > 0, unmasked | ~lowest, jnp.ones_like(unmasked))
        frame_prev = jax.lax.dynamic_slice_in_dim(cur, t, 1, axis=1)[:, 0]
        samples = jnp.where(lowest, model.mask_token_id, samples)
        samples = jnp.where(prev_unmasked, frame_prev, samples)
        cur = jax.lax.dynamic_update_slice_in_dim(cur, samples[:, None], t, axis=1)
        return (cur, unmasked), None

    keys = jax.random.split(key, maskgit_steps)
    (cur_TS, _), _ = jax.lax.scan(step_body, (cur_TS, unmasked0), (ns, keys))
    return cur_TS


def generate_tokens_full(model: STMaskGIT, params, prompt_TS,
                         num_prompt_frames: int, action_ids, domain_id, key,
                         *, maskgit_steps: int = 2, temperature: float = 0.0,
                         unmask_mode: str = "random"):
    """Full-recompute rollout: (T - prompt) * maskgit_steps full-stack
    forwards, exactly the reference algorithm (hma/generate.py:157-172).

    This is the rollout path for `cross_attention_compat="reference"`
    models, whose action injection mixes timesteps and therefore cannot be
    decoded per-frame against a KV cache (see GenieConfig). For cacheable
    models it returns the same tokens as `generate_tokens` under the same
    key (identical sampling + RNG structure), just slower.
    """
    B, T, S = prompt_TS.shape
    out = jnp.where((jnp.arange(T) < num_prompt_frames)[None, :, None],
                    prompt_TS, model.mask_token_id)

    def frame_body(out, xs):
        t, key = xs
        out = _refine_frame_full(model, params, out, t, action_ids, domain_id,
                                 key, maskgit_steps=maskgit_steps,
                                 temperature=temperature,
                                 unmask_mode=unmask_mode)
        return out, None

    ts = jnp.arange(num_prompt_frames, T)
    keys = jax.random.split(key, T - num_prompt_frames)
    out, _ = jax.lax.scan(frame_body, out, (ts, keys))
    return out


def make_generator(model: STMaskGIT, *, num_prompt_frames: int,
                   maskgit_steps: int = 2, temperature: float = 0.0,
                   unmask_mode: str = "random", return_logits: bool = False):
    """Build a jitted rollout fn(params, prompt_TS, action_ids, domain_id, key)."""

    @jax.jit
    def run(params, prompt_TS, action_ids, domain_id, key):
        return generate_tokens(model, params, prompt_TS, num_prompt_frames,
                               action_ids, domain_id, key,
                               maskgit_steps=maskgit_steps,
                               temperature=temperature,
                               unmask_mode=unmask_mode,
                               return_logits=return_logits)

    return run


def teacher_forced_logits(model: STMaskGIT, params, tokens_TS, action_ids,
                          domain_id, key, *, maskgit_steps: int = 2,
                          temperature: float = 0.0, unmask_mode: str = "random"):
    """Per-frame MaskGIT samples/logits with ground-truth history (evaluation).

    For each t in [1, T): history = ground-truth frames < t, frame t fully
    masked, MaskGIT-refine frame t; the cache is then filled with the
    ground-truth frame t. Mirrors GenieEvaluator.predict_zframe_logits
    (reference: hma/evaluate.py:150-198) with incremental forwards.

    Returns (samples (B, T-1, S), logits (B, T-1, S, nv, fv)).
    """
    cfg = model.config
    B, T, S = tokens_TS.shape
    k_cache, v_cache = model.apply(params, B, with_actions=action_ids is not None,
                                   method=STMaskGIT.init_cache)

    def body(carry, xs):
        k_cache, v_cache = carry
        t, key = xs
        # fill cache with ground truth frame t-1
        _, k_cache, v_cache = model.apply(
            params, jnp.take(tokens_TS, t - 1, axis=1), t - 1, k_cache, v_cache,
            action_ids, domain_id, method=STMaskGIT.frame_logits)
        masked = jnp.full((B, S), model.mask_token_id, jnp.int32)
        tokens_t, logits_t = _maskgit_refine(
            model, params, masked, t, k_cache, v_cache, action_ids, domain_id,
            key, maskgit_steps=maskgit_steps, temperature=temperature,
            unmask_mode=unmask_mode)
        return (k_cache, v_cache), (tokens_t, logits_t)

    ts = jnp.arange(1, T)
    keys = jax.random.split(key, T - 1)
    _, (samples, logits) = jax.lax.scan(body, (k_cache, v_cache), (ts, keys))
    return jnp.moveaxis(samples, 0, 1), jnp.moveaxis(logits, 0, 1)


def autoregressive_logits(model: STMaskGIT, params, tokens_TS,
                          num_prompt_frames: int, action_ids, domain_id, key,
                          *, maskgit_steps: int = 2, temperature: float = 0.0,
                          unmask_mode: str = "random"):
    """Per-frame MaskGIT samples/logits with *autoregressive* history.

    Matches the reference's `--autoregressive_time` eval mode EXACTLY
    (hma/evaluate.py:79-82,181-186): each timestep re-clones the
    ground-truth context and overwrites only the *immediately previous*
    frame with the model's sample (when past the prompt) — samples do NOT
    accumulate in the context. Frame t's context is
    [GT_0 .. GT_{t-2}, sample_{t-1}].

    Cached formulation: per step, slot t-2 is re-filled with ground truth
    (undoing the previous step's sample fill) before slot t-1 is filled
    with the sample; the sample frame's deep-layer KVs thereby condition
    on the all-GT prefix, exactly like the reference's fresh full forward.

    Returns (samples (B, T-1, S), logits (B, T-1, S, nv, fv)).
    """
    cfg = model.config
    B, T, S = tokens_TS.shape
    k_cache, v_cache = model.apply(params, B, with_actions=action_ids is not None,
                                   method=STMaskGIT.init_cache)

    def body(carry, xs):
        k_cache, v_cache, prev_pred = carry
        t, key = xs
        # restore ground truth at slot t-2 (no-op value-wise for t <= 1
        # and inside the prompt, where the slot already holds GT)
        tm2 = jnp.maximum(t - 2, 0)
        _, k_cache, v_cache = model.apply(
            params, jnp.take(tokens_TS, tm2, axis=1), tm2, k_cache, v_cache,
            action_ids, domain_id, method=STMaskGIT.frame_logits)
        # frame t-1 context: ground truth inside the prompt, the model's
        # own sample after it
        fill = jnp.where(t - 1 < num_prompt_frames,
                         jnp.take(tokens_TS, t - 1, axis=1), prev_pred)
        _, k_cache, v_cache = model.apply(
            params, fill, t - 1, k_cache, v_cache, action_ids, domain_id,
            method=STMaskGIT.frame_logits)
        masked = jnp.full((B, S), model.mask_token_id, jnp.int32)
        tokens_t, logits_t = _maskgit_refine(
            model, params, masked, t, k_cache, v_cache, action_ids, domain_id,
            key, maskgit_steps=maskgit_steps, temperature=temperature,
            unmask_mode=unmask_mode)
        return (k_cache, v_cache, tokens_t), (tokens_t, logits_t)

    ts = jnp.arange(1, T)
    keys = jax.random.split(key, T - 1)
    prev0 = jnp.take(tokens_TS, 0, axis=1)  # unused until t > prompt
    _, (samples, logits) = jax.lax.scan(
        body, (k_cache, v_cache, prev0), (ts, keys))
    return jnp.moveaxis(samples, 0, 1), jnp.moveaxis(logits, 0, 1)


def generate_horizon(model: STMaskGIT, params, prompt_TS, out_t_min: int,
                     out_t_max: int, action_ids, domain_id, key, *,
                     maskgit_steps: int = 2, temperature: float = 0.0,
                     unmask_mode: str = "random"):
    """Jointly MaskGIT-decode frames [out_t_min, out_t_max) in one pass set.

    Multi-frame analog of `generate_tokens`'s per-frame loop (reference:
    maskgit_generate_horizon, st_mask_git.py:469-601 — whose reshape bugs
    made it unusable; this is the working equivalent). Refinement runs
    full-stack forwards because frames inside the horizon condition on one
    another through the causal temporal attention as they unmask.

    Returns (B, out_t_max - out_t_min, S) tokens.
    """
    cfg = model.config
    B, T, S = prompt_TS.shape
    horizon = out_t_max - out_t_min
    HS = horizon * S
    mask_id = model.mask_token_id
    cur = jnp.where((jnp.arange(T) < out_t_min)[None, :, None], prompt_TS, mask_id)
    ns = jnp.asarray(maskgit_mask_counts(maskgit_steps, HS), jnp.int32)

    def step_body(carry, xs):
        cur, unmasked = carry
        n, key = xs
        logits_full, _ = model.apply(params, cur, action_ids, domain_id,
                                     method=STMaskGIT.compute_logits)
        nv, fv = cfg.num_factored_vocabs, cfg.factored_vocab_size
        lt = jax.lax.dynamic_slice_in_dim(logits_full, out_t_min, horizon, axis=2)
        lt = lt.reshape(B, nv, fv, HS).transpose(0, 3, 1, 2)  # (B, HS, nv, fv)
        k_samp, k_conf = jax.random.split(key)
        samples, confidence = _sample_factored(lt, k_samp, temperature, fv)
        if unmask_mode == "greedy":
            conf = confidence
        elif unmask_mode == "random":
            conf = jax.random.uniform(k_conf, confidence.shape)
        else:  # match _maskgit_refine: fail loudly on unknown modes
            raise NotImplementedError(unmask_mode)
        conf = jnp.where(unmasked, jnp.inf, conf)
        lowest = _mask_lowest(conf, n)
        prev_unmasked = unmasked
        unmasked = jnp.where(n > 0, unmasked | ~lowest, jnp.ones_like(unmasked))
        window = jax.lax.dynamic_slice_in_dim(cur, out_t_min, horizon, axis=1)
        samples = jnp.where(lowest, mask_id, samples)
        samples = jnp.where(prev_unmasked, window.reshape(B, HS), samples)
        cur = jax.lax.dynamic_update_slice_in_dim(
            cur, samples.reshape(B, horizon, S), out_t_min, axis=1)
        return (cur, unmasked), None

    unmasked0 = jnp.zeros((B, HS), bool)
    keys = jax.random.split(key, maskgit_steps)
    (cur, _), _ = jax.lax.scan(step_body, (cur, unmasked0), (ns, keys))
    return jax.lax.dynamic_slice_in_dim(cur, out_t_min, horizon, axis=1)
