"""MAR-style continuous-latent rollout with temporal KV caching.

Rebuild of STMAR.generate / maskgit_generate (reference:
hma/model/st_mar.py:277-454): frames are decoded autoregressively; within
a frame, a random generation order unmasks patch subsets on a cosine
count schedule, and each newly-revealed subset's latents are sampled from
the per-token diffusion head conditioned on the trunk output.

TPU-first restructuring:
  - the trunk runs the KV-cached single-frame path (frame_latents), not a
    full T-frame recompute per refinement step;
  - subset sizes per step are *static* (they depend only on seq_len and
    maskgit_steps), so subsets are static-size slices of the random order
    vector padded to the max count — no data-dependent boolean gathers —
    and the whole frame decode is a lax.scan.

Note: the reference's inner loop never updates `unmasked`
(st_mar.py:376-389), so it re-samples every not-next-masked position each
step; we implement the MAR-paper semantics (sample each position exactly
once, when first revealed), which does strictly less diffusion work.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hma_tpu.models.st_mar import STMAR, patchify, unpatchify


def mar_subset_schedule(seq_len: int, steps: int,
                        compat: str = "mar") -> tuple[list[int], list[int]]:
    """(starts, counts): step s samples order[starts[s] : starts[s]+counts[s]].

    compat="mar" (default, MAR-paper semantics — each position sampled
    exactly once, when first revealed): masked-after-step-s =
    clamp(floor(seq_len*cos(pi/2*(s+1)/steps)), 1, prev-1), 0 after the
    final step, and step s reveals order[nxt : prev].

    compat="reference": bit-faithful emulation of the reference loop's
    selection (st_mar.py:376-411), whose `unmasked` state is never
    updated, so step s re-samples EVERY position past the schedule point
    — order[nxt : seq_len] with nxt = clamp(floor(seq_len*cos(...)), 1,
    seq_len-1) — and the final step re-samples all seq_len positions
    (mask_to_pred = mask, st_mar.py:411). Strictly more diffusion work
    (steps*S rows vs S), needed only to isolate sampling-distribution
    fidelity against reference-trained weights.
    """
    assert compat in ("mar", "reference"), compat
    starts, counts = [], []
    prev = seq_len
    for s in range(steps):
        if s == steps - 1:
            nxt = 0
        else:
            nxt = int(np.floor(seq_len * math.cos(math.pi / 2 * (s + 1) / steps)))
            hi = seq_len - 1 if compat == "reference" else prev - 1
            nxt = max(1, min(hi, nxt))
        starts.append(nxt)
        counts.append((seq_len if compat == "reference" else prev) - nxt)
        prev = nxt
    return starts, counts


def generate_frame_mar(model: STMAR, params, t, k_cache, v_cache,
                       action_ids, domain_id, key, *,
                       maskgit_steps: Optional[int] = None,
                       temperature: float = 1.0, cfg: float = 1.0,
                       batch_size: int,
                       initial_patches: Optional[jax.Array] = None,
                       action_live: Optional[jax.Array] = None,
                       sampling_compat: Optional[str] = None):
    """Decode one frame of patchified latents. Returns
    (patches (B, S_p, patch_dim), action_latent or None, k_cache, v_cache)
    with caches filled from the final frame.

    Classifier-free guidance (cfg != 1): the caller supplies a DOUBLED
    batch whose second half runs the trained no-actions branch
    (`action_live` = [1]*n + [0]*n; see generate_latents), the per-row
    generation orders pair across halves, and DiffLoss.sample guides
    cond vs uncond eps — both halves receive the identical guided
    samples, keeping both cache sets consistent. This is a working
    redesign of the reference's cfg path, which is dead code (it chunks a
    caller-doubled batch no caller constructs, st_mar.py:417-439); the
    unconditional branch here is exactly the action-dropout branch the
    model trains when drop_action_ratio > 0.
    """
    cfg_model = model.config
    steps = maskgit_steps or cfg_model.maskgit_steps
    S = cfg_model.S // cfg_model.patch_size**2
    patch_dim = cfg_model.vae_embed_dim * cfg_model.patch_size**2
    B = batch_size

    compat = (sampling_compat
              or getattr(cfg_model, "mar_sampling_compat", "mar"))
    starts, counts = mar_subset_schedule(S, steps, compat=compat)
    maxc = max(counts)
    # cfg_iter is constant under the reference's (never-updated) unmasked
    # state: 1 + (cfg-1)*S/S = cfg (st_mar.py:419-424).
    cfg_iter = cfg

    key, k_order = jax.random.split(key)
    if cfg != 1.0:
        assert B % 2 == 0 and action_live is not None, (
            "cfg != 1 requires a caller-doubled [cond | uncond] batch with "
            "action_live set (use generate_latents/teacher_forced_latents)")
        # the uncond half substitutes action_mask_tokens, which only ever
        # receive gradient when jointly_predict_actions=True (the shipped
        # mar_* cards set it false); guiding against a never-trained
        # branch silently amplifies noise
        assert cfg_model.jointly_predict_actions, (
            "cfg != 1 needs a trained unconditional branch: train with "
            "jointly_predict_actions=true and drop_action_ratio > 0 so the "
            "action-mask-token branch receives gradient")
        # identical per-row orders across the halves so cond/uncond rows
        # stay position-paired through the flattened diffusion batch
        half = jax.vmap(lambda k: jax.random.permutation(k, S))(
            jax.random.split(k_order, B // 2))
        order = jnp.concatenate([half, half], axis=0)  # (B, S)
    else:
        order = jax.vmap(lambda k: jax.random.permutation(k, S))(
            jax.random.split(k_order, B))  # (B, S)

    # a fully-masked frame: every patch row is p*p copies of the mask token
    # (patchify flattens (p, p, C) with C fastest, so tiling matches)
    mask_row = jnp.tile(params["params"]["mask_token"][0, 0],
                        (cfg_model.patch_size ** 2,))
    frame = (initial_patches if initial_patches is not None
             else jnp.broadcast_to(mask_row, (B, S, patch_dim)).astype(jnp.float32))

    def step_body(carry, xs):
        frame, key = carry
        start, count, _ = xs
        key, k_s = jax.random.split(key)
        z, action_latent, _, _ = model.apply(
            params, frame, t, k_cache, v_cache, action_ids, domain_id,
            update_cache=False, action_live=action_live,
            method=STMAR.frame_latents)
        # Padding entries (arange >= count) must scatter OUTSIDE this
        # step's reveal range [start, start+count): modulo wraps them onto
        # already-revealed (write-back of the current sample, a no-op) or
        # not-yet-revealed (write-back of the mask row, a no-op)
        # positions, and keeps all maxc indices distinct. Clipping to S-1
        # instead collided a padding row with the step's last reveal and
        # could overwrite the fresh sample with the stale mask row.
        idx = (start + jnp.arange(maxc)) % S
        pos = jnp.take_along_axis(order, idx[None, :].repeat(B, 0), axis=1)  # (B, maxc)
        z_rows = jnp.take_along_axis(z, pos[..., None], axis=1).reshape(B * maxc, -1)
        # clip_denoised=True matches the reference's rollout call site
        # (st_mar.py:433-435); SVD_SCALE-normalized latents mostly live in
        # [-1, 1], so the x0 clamp is the reference's intended behavior.
        sampled = model.apply(params, z_rows, k_s, temperature, cfg_iter, True,
                              method=STMAR.sample_tokens)
        sampled = sampled.reshape(B, maxc, patch_dim).astype(frame.dtype)
        valid = (jnp.arange(maxc) < count)[None, :, None]
        cur = jnp.take_along_axis(frame, pos[..., None], axis=1)
        new = jnp.where(valid, sampled, cur)
        frame = jax.vmap(lambda f, p, n: f.at[p].set(n))(frame, pos, new)
        return (frame, key), action_latent

    xs = (jnp.asarray(starts), jnp.asarray(counts), jnp.arange(steps))
    (frame, _), action_latents = jax.lax.scan(step_body, (frame, key), xs)
    action_latent = (None if action_latents is None
                     else jax.tree.map(lambda a: a[-1], action_latents))

    _, _, k_cache, v_cache = model.apply(
        params, frame, t, k_cache, v_cache, action_ids, domain_id,
        action_live=action_live, method=STMAR.frame_latents)
    return frame, action_latent, k_cache, v_cache


def generate_latents(model: STMAR, params, prompt: jax.Array,
                     num_prompt_frames: int, action_ids, domain_id, key, *,
                     maskgit_steps: Optional[int] = None,
                     temperature: float = 1.0, cfg: float = 1.0):
    """AR rollout over frames. prompt: (B, T, h, w, C) latents (x SVD_SCALE).

    Returns (B, T, h, w, C) with frames >= num_prompt_frames generated
    (reference: STMAR.generate, st_mar.py:277-345).
    """
    cfg_model = model.config
    B0, T, H, W, C = prompt.shape
    p = cfg_model.patch_size
    patches = patchify(prompt, p)  # (B, T, h_, w_, pd)
    S = patches.shape[2] * patches.shape[3]
    pd = patches.shape[-1]
    patches = patches.reshape(B0, T, S, pd)

    # classifier-free guidance: run a doubled [cond | uncond] batch; the
    # uncond half takes the trained no-actions branch via action_live=0
    action_live = None
    if cfg != 1.0:
        assert action_ids is not None, "cfg != 1 needs action conditioning"
        patches = jnp.concatenate([patches, patches], axis=0)
        action_ids = jnp.concatenate([action_ids, action_ids], axis=0)
        action_live = jnp.concatenate(
            [jnp.ones((B0,), jnp.float32), jnp.zeros((B0,), jnp.float32)])
    B = patches.shape[0]

    k_cache, v_cache = model.apply(params, B, with_actions=action_ids is not None,
                                   method=STMAR.init_cache)

    # prefill prompt frames
    def prefill_body(carry, t):
        k_cache, v_cache = carry
        _, _, k_cache, v_cache = model.apply(
            params, jnp.take(patches, t, axis=1), t, k_cache, v_cache,
            action_ids, domain_id, action_live=action_live,
            method=STMAR.frame_latents)
        return (k_cache, v_cache), None

    (k_cache, v_cache), _ = jax.lax.scan(
        prefill_body, (k_cache, v_cache), jnp.arange(num_prompt_frames))

    def frame_body(carry, xs):
        out, k_cache, v_cache = carry
        t, key = xs
        frame, _, k_cache, v_cache = generate_frame_mar(
            model, params, t, k_cache, v_cache, action_ids, domain_id, key,
            maskgit_steps=maskgit_steps, temperature=temperature, cfg=cfg,
            batch_size=B, action_live=action_live)
        out = jax.lax.dynamic_update_slice_in_dim(
            out, frame.astype(out.dtype)[:, None], t, axis=1)
        return (out, k_cache, v_cache), None

    ts = jnp.arange(num_prompt_frames, T)
    keys = jax.random.split(key, T - num_prompt_frames)
    (out, _, _), _ = jax.lax.scan(frame_body, (patches, k_cache, v_cache), (ts, keys))

    out = out[:B0]  # cfg: the uncond half carries the same guided samples
    out = out.reshape(B0, T, H // p, W // p, pd)
    return unpatchify(out, p, C)


def generate_latents_reference_algo(model: STMAR, params, prompt: jax.Array,
                                    num_prompt_frames: int, action_ids,
                                    domain_id, key, *,
                                    maskgit_steps: Optional[int] = None,
                                    temperature: float = 1.0):
    """The reference's MAR generation algorithm ported 1:1: a FULL
    T-frame trunk recompute per refinement step and the resample-every-
    step selection (maskgit_generate, st_mar.py:357-454 — `unmasked` is
    never updated, so step s re-samples every position past the schedule
    point and the final step re-samples all of them).

    Two roles: (a) the same-chip benchmark baseline for `detail.mar`
    (the denominator the discrete family's `reference_algo_fps_same_chip`
    already has), and (b) the semantic oracle for
    `mar_sampling_compat="reference"` — this function and the KV-cached
    compat path draw the SAME rng stream in the SAME row layout, so
    tests/test_st_mar.py can require allclose equality between them
    (cached-vs-naive, the test_rollout.py pattern).

    No CFG path: the baseline measures the reference's default rollout
    (cfg=1, hma/evaluate.py MAR usage); the reference's own cfg branch is
    dead code (st_mar.py:417-439).
    """
    cfg_model = model.config
    steps = maskgit_steps or cfg_model.maskgit_steps
    B, T, H, W, C = prompt.shape
    p = cfg_model.patch_size
    patches = patchify(prompt, p)
    S = patches.shape[2] * patches.shape[3]
    pd = patches.shape[-1]
    patches = patches.reshape(B, T, S, pd)

    starts, counts = mar_subset_schedule(S, steps, compat="reference")
    maxc = max(counts)
    mask_row = jnp.tile(params["params"]["mask_token"][0, 0], (p ** 2,))

    def frame_body(window, xs):
        t, key = xs
        key, k_order = jax.random.split(key)
        order = jax.vmap(lambda k: jax.random.permutation(k, S))(
            jax.random.split(k_order, B))
        # frame t starts fully masked (the reference fills it with the
        # mask token before refining, st_mar.py:304-310)
        window = jax.lax.dynamic_update_slice_in_dim(
            window, jnp.broadcast_to(mask_row, (B, 1, S, pd)).astype(window.dtype),
            t, axis=1)

        def step_body(carry, sxs):
            window, key = carry
            start, count = sxs
            key, k_s = jax.random.split(key)
            # FULL window recompute (the baseline's defining cost;
            # reference st_mar.py:391-393)
            z_all, _ = model.apply(params, window, action_ids, domain_id,
                                   method=STMAR.compute_latents)
            z = jnp.take(z_all, t, axis=1)  # (B, S, d)
            idx = (start + jnp.arange(maxc)) % S
            pos = jnp.take_along_axis(order, idx[None, :].repeat(B, 0), axis=1)
            z_rows = jnp.take_along_axis(z, pos[..., None], axis=1).reshape(
                B * maxc, -1)
            sampled = model.apply(params, z_rows, k_s, temperature, 1.0, True,
                                  method=STMAR.sample_tokens)
            sampled = sampled.reshape(B, maxc, pd)
            frame = jnp.take(window, t, axis=1).astype(jnp.float32)
            valid = (jnp.arange(maxc) < count)[None, :, None]
            cur = jnp.take_along_axis(frame, pos[..., None], axis=1)
            new = jnp.where(valid, sampled, cur)
            frame = jax.vmap(lambda f, q, n: f.at[q].set(n))(frame, pos, new)
            window = jax.lax.dynamic_update_slice_in_dim(
                window, frame.astype(window.dtype)[:, None], t, axis=1)
            return (window, key), None

        (window, _), _ = jax.lax.scan(
            step_body, (window, key), (jnp.asarray(starts), jnp.asarray(counts)))
        return window, None

    ts = jnp.arange(num_prompt_frames, T)
    keys = jax.random.split(key, T - num_prompt_frames)
    window, _ = jax.lax.scan(frame_body, patches, (ts, keys))
    window = window.reshape(B, T, H // p, W // p, pd)
    return unpatchify(window, p, C)


def teacher_forced_latents(model: STMAR, params, latents: jax.Array,
                           action_ids, domain_id, key, *,
                           maskgit_steps: Optional[int] = None,
                           temperature: float = 1.0, cfg: float = 1.0):
    """Per-frame MAR generation with ground-truth history (evaluation).

    For each t in [1, T): the KV caches hold ground-truth frames < t and
    frame t is MAR-decoded from scratch — the continuous analog of
    rollout.maskgit.teacher_forced_logits, matching the reference's
    teacher-forced eval loop (hma/evaluate_diffusion.py:144-212, which
    feeds GT context and predicts each next frame).

    latents: (B, T, h, w, C) x SVD_SCALE. Returns (B, T-1, h, w, C)
    predictions for frames 1..T-1.
    """
    cfg_model = model.config
    B0, T, H, W, C = latents.shape
    p = cfg_model.patch_size
    patches = patchify(latents, p)  # (B, T, h_, w_, pd)
    h_, w_ = patches.shape[2], patches.shape[3]
    S = h_ * w_
    pd = patches.shape[-1]
    patches = patches.reshape(B0, T, S, pd)

    action_live = None
    if cfg != 1.0:  # see generate_latents
        assert action_ids is not None, "cfg != 1 needs action conditioning"
        patches = jnp.concatenate([patches, patches], axis=0)
        action_ids = jnp.concatenate([action_ids, action_ids], axis=0)
        action_live = jnp.concatenate(
            [jnp.ones((B0,), jnp.float32), jnp.zeros((B0,), jnp.float32)])
    B = patches.shape[0]

    k_cache, v_cache = model.apply(params, B, with_actions=action_ids is not None,
                                   method=STMAR.init_cache)

    def body(carry, xs):
        k_cache, v_cache = carry
        t, key = xs
        # fill the cache with ground-truth frame t-1
        _, _, k_cache, v_cache = model.apply(
            params, jnp.take(patches, t - 1, axis=1), t - 1, k_cache, v_cache,
            action_ids, domain_id, action_live=action_live,
            method=STMAR.frame_latents)
        frame, _, _, _ = generate_frame_mar(
            model, params, t, k_cache, v_cache, action_ids, domain_id, key,
            maskgit_steps=maskgit_steps, temperature=temperature, cfg=cfg,
            batch_size=B, action_live=action_live)
        return (k_cache, v_cache), frame

    ts = jnp.arange(1, T)
    keys = jax.random.split(key, T - 1)
    _, frames = jax.lax.scan(body, (k_cache, v_cache), (ts, keys))
    frames = jnp.moveaxis(frames, 0, 1)[:B0]  # (B0, T-1, S, pd)
    frames = frames.reshape(B0, T - 1, h_, w_, pd)
    return unpatchify(frames, p, C)


def make_mar_generator(model: STMAR, *, num_prompt_frames: int,
                       maskgit_steps: Optional[int] = None,
                       temperature: float = 1.0, cfg: float = 1.0):
    @jax.jit
    def run(params, prompt, action_ids, domain_id, key):
        return generate_latents(model, params, prompt, num_prompt_frames,
                                action_ids, domain_id, key,
                                maskgit_steps=maskgit_steps,
                                temperature=temperature, cfg=cfg)

    return run
