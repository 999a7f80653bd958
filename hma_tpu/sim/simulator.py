"""Interactive learned world-model simulators.

Rebuild of the reference simulator stack (sim/simulator.py): abstract
Simulator / PhysicsSimulator / LearnedSimulator / ReplaySimulator, and
GenieSimulator — a stateful interactive world model holding rolling
caches of the last `prompt_horizon` frames (tokens or latents) and
actions; `step(action)` appends a masked frame, MaskGIT-decodes it,
decodes to pixels, and rolls the caches (reference: sim/simulator.py:
100-372).

TPU design: the per-step work is ONE jitted program (prefill the rolling
window into the temporal KV cache + cached MaskGIT refinement of the new
frame + optional pixel decode), so interactive latency is a single
dispatch. The reference runs `inference_iterations` full-stack torch
forwards plus a separate VAE decode per keypress.
"""

from __future__ import annotations

import abc
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hma_tpu.models.st_mar import STMAR, patchify, unpatchify
from hma_tpu.models.st_mask_git import STMaskGIT
from hma_tpu.rollout.mar import generate_frame_mar
from hma_tpu.rollout.maskgit import generate_frame, _prefill


class Simulator(abc.ABC):
    """(reference: sim/simulator.py:19-96)"""

    @abc.abstractmethod
    def step(self, action: np.ndarray) -> np.ndarray:
        ...

    @abc.abstractmethod
    def reset(self):
        ...


class PhysicsSimulator(Simulator):
    """Adapter around a ground-truth physics env (e.g. robosuite/MuJoCo);
    host-side only, used for side-by-side comparison."""

    def __init__(self, env):
        self.env = env

    def step(self, action):
        obs = self.env.step(action)
        return np.asarray(obs)

    def reset(self):
        return self.env.reset()


class ReplaySimulator(Simulator):
    """Replays a prerecorded frame sequence, ignoring actions."""

    def __init__(self, frames: np.ndarray):
        self.frames = frames
        self.idx = 0

    def step(self, action=None):
        frame = self.frames[min(self.idx, len(self.frames) - 1)]
        self.idx += 1
        return frame

    def reset(self):
        self.idx = 0
        return self.frames[0]


class LearnedSimulator(Simulator, abc.ABC):
    """Marker base for model-backed simulators."""


class GenieSimulator(LearnedSimulator):
    """Action-controllable interactive world model.

    Supports both backbones like the reference's `backbone_type` dispatch
    (reference: sim/simulator.py:100,135-170): pass an `STMaskGIT`
    (discrete tokens, rolling (H, h, w) int cache) or an `STMAR`
    (continuous latents, rolling (H, h, w, C) float cache — the shipped
    langtable demo configuration, reference: sim/app.py:25-34).

    Args:
        model/params: the trained world model (STMaskGIT or STMAR).
        decode_tokens: discrete: (N, h, w) int -> (N, H, W, 3) uint8.
        decode_latents: continuous: (N, h, w, C) latents (x SVD_SCALE)
            -> (N, H, W, 3) uint8 (see rollout.decode.make_feature_decoder).
        encode_image: (H, W, 3) uint8 -> (h, w) tokens / (h, w, C) latents.
        prompt_horizon: number of context frames kept in the rolling cache.
        physics_simulator: optional ground-truth sim for PSNR comparison.
        compute_delta_psnr: per-step controllability probe — PSNR(gt, pred)
            minus the mean over `average_delta_psnr_over` rollouts with
            N(0,1) random actions (reference: sim/simulator.py:331-357).
    """

    average_delta_psnr_over = 5

    def __init__(self, model, params, *,
                 domain_id: int = 0,
                 prompt_horizon: int = 3,
                 maskgit_steps: int = 2,
                 temperature: float = 0.0,
                 decode_tokens: Optional[Callable] = None,
                 decode_latents: Optional[Callable] = None,
                 encode_image: Optional[Callable] = None,
                 physics_simulator: Optional[Simulator] = None,
                 compute_delta_psnr: bool = False,
                 action_noise_scale: float = 0.0,
                 seed: int = 0):
        cfg = model.config
        assert prompt_horizon < cfg.T, "prompt_horizon must fit the trained window"
        self.backbone = "stmar" if isinstance(model, STMAR) else "stmaskgit"
        self.model = model
        self.params = params
        self.config = cfg
        self.domain_id = jnp.asarray(domain_id, jnp.int32)
        self.prompt_horizon = prompt_horizon
        self.decode_tokens = decode_tokens
        self.decode_latents = decode_latents
        self._decode = decode_latents if self.backbone == "stmar" else decode_tokens
        self.encode_image = encode_image
        self.physics = physics_simulator
        self.compute_delta_psnr = compute_delta_psnr
        if compute_delta_psnr:
            assert physics_simulator is not None and self._decode is not None, \
                "delta-PSNR needs a physics simulator and a pixel decoder"
        self.action_noise_scale = action_noise_scale
        self.key = jax.random.PRNGKey(seed)
        self._step_times: list[float] = []
        self._psnr_history: list[float] = []
        self._delta_psnr_history: list[float] = []

        H = prompt_horizon

        if self.backbone == "stmaskgit":

            def _step(params, window_tokens, window_actions, key):
                """window_tokens: (1, H+1, S) with the last frame masked;
                window_actions: (1, H+1, max_da)."""
                k_cache, v_cache = model.apply(
                    params, 1, with_actions=True, method=STMaskGIT.init_cache)
                k_cache, v_cache = _prefill(model, params, window_tokens,
                                            k_cache, v_cache, window_actions,
                                            self.domain_id, H)
                masked = jnp.full((1, cfg.S), model.mask_token_id, jnp.int32)
                tokens, _, _, _ = generate_frame(
                    model, params, masked, jnp.asarray(H, jnp.int32),
                    k_cache, v_cache, window_actions, self.domain_id, key,
                    maskgit_steps=maskgit_steps, temperature=temperature)
                return tokens[0]

        else:

            p = cfg.patch_size
            h_ = cfg.h // p
            S_p = h_ * h_
            pd = cfg.vae_embed_dim * p * p

            def _step(params, window_latents, window_actions, key):
                """window_latents: (1, H+1, h, w, C) (last frame ignored —
                generate_frame_mar starts from the mask token);
                window_actions: (1, H+1, max_da)."""
                patches = patchify(window_latents, p).reshape(1, H + 1, S_p, pd)
                k_cache, v_cache = model.apply(
                    params, 1, with_actions=True, method=STMAR.init_cache)

                def prefill_body(carry, t):
                    kc, vc = carry
                    _, _, kc, vc = model.apply(
                        params, jnp.take(patches, t, axis=1), t, kc, vc,
                        window_actions, self.domain_id,
                        method=STMAR.frame_latents)
                    return (kc, vc), None

                (k_cache, v_cache), _ = jax.lax.scan(
                    prefill_body, (k_cache, v_cache), jnp.arange(H))
                frame, _, _, _ = generate_frame_mar(
                    model, params, jnp.asarray(H, jnp.int32), k_cache, v_cache,
                    window_actions, self.domain_id, key,
                    maskgit_steps=maskgit_steps, temperature=temperature,
                    batch_size=1)
                lat = unpatchify(frame.reshape(1, 1, h_, h_, pd), p,
                                 cfg.vae_embed_dim)
                return lat[0, 0]  # (h, w, C)

        self._step_fn = jax.jit(_step)
        # rolling state: (H, h, w) int tokens or (H, h, w, C) float latents
        self._token_cache: Optional[np.ndarray] = None
        self._action_cache: Optional[np.ndarray] = None  # (H, max_da)

    # ------------------------------------------------------------------

    def set_initial_state(self, frames, actions=None) -> None:
        """frames: (prompt_horizon, h, w) token grids (discrete),
        (prompt_horizon, h, w, C) latents (continuous), or (prompt_horizon,
        H, W, 3) uint8 images when an encoder is configured
        (reference: set_initial_state/reset, sim/simulator.py:228,473)."""
        frames = np.asarray(frames)
        is_image = frames.ndim == 4 and frames.dtype == np.uint8
        if is_image:
            assert self.encode_image is not None, "need encode_image for pixel input"
            frames = np.stack([np.asarray(self.encode_image(f)) for f in frames])
        assert frames.shape[0] == self.prompt_horizon
        if self.backbone == "stmaskgit":
            assert frames.ndim == 3, frames.shape
            self._token_cache = frames.astype(np.int32)
        else:
            assert frames.ndim == 4, frames.shape  # (H, h, w, C) latents
            self._token_cache = frames.astype(np.float32)
        da = self.config.max_d_action
        if actions is None:
            actions = np.zeros((self.prompt_horizon, da), np.float32)
        self._action_cache = np.asarray(actions, np.float32)

    def reset(self):
        if self.physics is not None:
            obs = self.physics.reset()
            self.set_initial_state(np.stack([obs] * self.prompt_horizon))
        assert self._token_cache is not None, "call set_initial_state first"
        return self._current_frame()

    def _current_frame(self):
        frame = self._token_cache[-1]
        if self._decode is not None:
            return self._decode(frame[None])[0]
        return frame

    def _make_window(self):
        """(window, ) model input from the rolling cache: tokens get a
        masked final frame; latents get a zero final frame (the MAR step
        fn overwrites it with the mask token internally)."""
        H = self.prompt_horizon
        if self.backbone == "stmaskgit":
            S = self.config.S
            return np.concatenate([
                self._token_cache.reshape(H, S),
                np.full((1, S), self.model.mask_token_id, np.int32)])[None]
        return np.concatenate([
            self._token_cache,
            np.zeros((1, *self._token_cache.shape[1:]), np.float32)])[None]

    def _generate(self, window, actions, key):
        """One model step -> (h, w) tokens or (h, w, C) latents (numpy)."""
        out = np.asarray(self._step_fn(
            self.params, jnp.asarray(window), jnp.asarray(actions), key))
        if self.backbone == "stmaskgit":
            return out.reshape(self.config.h, self.config.w)
        return out

    def step(self, action: np.ndarray):
        """Advance one frame under `action` (reference: sim/simulator.py:234-372).

        Returns decoded pixels (H, W, 3) uint8, or raw tokens/latents when
        no decoder is configured.
        """
        assert self._token_cache is not None, "call set_initial_state first"
        t0 = time.perf_counter()
        action = np.asarray(action, np.float32).reshape(-1)
        da = self.config.max_d_action
        padded = np.zeros(da, np.float32)
        padded[:len(action)] = action
        if self.action_noise_scale > 0:
            padded = padded + np.random.normal(0, self.action_noise_scale, da)

        window = self._make_window()
        actions = np.concatenate([self._action_cache, padded[None]])[None]

        self.key, k = jax.random.split(self.key)
        frame = self._generate(window, actions, k)
        step_time = time.perf_counter() - t0  # model time only, like the
        # reference's measure_step_time window (sim/simulator.py:284-301)

        out = frame
        if self._decode is not None:
            out = self._decode(frame[None])[0]

        # Optional ground-truth physics comparison (reference:
        # sim/simulator.py:309-357): step the physics sim with the same
        # action; track PSNR and (optionally) the ΔPSNR controllability
        # signal: PSNR(gt, pred) - mean PSNR(gt, random-action pred).
        if self.physics is not None and self._decode is not None:
            try:
                from hma_tpu.metrics.image import psnr as _psnr

                gt = np.asarray(self.physics.step(action))
                if gt.shape == np.asarray(out).shape:
                    gt_psnr = float(_psnr(out, gt))
                    self._psnr_history.append(gt_psnr)
                    if self.compute_delta_psnr:
                        delta = 0.0
                        for i in range(self.average_delta_psnr_over):
                            self.key, kr = jax.random.split(self.key)
                            rand_actions = np.random.normal(
                                size=actions.shape).astype(np.float32)
                            rand_frame = self._generate(window, rand_actions, kr)
                            rand_px = self._decode(rand_frame[None])[0]
                            delta += (gt_psnr - float(_psnr(rand_px, gt))
                                      ) / self.average_delta_psnr_over
                        self._delta_psnr_history.append(delta)
            except Exception:
                pass

        # roll caches forward
        self._token_cache = np.concatenate([self._token_cache[1:], frame[None]])
        self._action_cache = np.concatenate([self._action_cache[1:], padded[None]])

        self._step_times.append(step_time)
        return out

    # ------------------------------------------------------------------

    def measure_step_time(self) -> dict:
        """IQR-trimmed mean step latency (reference: sim/simulator.py:284-306)."""
        if not self._step_times:
            return {}
        ts = np.asarray(self._step_times)
        q1, q3 = np.percentile(ts, [25, 75])
        inlier = ts[(ts >= q1) & (ts <= q3)]
        stats = {
            "p50_ms": float(np.median(ts) * 1000),
            "iqr_mean_ms": float(np.mean(inlier) * 1000) if len(inlier) else float("nan"),
            "n": len(ts),
        }
        if self._psnr_history:
            stats["psnr_vs_physics"] = float(np.mean(self._psnr_history))
        if self._delta_psnr_history:
            stats["delta_psnr"] = float(np.mean(self._delta_psnr_history))
        return stats
