"""Batch token/latent -> pixel decoding (eval & visualization).

Equivalent of the reference's `decode_latents_wrapper`
(hma/visualize.py:124-169): builds a jitted decoder closure over either
the MagVit2 VQ decoder (discrete tokens) or the SVD-VAE decoder
(continuous latents, clamped to ±25 as in visualize.py:157).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hma_tpu.data.datasets import SVD_SCALE
from hma_tpu.tokenizer.magvit2 import VQConfig, VQModel, unnormalize_image


def make_token_decoder(params: dict, config: Optional[VQConfig] = None,
                       batch_size: int = 16,
                       dtype=jnp.bfloat16) -> Callable[[np.ndarray], np.ndarray]:
    """Returns decode(tokens (N, h, w) uint32/int) -> (N, H, W, 3) uint8."""
    config = config or VQConfig()
    model = VQModel(config, dtype=dtype)

    @jax.jit
    def _decode(idx):
        img = model.apply(params, idx, method=VQModel.decode_code)
        return unnormalize_image(img)

    def decode(tokens: np.ndarray) -> np.ndarray:
        out = []
        n = len(tokens)
        for i in range(math.ceil(n / batch_size)):
            shard = np.asarray(tokens[i * batch_size:(i + 1) * batch_size], np.int32)
            pad = batch_size - len(shard)
            if pad:
                shard = np.concatenate([shard, np.zeros((pad, *shard.shape[1:]), shard.dtype)])
            img = np.asarray(_decode(jnp.asarray(shard)))
            out.append(img[:batch_size - pad])
        return np.concatenate(out) if out else np.zeros((0,), np.uint8)

    return decode


def load_svd_decoder(vae_checkpoint: str) -> Callable:
    """torch SVD-VAE state_dict file -> jitted decode fn taking
    (B, T, h, w, C) RAW (unscaled) latents -> (B, T, H, W, 3) in [-1, 1].

    The single loading path for every latent→pixel consumer (eval,
    visualize, demo) so the load/jit/clamp conventions cannot drift."""
    import torch

    from hma_tpu.tokenizer.svd_vae import (
        SVDTemporalVAE,
        load_svd_vae_torch_weights,
    )

    params = load_svd_vae_torch_weights(
        torch.load(vae_checkpoint, map_location="cpu"))
    vae = SVDTemporalVAE()
    return jax.jit(lambda z: vae.apply(params, z, method=SVDTemporalVAE.decode))


def make_feature_decoder(vae_decode_fn: Callable, batch_size: int = 16,
                         clamp: float = 25.0) -> Callable[[np.ndarray], np.ndarray]:
    """Continuous path: latents (N, C, h, w) already x SVD_SCALE in the
    dataset; divide back, clamp the RAW values to ±25 (the reference
    clamps unscaled latents, visualize.py:157 — clamping the scaled
    stream would admit raw values up to ~137 on a diverging rollout),
    and decode via the provided SVD-VAE decoder
    (reference: hma/evaluate_diffusion.py:194-212)."""

    def decode(latents: np.ndarray) -> np.ndarray:
        out = []
        n = len(latents)
        for i in range(math.ceil(n / batch_size)):
            shard = np.asarray(latents[i * batch_size:(i + 1) * batch_size], np.float32)
            shard = np.clip(shard / SVD_SCALE, -clamp, clamp)
            img = vae_decode_fn(shard)
            out.append(np.asarray(img))
        if not out:  # np.concatenate([]) raises on an empty batch
            return np.zeros((0, 0, 0, 3), np.uint8)
        return np.concatenate(out)

    return decode
