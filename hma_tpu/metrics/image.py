"""Pixel-space fidelity metrics: PSNR, SSIM, ΔPSNR.

The reference uses skimage's psnr/ssim (hma/evaluate.py:338-350,
train_multi.py:427-450); skimage isn't in this image, so both are
implemented here with matching semantics (SSIM: 7x7 uniform window,
K1=0.01, K2=0.03, per-channel mean — skimage defaults for
channel_axis=-1). ΔPSNR is the controllability probe: PSNR with
ground-truth actions minus mean PSNR over random-action rollouts
(reference: hma/evaluate.py:352-376, 5 trials).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jax.Array, target: jax.Array, data_range: float = 255.0) -> jax.Array:
    """Mean PSNR over leading batch dims; inputs broadcastable, any float/int."""
    pred = jnp.asarray(pred, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def _uniform_filter(x: jax.Array, size: int) -> jax.Array:
    """Mean filter over the two spatial dims of (H, W, C), 'valid' region."""
    kernel = jnp.ones((size, size, 1, 1), x.dtype) / (size * size)
    x4 = x.transpose(2, 0, 1)[..., None]  # (C, H, W, 1)
    out = jax.lax.conv_general_dilated(
        x4, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out[..., 0].transpose(1, 2, 0)


def ssim(pred: jax.Array, target: jax.Array, data_range: float = 255.0,
         win_size: int = 7, k1: float = 0.01, k2: float = 0.03) -> jax.Array:
    """Single-image SSIM (H, W, C), skimage-compatible (uniform window,
    sample covariance normalization NP/(NP-1))."""
    x = jnp.asarray(pred, jnp.float32)
    y = jnp.asarray(target, jnp.float32)
    NP = win_size**2
    cov_norm = NP / (NP - 1)
    ux = _uniform_filter(x, win_size)
    uy = _uniform_filter(y, win_size)
    uxx = _uniform_filter(x * x, win_size)
    uyy = _uniform_filter(y * y, win_size)
    uxy = _uniform_filter(x * y, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1 = (k1 * data_range) ** 2
    C2 = (k2 * data_range) ** 2
    num = (2 * ux * uy + C1) * (2 * vxy + C2)
    den = (ux**2 + uy**2 + C1) * (vx + vy + C2)
    return jnp.mean(num / den)


def batch_psnr(pred: np.ndarray, target: np.ndarray,
               data_range: float = 255.0) -> list[float]:
    """Per-image PSNR list for (N, H, W, C) batches."""
    return [float(psnr(p, t, data_range)) for p, t in zip(pred, target)]


def batch_ssim(pred: np.ndarray, target: np.ndarray,
               data_range: float = 255.0) -> list[float]:
    return [float(ssim(p, t, data_range)) for p, t in zip(pred, target)]


def delta_psnr(gt_action_psnr: float, random_action_psnrs: Sequence[float]) -> float:
    """Controllability: PSNR(gt actions) - mean PSNR(random actions)."""
    return float(gt_action_psnr) - float(np.mean(random_action_psnrs))
