"""Host/device image preprocessing for the encode pipeline.

Mirrors the reference's cv2-based resize/center-crop/normalize helpers
(datasets/utils.py:39-91) with jax.image equivalents that run on either
host CPU or TPU. The 256² target with a 1024 cap matches
`resize_image` (datasets/utils.py:39-66).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def center_crop_to_square(img: np.ndarray) -> np.ndarray:
    """Crop the larger spatial dim symmetrically to a square (h, w, c)."""
    h, w = img.shape[:2]
    side = min(h, w)
    top = (h - side) // 2
    left = (w - side) // 2
    return img[top:top + side, left:left + side]


def resize_image(img: np.ndarray, target: int = 256, keep_res: bool = False,
                 max_res: int = 1024) -> np.ndarray:
    """Center-crop to square then resize to target² (or cap at max_res when
    keeping resolution). uint8 in, uint8 out."""
    img = center_crop_to_square(img)
    side = img.shape[0]
    out = side if keep_res else target
    out = min(out, max_res)
    if side == out:
        return img
    resized = jax.image.resize(jnp.asarray(img, jnp.float32),
                               (out, out, img.shape[2]), method="bilinear")
    return np.asarray(jnp.clip(jnp.round(resized), 0, 255), dtype=np.uint8)


def normalize_image_np(img: np.ndarray) -> np.ndarray:
    """uint8 [0, 255] -> float32 [-1, 1] (reference: datasets/utils.py:69)."""
    return img.astype(np.float32) / 127.5 - 1.0


def unnormalize_image_np(img: np.ndarray) -> np.ndarray:
    return np.clip((img + 1.0) * 127.5, 0, 255).astype(np.uint8)
