"""FID: Fréchet distance + Flax InceptionV3 (pytorch-fid variant).

Rebuild of external/pytorch-fid/{inception.py,fid_score.py}: the
`calculate_fid(pred, gt)` entry takes two uint8 image batches, embeds
them with the InceptionV3 pool3 features (2048-d), and returns the
Fréchet distance between the fitted Gaussians
(reference: fid_score.py:285-307).

The network is the FID-specific InceptionV3 (TF-ported weights, BasicConv
with BN eps 1e-3, no aux logits); weights load from the pytorch-fid
checkpoint via `load_inception_torch_weights`. The distance math is exact
and independently tested; any callable `embed_fn(images)->(N, D)` can be
substituted.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from scipy import linalg


# ---------------------------------------------------------------------------
# Fréchet distance (reference: fid_score.py calculate_frechet_distance)
# ---------------------------------------------------------------------------

def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def activation_statistics(feats: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    mu = np.mean(feats, axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def fid_from_features(pred_feats: np.ndarray, gt_feats: np.ndarray) -> float:
    return frechet_distance(*activation_statistics(pred_feats),
                            *activation_statistics(gt_feats))


# ---------------------------------------------------------------------------
# InceptionV3 (FID variant) in Flax
# ---------------------------------------------------------------------------

class BasicConv(nn.Module):
    out: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: tuple | str = "VALID"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, name="bn")(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=((2, 2), (2, 2)), name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_3")(b3)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                         count_include_pad=False)
        bp = BasicConv(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                         count_include_pad=False)
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool: str = "avg"  # fid variant uses max pool in the last block

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=((1, 1), (1, 1)), name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool == "avg":
            bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                             count_include_pad=False)
        else:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """pool3 (2048-d) feature extractor; input (B, 299, 299, 3) in [-1, 1]."""

    @nn.compact
    def __call__(self, x):
        x = BasicConv(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=((1, 1), (1, 1)), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(pool="max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # global avg pool -> (B, 2048)


def load_inception_torch_weights(state_dict: dict) -> dict:
    """Convert pytorch-fid InceptionV3 state dict to flax params."""
    params: dict = {}
    bstats: dict = {}
    for k, v in state_dict.items():
        v = np.asarray(v)
        parts = k.split(".")
        if parts[-2] == "conv" and parts[-1] == "weight":
            node = _nested(params, parts[:-2] + ["conv"])
            node["kernel"] = np.transpose(v, (2, 3, 1, 0))
        elif parts[-2] == "bn":
            if parts[-1] == "weight":
                _nested(params, parts[:-1])["scale"] = v
            elif parts[-1] == "bias":
                _nested(params, parts[:-1])["bias"] = v
            elif parts[-1] == "running_mean":
                _nested(bstats, parts[:-1])["mean"] = v
            elif parts[-1] == "running_var":
                _nested(bstats, parts[:-1])["var"] = v
    return {"params": params, "batch_stats": bstats}


def _nested(d: dict, path):
    for p in path:
        d = d.setdefault(p, {})
    return d


def make_inception_embed_fn(params: Optional[dict] = None, batch_size: int = 32):
    """images uint8 (N, H, W, 3) -> (N, 2048) float features."""
    model = InceptionV3FID()
    if params is None:
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))

    @jax.jit
    def run(x):
        x = jax.image.resize(x.astype(jnp.float32), (x.shape[0], 299, 299, 3),
                             "bilinear")
        x = x / 127.5 - 1.0
        return model.apply(params, x)

    def embed(images: np.ndarray) -> np.ndarray:
        out = []
        for i in range(0, len(images), batch_size):
            chunk = np.asarray(images[i:i + batch_size])
            out.append(np.asarray(run(jnp.asarray(chunk))))
        return np.concatenate(out)

    return embed


def calculate_fid(pred_images: np.ndarray, gt_images: np.ndarray,
                  embed_fn: Optional[Callable] = None) -> float:
    """(reference: fid_score.py:285-307) — uint8 image batches in, FID out."""
    embed_fn = embed_fn or make_inception_embed_fn()
    return fid_from_features(embed_fn(pred_images), embed_fn(gt_images))
