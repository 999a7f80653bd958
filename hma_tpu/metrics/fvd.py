"""FVD: Fréchet Video Distance with a Flax I3D (videogpt variant) backbone.

Rebuild of external/common_metrics_on_video_quality: `calculate_fvd`
sweeps clip lengths >= 10 and reports the last (reference:
calculate_fvd.py:16-58); embeddings come from an InceptionI3d trained on
Kinetics (videogpt backend, pytorch_i3d.py), ported here to Flax NDHWC.
Weights import from the torch checkpoint via `load_i3d_torch_weights`;
any callable `embed_fn(videos)->(N, D)` can be substituted.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hma_tpu.metrics.fid import fid_from_features


class Unit3D(nn.Module):
    out: int
    kernel: tuple = (1, 1, 1)
    strides: tuple = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        # torch i3d uses "same" padding computed per-dim
        pads = tuple(((k - 1) // 2, k // 2) for k in self.kernel)
        x = nn.Conv(self.out, self.kernel, strides=self.strides, padding=pads,
                    use_bias=self.use_bias, name="conv3d")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, name="bn")(x)
        if self.activation:
            x = nn.relu(x)
        return x


class InceptionI3DBlock(nn.Module):
    channels: tuple  # (b0, b1a, b1b, b2a, b2b, b3b)

    @nn.compact
    def __call__(self, x):
        c = self.channels
        b0 = Unit3D(c[0], name="b0")(x)
        b1 = Unit3D(c[1], name="b1a")(x)
        b1 = Unit3D(c[2], (3, 3, 3), name="b1b")(b1)
        b2 = Unit3D(c[3], name="b2a")(x)
        b2 = Unit3D(c[4], (3, 3, 3), name="b2b")(b2)
        b3 = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1),
                         padding=((1, 1),) * 3)
        b3 = Unit3D(c[5], name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionI3D(nn.Module):
    """Kinetics-400 I3D up to the global-pooled 1024-d logit features.

    Input: (B, T, H, W, 3) float in [-1, 1], T >= 10.
    """

    @nn.compact
    def __call__(self, x):
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)))
        x = Unit3D(64, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)))
        x = InceptionI3DBlock((64, 96, 128, 16, 32, 32), name="Mixed_3b")(x)
        x = InceptionI3DBlock((128, 128, 192, 32, 96, 64), name="Mixed_3c")(x)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding=((1, 1),) * 3)
        x = InceptionI3DBlock((192, 96, 208, 16, 48, 64), name="Mixed_4b")(x)
        x = InceptionI3DBlock((160, 112, 224, 24, 64, 64), name="Mixed_4c")(x)
        x = InceptionI3DBlock((128, 128, 256, 24, 64, 64), name="Mixed_4d")(x)
        x = InceptionI3DBlock((112, 144, 288, 32, 64, 64), name="Mixed_4e")(x)
        x = InceptionI3DBlock((256, 160, 320, 32, 128, 128), name="Mixed_4f")(x)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = InceptionI3DBlock((256, 160, 320, 32, 128, 128), name="Mixed_5b")(x)
        x = InceptionI3DBlock((384, 192, 384, 48, 128, 128), name="Mixed_5c")(x)
        return jnp.mean(x, axis=(1, 2, 3))  # (B, 1024)


def load_i3d_torch_weights(state_dict: dict) -> dict:
    """Convert the videogpt i3d torch state dict to flax params."""
    params: dict = {}
    bstats: dict = {}

    def nested(d, path):
        for p in path:
            d = d.setdefault(p, {})
        return d

    name_map = {"b0": "b0", "b1a": "b1a", "b1b": "b1b",
                "b2a": "b2a", "b2b": "b2b", "b3b": "b3b"}
    for k, v in state_dict.items():
        v = np.asarray(v)
        parts = k.replace("branch_", "b").split(".")
        # torch names like Mixed_3b.b0.conv3d.weight
        if parts[-1] == "weight" and parts[-2] == "conv3d":
            nested(params, parts[:-1])["kernel"] = np.transpose(v, (2, 3, 4, 1, 0))
        elif parts[-2] == "bn":
            if parts[-1] == "weight":
                nested(params, parts[:-1])["scale"] = v
            elif parts[-1] == "bias":
                nested(params, parts[:-1])["bias"] = v
            elif parts[-1] == "running_mean":
                nested(bstats, parts[:-1])["mean"] = v
            elif parts[-1] == "running_var":
                nested(bstats, parts[:-1])["var"] = v
    return {"params": params, "batch_stats": bstats}


def make_i3d_embed_fn(params: Optional[dict] = None, batch_size: int = 8,
                      resize: int = 224):
    """videos uint8 (N, T, H, W, 3) -> (N, 1024) features."""
    model = InceptionI3D()
    if params is None:
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 10, resize, resize, 3)))

    @jax.jit
    def run(v):
        N, T = v.shape[:2]
        v = jax.image.resize(v.astype(jnp.float32),
                             (N, T, resize, resize, 3), "bilinear")
        v = v / 127.5 - 1.0
        return model.apply(params, v)

    def embed(videos: np.ndarray) -> np.ndarray:
        out = []
        for i in range(0, len(videos), batch_size):
            out.append(np.asarray(run(jnp.asarray(videos[i:i + batch_size]))))
        return np.concatenate(out)

    return embed


def calculate_fvd(pred_videos: np.ndarray, gt_videos: np.ndarray,
                  embed_fn: Optional[Callable] = None) -> float:
    """uint8 (N, T, H, W, 3) batches -> FVD. Sweeps clip lengths >= 10 and
    returns the final (full-length) value (reference: calculate_fvd.py:16-58)."""
    assert pred_videos.shape[1] >= 10, "FVD requires clips of >= 10 frames"
    embed_fn = embed_fn or make_i3d_embed_fn()
    result = None
    for clip_len in range(10, pred_videos.shape[1] + 1):
        pf = embed_fn(pred_videos[:, :clip_len])
        gf = embed_fn(gt_videos[:, :clip_len])
        result = fid_from_features(pf, gf)
    return float(result)
