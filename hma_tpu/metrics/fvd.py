"""FVD: Fréchet Video Distance with Flax I3D backbones (both reference variants).

Rebuild of external/common_metrics_on_video_quality: `calculate_fvd`
sweeps clip lengths >= 10 and reports the last (reference:
calculate_fvd.py:16-58). Two I3D embedding backends, matching the
reference's `method` switch (calculate_fvd.py:18-23):

  - "videogpt": 1024-d globally-pooled features, frames resized straight
    to 224x224 (reference: fvd/videogpt/fvd.py);
  - "styleganv" (the reference default and what the paper used): 400-d
    Kinetics logits head (avg_pool(2,7,7) -> 1x1x1 logits conv -> time
    mean), frames shorter-side-resized to 224 then center-cropped
    (reference: fvd/styleganv/fvd.py:9-18,37-64; the torchscript I3D is
    the same InceptionI3d graph with its logits endpoint,
    fvd/videogpt/pytorch_i3d.py:275-315).

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
        # torch i3d computes TF-style SAME padding from the input size
        # (MaxPool3dSamePadding/Unit3D.compute_pad): total = max((ceil(n/s)
        # - 1)*s + k - n, 0), split left = total//2 — exactly flax "SAME".
        x = nn.Conv(self.out, self.kernel, strides=self.strides,
                    padding="SAME", use_bias=self.use_bias, name="conv3d")(x)
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
        b3 = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1), padding="SAME")
        b3 = Unit3D(c[5], name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionI3D(nn.Module):
    """Kinetics-400 I3D.

    Input: (B, T, H, W, 3) float in [-1, 1], T >= 10. With
    `num_classes=None` returns the global-pooled 1024-d features
    (videogpt backend); with `num_classes=400` returns the Kinetics
    logits endpoint — avg_pool(2,7,7)/stride 1, 1x1x1 logits conv,
    spatial squeeze, mean over time (styleganv backend; reference:
    fvd/videogpt/pytorch_i3d.py:275-315).
    """

    num_classes: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = Unit3D(64, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = InceptionI3DBlock((64, 96, 128, 16, 32, 32), name="Mixed_3b")(x)
        x = InceptionI3DBlock((128, 128, 192, 32, 96, 64), name="Mixed_3c")(x)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
        x = InceptionI3DBlock((192, 96, 208, 16, 48, 64), name="Mixed_4b")(x)
        x = InceptionI3DBlock((160, 112, 224, 24, 64, 64), name="Mixed_4c")(x)
        x = InceptionI3DBlock((128, 128, 256, 24, 64, 64), name="Mixed_4d")(x)
        x = InceptionI3DBlock((112, 144, 288, 32, 64, 64), name="Mixed_4e")(x)
        x = InceptionI3DBlock((256, 160, 320, 32, 128, 128), name="Mixed_4f")(x)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2), padding="SAME")
        x = InceptionI3DBlock((256, 160, 320, 32, 128, 128), name="Mixed_5b")(x)
        x = InceptionI3DBlock((384, 192, 384, 48, 128, 128), name="Mixed_5c")(x)
        if self.num_classes is None:
            return jnp.mean(x, axis=(1, 2, 3))  # (B, 1024)
        # Logits endpoint: avg_pool (2,7,7)/stride 1 (valid), 1x1x1 conv,
        # squeeze spatial, mean over time -> (B, num_classes).
        x = nn.avg_pool(x, (2, 7, 7), strides=(1, 1, 1))
        x = Unit3D(self.num_classes, use_bn=False, activation=False,
                   use_bias=True, name="logits")(x)
        return jnp.mean(x, axis=(1, 2, 3))


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
        elif parts[-1] == "bias" and parts[-2] == "conv3d":
            nested(params, parts[:-1])["bias"] = v  # logits head (no bn)
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
                      resize: int = 224, backend: str = "videogpt"):
    """videos uint8 (N, T, H, W, 3) -> (N, D) features.

    backend "videogpt": D=1024 pooled features, frames resized straight to
    224x224. backend "styleganv": D=400 Kinetics logits, frames
    shorter-side-resized to 224 and center-cropped (reference:
    fvd/styleganv/fvd.py:37-64).
    """
    assert backend in ("videogpt", "styleganv"), backend
    model = InceptionI3D(num_classes=400 if backend == "styleganv" else None)
    if params is None:
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 10, resize, resize, 3)))

    @jax.jit
    def run(v):
        N, T, H, W = v.shape[:4]
        v = v.astype(jnp.float32)
        if backend == "styleganv":
            # scale shorter side to `resize`, center-crop the other
            import math

            scale = resize / min(H, W)
            th, tw = (resize, math.ceil(W * scale)) if H < W else \
                     (math.ceil(H * scale), resize)
            v = jax.image.resize(v, (N, T, th, tw, 3), "bilinear")
            h0, w0 = (th - resize) // 2, (tw - resize) // 2
            v = jax.lax.dynamic_slice(
                v, (0, 0, h0, w0, 0), (N, T, resize, resize, 3))
        else:
            v = jax.image.resize(v, (N, T, resize, resize, 3), "bilinear")
        v = v / 127.5 - 1.0
        return model.apply(params, v)

    def embed(videos: np.ndarray) -> np.ndarray:
        out = []
        for i in range(0, len(videos), batch_size):
            out.append(np.asarray(run(jnp.asarray(videos[i:i + batch_size]))))
        return np.concatenate(out)

    return embed


def calculate_fvd(pred_videos: np.ndarray, gt_videos: np.ndarray,
                  embed_fn: Optional[Callable] = None,
                  backend: str = "videogpt",
                  i3d_params: Optional[dict] = None) -> float:
    """uint8 (N, T, H, W, 3) batches -> FVD at the full clip length.

    The reference sweeps every clip length >= 10 but only its final
    (full-length) value is ever consumed (calculate_fvd.py:16-58 builds a
    dict; evaluate_diffusion.py:368-375 reads just the last) — computing
    only the full-length embedding returns the identical number at 1/(T-9)
    the cost. `backend` selects the I3D variant when no embed_fn is given;
    the reference default (and the paper's numbers) is "styleganv"."""
    assert pred_videos.shape[1] >= 10, "FVD requires clips of >= 10 frames"
    embed_fn = embed_fn or make_i3d_embed_fn(params=i3d_params, backend=backend)
    pf = embed_fn(pred_videos)
    gf = embed_fn(gt_videos)
    return float(fid_from_features(pf, gf))
