"""LPIPS perceptual distance in Flax (VGG16 and AlexNet backbones).

Rebuild of the reference's two LPIPS uses:
  - VGG16 LPIPS as the tokenizer's perceptual loss
    (external/magvit2/modules/losses/lpips.py);
  - AlexNet LPIPS for eval metrics (hma/evaluate.py:338, lpips package).

Pretrained backbone + linear-head weights are required for meaningful
values and are imported from torch checkpoints via
`load_lpips_torch_weights` (the upstream `vgg.pth` / lpips package
weights); with random weights the module still runs — tests cover
structure and the d(x, x) == 0 identity.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# ImageNet scaling layer constants (lpips.py ScalingLayer)
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)

VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]
# feature taps after each ReLU block (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3)
VGG16_TAPS = (1, 3, 6, 9, 12)
VGG16_CHANNELS = (64, 128, 256, 512, 512)

ALEX_CHANNELS = (64, 192, 384, 256, 256)


class VGG16Features(nn.Module):
    """VGG16 conv trunk emitting the 5 LPIPS feature taps."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        taps = []
        conv_idx = 0
        relu_idx = 0
        for v in VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name=f"conv{conv_idx}")(x)
                x = nn.relu(x)
                if relu_idx in VGG16_TAPS:
                    taps.append(x)
                conv_idx += 1
                relu_idx += 1
        return taps


class AlexNetFeatures(nn.Module):
    """AlexNet conv trunk emitting the 5 LPIPS feature taps."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        taps = []
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=((2, 2), (2, 2)),
                    dtype=self.dtype, name="conv0")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=((2, 2), (2, 2)), dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(384, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv2")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv3")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv4")(x)
        x = nn.relu(x)
        taps.append(x)
        return taps


def _normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """d(x, y) = sum_l mean_hw( lin_l( (nx_l - ny_l)^2 ) ).

    Inputs in [-1, 1], NHWC. net: 'vgg' (tokenizer loss) or 'alex' (eval).
    """

    net: str = "vgg"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        backbone = (VGG16Features(dtype=self.dtype, name="features")
                    if self.net == "vgg"
                    else AlexNetFeatures(dtype=self.dtype, name="features"))
        channels = VGG16_CHANNELS if self.net == "vgg" else ALEX_CHANNELS

        def scale(v):
            return (v - _SHIFT) / _SCALE

        fx = backbone(scale(x.astype(jnp.float32)))
        fy = backbone(scale(y.astype(jnp.float32)))
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            diff = (_normalize_tensor(a) - _normalize_tensor(b)) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                          kernel_init=nn.initializers.ones, name=f"lin{i}")
            total = total + jnp.mean(lin(diff), axis=(1, 2, 3))
        return total  # (B,)


def load_lpips_torch_weights(model: LPIPS, state_dict: dict) -> dict:
    """Convert a torch LPIPS state dict (lpips package layout:
    net.slice*/ features.* convs + lin*.model.1.weight) to flax params."""
    params: dict = {"features": {}, }
    conv_i = 0
    # torch vgg features are numbered by sequential index; collect conv weights in order
    conv_keys = sorted(
        [k for k in state_dict if k.endswith(".weight") and k.startswith("net.")
         and state_dict[k].ndim == 4],
        key=lambda k: [int(t) for t in k.split(".") if t.isdigit()])
    for k in conv_keys:
        w = np.asarray(state_dict[k])
        b = np.asarray(state_dict[k[:-len("weight")] + "bias"])
        params["features"][f"conv{conv_i}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)), "bias": b}
        conv_i += 1
    for i in range(5):
        for cand in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if cand in state_dict:
                w = np.asarray(state_dict[cand])
                params[f"lin{i}"] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
                break
    return {"params": params}


def make_lpips_fn(params: Optional[dict] = None, net: str = "vgg",
                  image_size: int = 256):
    """Returns lpips(x_uint8, y_uint8) -> (B,) distances (jitted)."""
    model = LPIPS(net=net)
    if params is None:
        x0 = jnp.zeros((1, image_size, image_size, 3))
        params = model.init(jax.random.PRNGKey(0), x0, x0)

    @jax.jit
    def run(x, y):
        xs = x.astype(jnp.float32) / 127.5 - 1.0
        ys = y.astype(jnp.float32) / 127.5 - 1.0
        return model.apply(params, xs, ys)

    return run
