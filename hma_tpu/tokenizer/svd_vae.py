"""SVD temporal VAE (AutoencoderKLTemporalDecoder) in Flax.

The continuous HMA pipeline encodes frames with Stable Video Diffusion's
KL VAE (`latent_dist.mean`, 4x32x32 latents at /8, scaled by
SVD_SCALE = 0.18215) and decodes with its *temporal* decoder
(reference: datasets/utils.py:17-24,150-197 via diffusers
AutoencoderKLTemporalDecoder; diffusers is not in this image).

Architecture, NHWC:
  Encoder: SD-VAE encoder — conv_in(128) -> 4 down blocks
  (128,128/256,512,512; 2 ResnetBlocks each + strided downsample) -> mid
  (resnet, self-attention, resnet) -> GroupNorm/siLU/conv_out(8) ->
  quant_conv(1x1, 8->8); the latent is the mean half.
  TemporalDecoder: conv_in(512) -> mid + 4 up blocks of
  SpatioTemporalResBlocks (spatial ResnetBlock + temporal 3D-conv resnet
  mixed by a learned AlphaBlender) -> GroupNorm/siLU/conv_out(3) ->
  time_conv_out (3D conv (3,1,1) over the frame axis).

Weights import from the diffusers torch checkpoint via
`load_svd_vae_torch_weights`; with random weights the module runs and is
shape-tested.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _gn(c: int, name: str):
    """GroupNorm(32) as in diffusers, shrinking groups for narrow test widths."""
    return nn.GroupNorm(num_groups=min(32, c), epsilon=1e-6,
                        dtype=jnp.float32, name=name)

SVD_SCALE = 0.18215


class ResnetBlock2D(nn.Module):
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _gn(x.shape[-1], "norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(h)
        h = _gn(h.shape[-1], "norm2")(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out:
            x = nn.Conv(self.out, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head self-attention over spatial positions (SD VAE style)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = _gn(x.shape[-1], "group_norm")(x)
        h = h.reshape(B, H * W, C).astype(self.dtype)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        attn = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", q, k, preferred_element_type=jnp.float32)
            / jnp.sqrt(C), axis=-1).astype(self.dtype)
        out = jnp.einsum("bnm,bmc->bnc", attn, v)
        out = nn.Dense(C, dtype=self.dtype, name="to_out")(out)
        return x + out.reshape(B, H, W, C)


class SVDEncoder(nn.Module):
    """(B, H, W, 3) [-1,1] -> (B, H/8, W/8, 4) latent mean."""

    block_out: Sequence[int] = (128, 256, 512, 512)
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.block_out[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(x.astype(self.dtype))
        for i, out in enumerate(self.block_out):
            for j in range(2):
                h = ResnetBlock2D(out, dtype=self.dtype,
                                  name=f"down_{i}_res_{j}")(h)
            if i < len(self.block_out) - 1:
                h = nn.Conv(out, (3, 3), strides=(2, 2),
                            padding=((0, 1), (0, 1)),  # diffusers pads (0,1)
                            dtype=self.dtype, name=f"down_{i}_downsample")(h)
        h = ResnetBlock2D(self.block_out[-1], dtype=self.dtype, name="mid_res_0")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock2D(self.block_out[-1], dtype=self.dtype, name="mid_res_1")(h)
        h = _gn(h.shape[-1], "conv_norm_out")(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(2 * self.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_out")(h)
        h = nn.Conv(2 * self.latent_channels, (1, 1), dtype=self.dtype,
                    name="quant_conv")(h)
        mean, _logvar = jnp.split(h, 2, axis=-1)
        return mean


class TemporalResnetBlock(nn.Module):
    """3D-conv resnet over (T, H, W) with kernel (3,1,1)."""

    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, C)
        h = _gn(x.shape[-1], "norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                    dtype=self.dtype, name="conv1")(h)
        h = _gn(h.shape[-1], "norm2")(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(self.out, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                    dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out:
            x = nn.Conv(self.out, (1, 1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class SpatioTemporalResBlock(nn.Module):
    """Spatial resnet per frame + temporal resnet, AlphaBlender-mixed."""

    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, C)
        B, T, H, W, C = x.shape
        s = ResnetBlock2D(self.out, dtype=self.dtype, name="spatial_res_block")(
            x.reshape(B * T, H, W, C)).reshape(B, T, H, W, self.out)
        t = TemporalResnetBlock(self.out, dtype=self.dtype,
                                name="temporal_res_block")(s)
        # AlphaBlender 'learned' strategy: sigmoid(mix_factor)
        mix = self.param("mix_factor", nn.initializers.constant(0.5), (1,))
        alpha = jax.nn.sigmoid(mix)[0]
        return alpha * s + (1 - alpha) * t


class TemporalDecoder(nn.Module):
    """(B, T, h, w, 4) latents -> (B, T, 8h, 8w, 3) frames."""

    block_out: Sequence[int] = (128, 256, 512, 512)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        B, T, h, w, C = z.shape
        x = nn.Conv(self.block_out[-1], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(
            z.reshape(B * T, h, w, C).astype(self.dtype))
        x = x.reshape(B, T, h, w, -1)
        # mid: two spatio-temporal resnets with a spatial attention between
        x = SpatioTemporalResBlock(self.block_out[-1], dtype=self.dtype,
                                   name="mid_res_0")(x)
        Bt = x.shape
        xf = x.reshape(B * T, *x.shape[2:])
        xf = AttnBlock(dtype=self.dtype, name="mid_attn")(xf)
        x = xf.reshape(B, T, *xf.shape[1:])
        x = SpatioTemporalResBlock(self.block_out[-1], dtype=self.dtype,
                                   name="mid_res_1")(x)
        for i, out in enumerate(reversed(self.block_out)):
            for j in range(3):
                x = SpatioTemporalResBlock(out, dtype=self.dtype,
                                           name=f"up_{i}_res_{j}")(x)
            if i < len(self.block_out) - 1:
                B_, T_, H_, W_, C_ = x.shape
                xf = x.reshape(B_ * T_, H_, W_, C_)
                xf = jax.image.resize(xf, (B_ * T_, H_ * 2, W_ * 2, C_), "nearest")
                xf = nn.Conv(C_, (3, 3), padding=((1, 1), (1, 1)),
                             dtype=self.dtype, name=f"up_{i}_upsample")(xf)
                x = xf.reshape(B_, T_, H_ * 2, W_ * 2, C_)
        B_, T_, H_, W_, C_ = x.shape
        xf = _gn(C_, "conv_norm_out")(x.reshape(B_ * T_, H_, W_, C_))
        xf = nn.silu(xf).astype(self.dtype)
        xf = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                     name="conv_out")(xf)
        x = xf.reshape(B_, T_, H_, W_, 3)
        # temporal smoothing conv over frames (time_conv_out)
        x = nn.Conv(3, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                    dtype=self.dtype, name="time_conv_out")(x)
        return x


class SVDTemporalVAE(nn.Module):
    """Encoder + temporal decoder pair (diffusers AutoencoderKLTemporalDecoder)."""

    block_out: Sequence[int] = (128, 256, 512, 512)
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = SVDEncoder(block_out=self.block_out,
                                  latent_channels=self.latent_channels,
                                  dtype=self.dtype, name="encoder")
        self.decoder = TemporalDecoder(block_out=self.block_out,
                                       dtype=self.dtype, name="decoder")

    def encode(self, images: jax.Array) -> jax.Array:
        """(B, H, W, 3) [-1,1] -> (B, H/8, W/8, 4) latent mean (unscaled)."""
        return self.encoder(images)

    def decode(self, latents: jax.Array) -> jax.Array:
        """(B, T, h, w, 4) unscaled latents -> (B, T, H, W, 3) in [-1,1]."""
        return self.decoder(latents)

    def __call__(self, images: jax.Array, num_frames: int = 1) -> jax.Array:
        z = self.encode(images)
        B = z.shape[0] // num_frames
        z = z.reshape(B, num_frames, *z.shape[1:])
        return self.decode(z)


def _t2f(t) -> np.ndarray:
    """torch tensor / array-like -> float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _conv2d(w):  # torch OIHW -> flax HWIO
    return _t2f(w).transpose(2, 3, 1, 0)


def _conv3d(w):  # torch OIDHW -> flax DHWIO
    return _t2f(w).transpose(2, 3, 4, 1, 0)


def _linear(w):  # torch (out, in) -> flax (in, out)
    return _t2f(w).T


def _take(sd: dict, key: str) -> np.ndarray:
    if key not in sd:
        raise KeyError(f"SVD-VAE import: missing torch key {key!r}")
    return sd.pop(key)


def _map_conv2d(sd, tp):
    return {"kernel": _conv2d(_take(sd, f"{tp}.weight")),
            "bias": _t2f(_take(sd, f"{tp}.bias"))}


def _map_conv3d(sd, tp):
    return {"kernel": _conv3d(_take(sd, f"{tp}.weight")),
            "bias": _t2f(_take(sd, f"{tp}.bias"))}


def _map_gn(sd, tp):
    return {"scale": _t2f(_take(sd, f"{tp}.weight")),
            "bias": _t2f(_take(sd, f"{tp}.bias"))}


def _map_linear(sd, tp):
    return {"kernel": _linear(_take(sd, f"{tp}.weight")),
            "bias": _t2f(_take(sd, f"{tp}.bias"))}


def _map_res2d(sd, tp):
    out = {"norm1": _map_gn(sd, f"{tp}.norm1"),
           "conv1": _map_conv2d(sd, f"{tp}.conv1"),
           "norm2": _map_gn(sd, f"{tp}.norm2"),
           "conv2": _map_conv2d(sd, f"{tp}.conv2")}
    if f"{tp}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _map_conv2d(sd, f"{tp}.conv_shortcut")
    return out


def _map_res3d(sd, tp):
    out = {"norm1": _map_gn(sd, f"{tp}.norm1"),
           "conv1": _map_conv3d(sd, f"{tp}.conv1"),
           "norm2": _map_gn(sd, f"{tp}.norm2"),
           "conv2": _map_conv3d(sd, f"{tp}.conv2")}
    if f"{tp}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _map_conv3d(sd, f"{tp}.conv_shortcut")
    return out


def _map_st_res(sd, tp):
    return {"spatial_res_block": _map_res2d(sd, f"{tp}.spatial_res_block"),
            "temporal_res_block": _map_res3d(sd, f"{tp}.temporal_res_block"),
            "mix_factor": _t2f(_take(sd, f"{tp}.time_mixer.mix_factor")
                               ).reshape(1)}


def _map_attn(sd, tp):
    return {"group_norm": _map_gn(sd, f"{tp}.group_norm"),
            "to_q": _map_linear(sd, f"{tp}.to_q"),
            "to_k": _map_linear(sd, f"{tp}.to_k"),
            "to_v": _map_linear(sd, f"{tp}.to_v"),
            "to_out": _map_linear(sd, f"{tp}.to_out.0")}


def load_svd_vae_torch_weights(state_dict: dict,
                               block_out: Sequence[int] = (128, 256, 512, 512),
                               strict: bool = True) -> dict:
    """diffusers AutoencoderKLTemporalDecoder state_dict -> flax params.

    Name-maps the diffusers layout (reference loads it via
    `AutoencoderKLTemporalDecoder.from_pretrained`, datasets/utils.py:7,22)
    onto `SVDTemporalVAE`: conv weights transpose OIHW->HWIO (3D convs
    OIDHW->DHWIO), attention linears transpose, GroupNorm weight->scale,
    AlphaBlender `time_mixer.mix_factor` passes through. With `strict`,
    any unconsumed torch key (except loss/EMA extras) raises.
    """
    sd = {k: v for k, v in state_dict.items()}
    enc: dict = {"conv_in": _map_conv2d(sd, "encoder.conv_in")}
    for i in range(len(block_out)):
        for j in range(2):
            enc[f"down_{i}_res_{j}"] = _map_res2d(
                sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if i < len(block_out) - 1:
            enc[f"down_{i}_downsample"] = _map_conv2d(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
    enc["mid_res_0"] = _map_res2d(sd, "encoder.mid_block.resnets.0")
    enc["mid_attn"] = _map_attn(sd, "encoder.mid_block.attentions.0")
    enc["mid_res_1"] = _map_res2d(sd, "encoder.mid_block.resnets.1")
    enc["conv_norm_out"] = _map_gn(sd, "encoder.conv_norm_out")
    enc["conv_out"] = _map_conv2d(sd, "encoder.conv_out")
    enc["quant_conv"] = _map_conv2d(sd, "quant_conv")

    dec: dict = {"conv_in": _map_conv2d(sd, "decoder.conv_in")}
    dec["mid_res_0"] = _map_st_res(sd, "decoder.mid_block.resnets.0")
    dec["mid_attn"] = _map_attn(sd, "decoder.mid_block.attentions.0")
    dec["mid_res_1"] = _map_st_res(sd, "decoder.mid_block.resnets.1")
    for i in range(len(block_out)):
        for j in range(3):
            dec[f"up_{i}_res_{j}"] = _map_st_res(
                sd, f"decoder.up_blocks.{i}.resnets.{j}")
        if i < len(block_out) - 1:
            dec[f"up_{i}_upsample"] = _map_conv2d(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
    dec["conv_norm_out"] = _map_gn(sd, "decoder.conv_norm_out")
    dec["conv_out"] = _map_conv2d(sd, "decoder.conv_out")
    dec["time_conv_out"] = _map_conv3d(sd, "decoder.time_conv_out")

    leftovers = [k for k in sd if not k.startswith(("loss", "ema"))]
    if strict and leftovers:
        raise KeyError(f"SVD-VAE import: {len(leftovers)} unconsumed torch "
                       f"keys, e.g. {leftovers[:5]}")
    params = {"encoder": enc, "decoder": dec}
    return {"params": jax.tree.map(jnp.asarray, params)}
