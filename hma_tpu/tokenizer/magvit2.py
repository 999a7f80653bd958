"""MagVit2 (Open-MAGVIT2) VQ tokenizer: conv encoder/decoder + LFQ, in Flax.

Architecture mirrors the reference
(external/magvit2/modules/diffusionmodules/improved_model.py): GroupNorm-
swish ResBlocks, strided-conv downsampling x4 (256² -> 16², /16), an
18-channel latent sign-quantized by LFQ, and a mirrored decoder with
depth-to-space upsampling. Implemented NHWC (TPU-native conv layout);
`convert.py` imports reference NCHW torch checkpoints.

Matches external/magvit2/config.py defaults: base 128, ch_mult
(1,1,2,2,4), 2 res blocks, z_channels 18.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from hma_tpu.tokenizer.lfq import LFQResult, codes_to_latents, lfq_quantize


@dataclass
class VQConfig:
    """Tokenizer config (reference: external/magvit2/config.py:10-44)."""

    in_channels: int = 3
    z_channels: int = 18
    out_channels: int = 3
    base_channels: int = 128
    ch_mult: tuple = (1, 1, 2, 2, 4)
    num_res_blocks: int = 2

    # loss knobs (used by the GAN training harness)
    disc_conditional: bool = False
    disc_in_channels: int = 3
    disc_start: int = 0
    disc_loss: str = "hinge"
    disc_ndf: int = 64
    disc_num_layers: int = 3
    disc_factor: float = 1.0
    disc_weight: float = 0.8
    gen_loss_weight: Optional[float] = 0.1
    lecam_loss_weight: float = 0.005
    codebook_weight: float = 0.1
    commit_weight: float = 0.25
    pixelloss_weight: float = 1.0
    perceptual_weight: float = 1.0

    num_codebooks: int = 1
    codebook_size: int = 262144
    sample_minimization_weight: float = 1.0
    batch_maximization_weight: float = 1.0
    token_factorization: bool = False
    codebook_enlarge_ratio: float = 0.0
    codebook_enlarge_steps: int = 2000

    def save_pretrained(self, json_path):
        d = dataclasses.asdict(self)
        d["ch_mult"] = list(self.ch_mult)
        with open(json_path, "w") as f:
            json.dump(d, f)

    @classmethod
    def from_pretrained(cls, json_path):
        with open(json_path) as f:
            raw = json.load(f)
        names = {f.name for f in dataclasses.fields(cls)}
        cfg = cls(**{k: v for k, v in raw.items() if k in names})
        cfg.ch_mult = tuple(cfg.ch_mult)
        return cfg


def _groups(c: int) -> int:
    """32 groups at production widths (>=128 ch, torch GroupNorm(32)
    parity); the largest divisor <= 32 for small probe configs where 32
    does not divide the channel count."""
    g = min(32, c)
    while c % g:
        g -= 1
    return g


def swish(x):
    return x * jax.nn.sigmoid(x)


class ResBlock(nn.Module):
    """GroupNorm(32) -> swish -> 3x3 conv, twice, + (projected) residual."""

    out_filters: int
    use_conv_shortcut: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_filters = x.shape[-1]
        residual = x
        h = nn.GroupNorm(num_groups=_groups(x.shape[-1]), epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        h = swish(h).astype(self.dtype)
        h = nn.Conv(self.out_filters, (3, 3), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(h)
        h = nn.GroupNorm(num_groups=_groups(h.shape[-1]), epsilon=1e-6, dtype=jnp.float32, name="norm2")(h)
        h = swish(h).astype(self.dtype)
        h = nn.Conv(self.out_filters, (3, 3), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(h)
        if in_filters != self.out_filters:
            name = "conv_shortcut" if self.use_conv_shortcut else "nin_shortcut"
            ksize = (3, 3) if self.use_conv_shortcut else (1, 1)
            residual = nn.Conv(self.out_filters, ksize, use_bias=False,
                               dtype=self.dtype, param_dtype=jnp.float32,
                               name=name)(residual)
        return h + residual


class Encoder(nn.Module):
    """Image (B, H, W, 3) [-1, 1] -> latent (B, H/16, W/16, z_channels)."""

    config: VQConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        num_blocks = len(cfg.ch_mult)
        h = nn.Conv(cfg.base_channels, (3, 3), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(x.astype(self.dtype))
        for i_level in range(num_blocks):
            block_out = cfg.base_channels * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks):
                h = ResBlock(block_out, dtype=self.dtype,
                             name=f"down_{i_level}_block_{i_block}")(h)
            if i_level < num_blocks - 1:
                # explicit (1,1) padding: torch's Conv2d(stride=2, padding=1)
                # differs from SAME (which pads (0,1) on even inputs)
                h = nn.Conv(block_out, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"down_{i_level}_downsample")(h)
        for i_block in range(cfg.num_res_blocks):
            h = ResBlock(h.shape[-1], dtype=self.dtype,
                         name=f"mid_block_{i_block}")(h)
        h = nn.GroupNorm(num_groups=_groups(h.shape[-1]), epsilon=1e-6, dtype=jnp.float32, name="norm_out")(h)
        h = swish(h).astype(self.dtype)
        return nn.Conv(cfg.z_channels, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv_out")(h)


def depth_to_space(x: jax.Array, block_size: int) -> jax.Array:
    """NHWC depth-to-space, DCR (depth-column-row) order, matching the
    reference's NCHW implementation (improved_model.py:185-217)."""
    B, H, W, C = x.shape
    s = block_size
    cout = C // (s * s)
    x = x.reshape(B, H, W, s, s, cout)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H * s, W * s, cout)


class Upsampler(nn.Module):
    """3x3 conv to 4x channels, then 2x depth-to-space."""

    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Conv(self.dim * 4, (3, 3), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        return depth_to_space(h, 2)


class Decoder(nn.Module):
    """±1 latent (B, h, w, z_channels) -> image (B, 16h, 16w, 3) in [-1, 1]."""

    config: VQConfig
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.config
        num_blocks = len(cfg.ch_mult)
        block_in = cfg.base_channels * cfg.ch_mult[num_blocks - 1]
        h = nn.Conv(block_in, (3, 3), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(z.astype(self.dtype))
        for i_block in range(cfg.num_res_blocks):
            h = ResBlock(block_in, dtype=self.dtype, name=f"mid_block_{i_block}")(h)
        for i_level in reversed(range(num_blocks)):
            block_out = cfg.base_channels * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks):
                h = ResBlock(block_out, dtype=self.dtype,
                             name=f"up_{i_level}_block_{i_block}")(h)
            if i_level > 0:
                h = Upsampler(h.shape[-1], dtype=self.dtype,
                              name=f"up_{i_level}_upsample")(h)
        h = nn.GroupNorm(num_groups=_groups(h.shape[-1]), epsilon=1e-6, dtype=jnp.float32, name="norm_out")(h)
        h = swish(h).astype(self.dtype)
        return nn.Conv(cfg.out_channels, (3, 3), dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv_out")(h)


class VQModel(nn.Module):
    """Encoder + LFQ + Decoder (reference: external/magvit2/models/lfqgan.py:21).

    The GAN training harness (discriminator, LPIPS) lives in
    hma_tpu/tokenizer/losses.py; this module is the codec.
    """

    config: VQConfig
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype, name="encoder")
        self.decoder = Decoder(self.config, dtype=self.dtype, name="decoder")

    def encode_without_quantize(self, x: jax.Array) -> jax.Array:
        return self.encoder(x)

    def encode(self, x: jax.Array, compute_losses: bool = False) -> LFQResult:
        """x: (B, H, W, 3) in [-1, 1] -> LFQResult with (B, h, w) indices."""
        z = self.encoder(x)
        return lfq_quantize(
            z, compute_losses=compute_losses,
            sample_minimization_weight=self.config.sample_minimization_weight,
            batch_maximization_weight=self.config.batch_maximization_weight)

    def decode(self, quant: jax.Array) -> jax.Array:
        """quant: (B, h, w, z_channels) ±1 latents -> (B, H, W, 3)."""
        return self.decoder(quant)

    def decode_code(self, indices: jax.Array) -> jax.Array:
        """indices: (B, h, w) int32 token ids -> (B, H, W, 3) images."""
        quant = codes_to_latents(indices, self.config.z_channels, self.dtype)
        return self.decoder(quant)

    def __call__(self, x: jax.Array, compute_losses: bool = False):
        res = self.encode(x, compute_losses=compute_losses)
        recon = self.decode(res.quantized)
        return recon, res


def normalize_image(img: jax.Array) -> jax.Array:
    """uint8 [0,255] (..., H, W, 3) -> float [-1, 1]
    (reference: datasets/utils.py:69-91)."""
    return img.astype(jnp.float32) / 127.5 - 1.0


def unnormalize_image(img: jax.Array) -> jax.Array:
    """float [-1, 1] -> uint8 [0, 255], clipped."""
    return jnp.clip((img.astype(jnp.float32) + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
