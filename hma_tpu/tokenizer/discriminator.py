"""PatchGAN discriminator for tokenizer GAN training.

Rebuild of the reference NLayerDiscriminator
(external/magvit2/modules/discriminator/model.py:17-67): 4x4 convs,
stride-2 downsampling, BatchNorm + LeakyReLU(0.2), 1-channel patch
logits. NHWC, torch-matching N(0, 0.02) conv init.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

_conv_init = nn.initializers.normal(0.02)


def _bn_scale_init(key, shape, dtype=jnp.float32):
    """torch weights_init: BatchNorm weight ~ N(1.0, 0.02)."""
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


class NLayerDiscriminator(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        """x: (B, H, W, C) in [-1, 1] -> (B, H', W', 1) patch logits."""
        kw = 4
        # torch Conv2d(k=4, s=2, p=1): out = H/2; jax needs explicit ((1,1),(1,1))
        # which gives floor((H+2-4)/2)+1 = H/2 as well.
        pad2 = ((1, 1), (1, 1))
        h = nn.Conv(self.ndf, (kw, kw), strides=(2, 2), padding=pad2,
                    kernel_init=_conv_init, dtype=self.dtype, name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2**n, 8)
            h = nn.Conv(self.ndf * nf_mult, (kw, kw), strides=(2, 2),
                        padding=pad2, use_bias=False, kernel_init=_conv_init,
                        dtype=self.dtype, name=f"conv{n}")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             scale_init=_bn_scale_init, name=f"bn{n}")(h)
            h = nn.leaky_relu(h, 0.2)
        nf_mult = min(2**self.n_layers, 8)
        h = nn.Conv(self.ndf * nf_mult, (kw, kw), strides=(1, 1), padding=pad2,
                    use_bias=False, kernel_init=_conv_init, dtype=self.dtype,
                    name=f"conv{self.n_layers}")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         scale_init=_bn_scale_init,
                         name=f"bn{self.n_layers}")(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (kw, kw), strides=(1, 1), padding=pad2,
                       kernel_init=_conv_init, dtype=self.dtype, name="conv_out")(h)


class ActNorm(nn.Module):
    """Per-channel affine norm with data-dependent init
    (reference: external/magvit2/modules/util.py ActNorm; used when
    VQConfig.use_actnorm replaces BatchNorm in the discriminator).

    The data-dependent init uses the first batch's statistics via a
    mutable 'actnorm_stats' collection flag.
    """

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        C = x.shape[-1]
        initialized = self.variable("actnorm_stats", "initialized",
                                    lambda: jnp.zeros((), jnp.bool_))
        loc = self.param("loc", nn.initializers.zeros, (C,))
        scale = self.param("scale", nn.initializers.ones, (C,))
        if self.is_mutable_collection("actnorm_stats") and train:
            mean = jnp.mean(x, axis=tuple(range(x.ndim - 1)))
            std = jnp.std(x, axis=tuple(range(x.ndim - 1))) + 1e-6
            # data-dependent values applied on the fly for the first batch
            loc_eff = jnp.where(initialized.value, loc, -mean)
            scale_eff = jnp.where(initialized.value, scale, 1.0 / std)
            initialized.value = jnp.ones((), jnp.bool_)
        else:
            loc_eff, scale_eff = loc, scale
        return scale_eff * (x + loc_eff)
