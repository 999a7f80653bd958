"""Tokenizer GAN training losses.

Functional rebuild of VQLPIPSWithDiscriminator
(external/magvit2/modules/losses/vqperceptual.py:99-271): L1 + LPIPS
reconstruction, non-saturating generator loss with an adaptive weight
from last-layer gradient norms, hinge/vanilla/non-saturating
discriminator losses, and the LeCam EMA regularizer. All stateful pieces
(LeCam EMAs) are explicit carry values so the whole generator and
discriminator steps jit cleanly.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


def adopt_weight(weight: float, global_step, threshold: int = 0, value: float = 0.0):
    """0 before `threshold` steps (reference: vqperceptual.py:19-22).
    Works with traced global_step."""
    return jnp.where(global_step < threshold, value, weight)


def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.relu(1.0 - logits_real))
                  + jnp.mean(jax.nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real))
                  + jnp.mean(jax.nn.softplus(logits_fake)))


def _sigmoid_xent(labels, logits):
    return jax.nn.relu(logits) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def non_saturate_gen_loss(logits_fake):
    """(reference: vqperceptual.py:50-61)"""
    B = logits_fake.shape[0]
    lf = jnp.mean(logits_fake.reshape(B, -1), axis=-1)
    return jnp.mean(_sigmoid_xent(jnp.ones_like(lf), lf))


def non_saturate_discriminator_loss(logits_real, logits_fake):
    B = logits_fake.shape[0]
    lr = jnp.mean(logits_real.reshape(B, -1), axis=-1)
    lf = jnp.mean(logits_fake.reshape(B, -1), axis=-1)
    return (jnp.mean(_sigmoid_xent(jnp.ones_like(lr), lr))
            + jnp.mean(_sigmoid_xent(jnp.zeros_like(lf), lf)))


D_LOSSES = {
    "hinge": hinge_d_loss,
    "vanilla": vanilla_d_loss,
    "non_saturate": non_saturate_discriminator_loss,
}


class LeCamState(NamedTuple):
    """EMA of mean real/fake logits (reference: vqperceptual.py:82-96)."""

    real_ema: jax.Array
    fake_ema: jax.Array

    @classmethod
    def init(cls):
        return cls(jnp.zeros(()), jnp.zeros(()))


def lecam_update(state: LeCamState, logits_real, logits_fake,
                 decay: float = 0.999) -> LeCamState:
    return LeCamState(
        state.real_ema * decay + jnp.mean(logits_real) * (1 - decay),
        state.fake_ema * decay + jnp.mean(logits_fake) * (1 - decay))


def lecam_reg(logits_real, logits_fake, state: LeCamState):
    return (jnp.mean(jax.nn.relu(logits_real - state.fake_ema) ** 2)
            + jnp.mean(jax.nn.relu(state.real_ema - logits_fake) ** 2))


def adaptive_gan_weight(nll_grad_norm, g_grad_norm, disc_weight: float):
    """||∇_last nll|| / (||∇_last g|| + 1e-4), clamped to [0, 1e4]
    (reference: calculate_adaptive_weight, vqperceptual.py:138-150)."""
    w = nll_grad_norm / (g_grad_norm + 1e-4)
    return jnp.clip(w, 0.0, 1e4) * disc_weight


def generator_loss(inputs, recon, entropy_loss, commit_loss, logits_fake, *,
                   lpips_fn: Optional[Callable], global_step, config,
                   d_weight) -> tuple[jax.Array, dict]:
    """Total generator-side loss (optimizer_idx == 0 branch,
    vqperceptual.py:155-200). `d_weight` is precomputed (adaptive or
    config.gen_loss_weight)."""
    rec = jnp.abs(inputs - recon)
    nll = rec
    p_loss = jnp.zeros(())
    if lpips_fn is not None and config.perceptual_weight > 0:
        p_loss = jnp.mean(lpips_fn(inputs, recon))
        nll = nll + config.perceptual_weight * p_loss
    nll_loss = jnp.mean(nll)

    g_loss = non_saturate_gen_loss(logits_fake)
    disc_factor = adopt_weight(config.disc_factor, global_step, config.disc_start)
    g_term = d_weight * disc_factor * g_loss

    codebook_term = config.codebook_weight * entropy_loss
    total = nll_loss + g_term + codebook_term + config.commit_weight * commit_loss
    logs = {
        "nll_loss": nll_loss, "reconstruct_loss": jnp.mean(rec),
        "perceptual_loss": p_loss, "g_loss": g_loss,
        "entropy_loss": entropy_loss, "commit_loss": commit_loss,
        "d_weight": d_weight, "total_loss": total,
    }
    return total, logs


def discriminator_loss(logits_real, logits_fake, lecam: LeCamState, *,
                       global_step, config) -> tuple[jax.Array, LeCamState, dict]:
    """optimizer_idx == 1 branch (vqperceptual.py:232-271)."""
    disc_factor = adopt_weight(config.disc_factor, global_step, config.disc_start)
    base = D_LOSSES[config.disc_loss](logits_real, logits_fake)
    lecam = lecam_update(lecam, logits_real, logits_fake)
    reg = lecam_reg(logits_real, logits_fake, lecam)
    d_loss = disc_factor * (config.lecam_loss_weight * reg + base)
    logs = {"disc_loss": d_loss, "logits_real": jnp.mean(logits_real),
            "logits_fake": jnp.mean(logits_fake), "lecam_loss": reg,
            "non_saturated_d_loss": base}
    return d_loss, lecam, logs
