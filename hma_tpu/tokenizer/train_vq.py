"""MagVit2 tokenizer GAN training: two-optimizer step, EMA, schedulers.

Rebuild of the reference Lightning module's manual GAN loop
(external/magvit2/models/lfqgan.py:149-249):
  - generator step: L1 + LPIPS + entropy/commit + adaptive-weight
    non-saturating GAN loss (adaptive weight from last-decoder-layer
    gradient norms, computed with two extra jax.grad's like the
    reference's autograd.grad calls);
  - discriminator step: hinge loss + LeCam EMA regularizer;
  - EMA shadow params (LitEma semantics: decay min(0.9999,
    (1+n)/(10+n)), external/magvit2/modules/ema.py:11-40);
  - dual Adam(0.5, 0.9) with linear-warmup schedulers
    (lfqgan.py:217-249).
Both steps are single jitted functions.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from hma_tpu.tokenizer.discriminator import NLayerDiscriminator
from hma_tpu.tokenizer.losses import (
    LeCamState,
    adaptive_gan_weight,
    discriminator_loss,
    generator_loss,
)
from hma_tpu.tokenizer.magvit2 import VQConfig, VQModel


class VQTrainState(NamedTuple):
    gen_params: Any
    gen_opt: Any
    disc_vars: Any       # {'params': ..., 'batch_stats': ...}
    disc_opt: Any
    ema_params: Any
    ema_updates: jax.Array
    lecam: LeCamState
    step: jax.Array


def ema_decay(num_updates, base_decay: float = 0.9999):
    return jnp.minimum(base_decay, (1.0 + num_updates) / (10.0 + num_updates))


def warmup_schedule(base_lr: float, warmup_steps: int) -> optax.Schedule:
    """Linear warmup then constant (reference: Scheduler_LinearWarmup,
    external/magvit2/modules/scheduler/lr_scheduler.py:6-12)."""

    def sched(step):
        return base_lr * jnp.minimum(1.0, (step + 1) / max(warmup_steps, 1))
    return sched


def warmup_cosine_schedule(base_lr: float, warmup_steps: int, max_steps: int,
                           multiplier_min: float = 0.1) -> optax.Schedule:
    """Linear warmup then cosine decay to multiplier_min * base_lr
    (reference: Scheduler_LinearWarmup_CosineDecay, lr_scheduler.py:15-23)."""

    def sched(step):
        warm = base_lr * (step + 1) / max(warmup_steps, 1)
        prog = (step - warmup_steps) / jnp.maximum(max_steps - warmup_steps, 1)
        cos = multiplier_min + 0.5 * (1 - multiplier_min) * (1 + jnp.cos(jnp.pi * prog))
        return jnp.where(step < warmup_steps, warm, base_lr * cos)
    return sched


def init_vq_train_state(config: VQConfig, key, image_size: int = 256,
                        lr: float = 1e-4, warmup_steps: int = 1000,
                        dtype=jnp.bfloat16):
    vq = VQModel(config, dtype=dtype)
    disc = NLayerDiscriminator(input_nc=config.disc_in_channels,
                               ndf=config.disc_ndf,
                               n_layers=config.disc_num_layers)
    k1, k2 = jax.random.split(key)
    x0 = jnp.zeros((1, image_size, image_size, 3))
    gen_params = vq.init(k1, x0)
    disc_vars = disc.init(k2, x0, train=True)
    tx_gen = optax.adam(warmup_schedule(lr, warmup_steps), b1=0.5, b2=0.9)
    tx_disc = optax.adam(warmup_schedule(lr, warmup_steps), b1=0.5, b2=0.9)
    state = VQTrainState(
        gen_params=gen_params, gen_opt=tx_gen.init(gen_params),
        disc_vars=disc_vars, disc_opt=tx_disc.init(disc_vars["params"]),
        ema_params=jax.tree.map(jnp.copy, gen_params),
        ema_updates=jnp.zeros(()), lecam=LeCamState.init(),
        step=jnp.zeros((), jnp.int32))
    return vq, disc, tx_gen, tx_disc, state


def make_vq_train_step(vq: VQModel, disc: NLayerDiscriminator,
                       tx_gen, tx_disc, config: VQConfig,
                       lpips_fn: Optional[Callable] = None) -> Callable:
    """Returns step(state, images) -> (state, logs); images (B,H,W,3) in [-1,1]."""

    def forward(gen_params, images):
        recon, res = vq.apply(gen_params, images, True)
        return recon, res

    def nll_of(gen_params, images):
        recon, res = forward(gen_params, images)
        rec = jnp.abs(images - recon)
        if lpips_fn is not None and config.perceptual_weight > 0:
            rec = rec + config.perceptual_weight * jnp.mean(lpips_fn(images, recon))
        return jnp.mean(rec)

    def g_of(gen_params, images, disc_vars):
        from hma_tpu.tokenizer.losses import non_saturate_gen_loss

        recon, _ = forward(gen_params, images)
        logits_fake = disc.apply(disc_vars, recon, train=False)
        return non_saturate_gen_loss(logits_fake)

    def step(state: VQTrainState, images):
        # ---- adaptive GAN weight from last-decoder-layer grad norms ----
        last_path = ("params", "decoder", "conv_out", "kernel")

        def with_last(gen_params, last):
            p = gen_params
            inner = p["params"]["decoder"]["conv_out"]
            new_inner = {**inner, "kernel": last}
            new_dec = {**p["params"]["decoder"], "conv_out": new_inner}
            return {**p, "params": {**p["params"], "decoder": new_dec}}

        last = state.gen_params["params"]["decoder"]["conv_out"]["kernel"]
        if config.gen_loss_weight is None:
            nll_g = jax.grad(lambda l: nll_of(with_last(state.gen_params, l), images))(last)
            gan_g = jax.grad(lambda l: g_of(with_last(state.gen_params, l), images,
                                            state.disc_vars))(last)
            d_weight = adaptive_gan_weight(
                jnp.linalg.norm(nll_g.reshape(-1)),
                jnp.linalg.norm(gan_g.reshape(-1)), config.disc_weight)
        else:
            d_weight = jnp.asarray(config.gen_loss_weight, jnp.float32)

        # ---- generator update ----
        def gen_loss_fn(gen_params):
            recon, res = forward(gen_params, images)
            logits_fake = disc.apply(state.disc_vars, recon, train=False)
            total, logs = generator_loss(
                images, recon, res.entropy_loss, res.commit_loss, logits_fake,
                lpips_fn=lpips_fn, global_step=state.step, config=config,
                d_weight=d_weight)
            return total, (logs, recon)

        (gen_total, (gen_logs, recon)), gen_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen_params)
        gen_updates, gen_opt = tx_gen.update(gen_grads, state.gen_opt,
                                             state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, gen_updates)

        # ---- EMA shadow update ----
        decay = ema_decay(state.ema_updates)
        ema_params = jax.tree.map(lambda e, p: e * decay + p * (1 - decay),
                                  state.ema_params, gen_params)

        # ---- discriminator update ----
        recon_sg = jax.lax.stop_gradient(recon)

        def disc_loss_fn(disc_params):
            dvars = {**state.disc_vars, "params": disc_params}
            logits_real, new_stats = disc.apply(
                dvars, images, train=True, mutable=["batch_stats"])
            logits_fake, new_stats = disc.apply(
                {**dvars, **new_stats}, recon_sg, train=True,
                mutable=["batch_stats"])
            d_loss, lecam, d_logs = discriminator_loss(
                logits_real, logits_fake, state.lecam,
                global_step=state.step, config=config)
            return d_loss, (lecam, d_logs, new_stats)

        (d_total, (lecam, d_logs, new_stats)), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state.disc_vars["params"])
        d_updates, disc_opt = tx_disc.update(d_grads, state.disc_opt,
                                             state.disc_vars["params"])
        disc_params = optax.apply_updates(state.disc_vars["params"], d_updates)
        disc_vars = {"params": disc_params, **new_stats}

        new_state = VQTrainState(gen_params, gen_opt, disc_vars, disc_opt,
                                 ema_params, state.ema_updates + 1, lecam,
                                 state.step + 1)
        return new_state, {**gen_logs, **d_logs}

    return step
