"""Tokenizer GAN training harness + LPIPS + discriminator tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hma_tpu.metrics.lpips import LPIPS, make_lpips_fn
from hma_tpu.tokenizer.discriminator import NLayerDiscriminator
from hma_tpu.tokenizer.losses import (
    LeCamState,
    adopt_weight,
    hinge_d_loss,
    lecam_reg,
    lecam_update,
    non_saturate_gen_loss,
)
from hma_tpu.tokenizer.magvit2 import VQConfig
from hma_tpu.tokenizer.train_vq import init_vq_train_state, make_vq_train_step


def test_discriminator_shapes():
    disc = NLayerDiscriminator()
    x = jnp.zeros((2, 64, 64, 3))
    vars_ = disc.init(jax.random.PRNGKey(0), x, train=True)
    logits = disc.apply(vars_, x, train=False)
    assert logits.shape[0] == 2 and logits.shape[-1] == 1
    assert logits.shape[1] == 6  # 64 /8 via 3 stride-2 convs, then two k4 s1 p1


def test_gan_loss_functions():
    lr = jnp.asarray([[[[2.0]]], [[[2.0]]]])
    lf = jnp.asarray([[[[-2.0]]], [[[-2.0]]]])
    assert float(hinge_d_loss(lr, lf)) == 0.0  # confident disc -> zero hinge
    # generator wants fake logits high: loss decreases in logits
    assert float(non_saturate_gen_loss(lf)) > float(non_saturate_gen_loss(lr))
    assert float(adopt_weight(1.0, jnp.asarray(5), threshold=10)) == 0.0
    assert float(adopt_weight(1.0, jnp.asarray(15), threshold=10)) == 1.0

    st = LeCamState.init()
    st = lecam_update(st, lr, lf)
    assert float(st.real_ema) > 0 > float(st.fake_ema)
    assert float(lecam_reg(lr, lf, st)) >= 0


def test_lpips_identity_and_order():
    fn = make_lpips_fn(net="alex", image_size=64)
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    d_same = np.asarray(fn(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(d_same, 0.0, atol=1e-5)
    y = np.clip(x.astype(np.int32) + rng.integers(-60, 60, x.shape), 0, 255).astype(np.uint8)
    d_diff = np.asarray(fn(jnp.asarray(x), jnp.asarray(y)))
    assert (d_diff > d_same).all()


def test_lpips_vgg_param_count():
    model = LPIPS(net="vgg")
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x, x)
    convs = params["params"]["features"]
    assert len(convs) == 13  # VGG16 conv layers
    assert params["params"]["lin0"]["kernel"].shape == (1, 1, 64, 1)
    assert params["params"]["lin4"]["kernel"].shape == (1, 1, 512, 1)


def test_vq_gan_training_step_runs_and_improves():
    cfg = VQConfig(base_channels=32, ch_mult=(1, 2), num_res_blocks=1,
                   disc_ndf=16, disc_num_layers=2, disc_start=0,
                   gen_loss_weight=0.1)
    vq, disc, tx_g, tx_d, state = init_vq_train_state(
        cfg, jax.random.PRNGKey(0), image_size=32, lr=2e-4, dtype=jnp.float32)
    step = jax.jit(make_vq_train_step(vq, disc, tx_g, tx_d, cfg))

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    recs = []
    for i in range(15):
        state, logs = step(state, images)
        recs.append(float(logs["reconstruct_loss"]))
    assert np.isfinite(recs).all()
    assert recs[-1] < recs[0]  # reconstruction improves on a fixed batch
    assert int(state.step) == 15
    # EMA params differ from live params but stay close
    d = jax.tree_util.tree_leaves(
        jax.tree.map(lambda a, b: jnp.max(jnp.abs(a - b)),
                     state.ema_params, state.gen_params))
    assert max(float(x) for x in d) > 0


def test_vq_gan_adaptive_weight_path():
    cfg = VQConfig(base_channels=32, ch_mult=(1, 2), num_res_blocks=1,
                   disc_ndf=16, disc_num_layers=2, disc_start=0,
                   gen_loss_weight=None)
    vq, disc, tx_g, tx_d, state = init_vq_train_state(
        cfg, jax.random.PRNGKey(1), image_size=32, dtype=jnp.float32)
    step = jax.jit(make_vq_train_step(vq, disc, tx_g, tx_d, cfg))
    images = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (2, 32, 32, 3)),
                         jnp.float32)
    state, logs = step(state, images)
    assert np.isfinite(float(logs["d_weight"]))
    assert float(logs["d_weight"]) >= 0
