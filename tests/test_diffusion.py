"""Gaussian diffusion math + DiffLoss tests, with torch-reference oracles
where the reference tree is available."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hma_tpu.diffusion.gaussian import (
    cosine_betas,
    make_schedule,
    p_sample_loop,
    q_sample,
    space_timesteps,
    training_losses,
)
from hma_tpu.models.diffloss import DiffLoss, SimpleMLPAdaLN, timestep_embedding

REF = "/root/reference"


def test_schedule_against_reference():
    """Betas / posterior terms must match the vendored OpenAI math."""
    if not os.path.isdir(REF):
        pytest.skip("reference unavailable")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from hma.diffusion import gaussian_diffusion as gd
    from hma.diffusion.respace import SpacedDiffusion, space_timesteps as ref_space

    ref_betas = gd.get_named_beta_schedule("cosine", 1000)
    np.testing.assert_allclose(cosine_betas(1000), ref_betas, rtol=1e-12)

    assert space_timesteps(1000, "100") == sorted(ref_space(1000, "100"))

    ref = SpacedDiffusion(use_timesteps=ref_space(1000, "100"),
                          betas=ref_betas,
                          model_mean_type=gd.ModelMeanType.EPSILON,
                          model_var_type=gd.ModelVarType.LEARNED_RANGE,
                          loss_type=gd.LossType.MSE)
    ours = make_schedule("cosine", 1000, "100")
    np.testing.assert_allclose(ours.betas, ref.betas, rtol=1e-10)
    np.testing.assert_allclose(ours.posterior_mean_coef1, ref.posterior_mean_coef1, rtol=1e-10)
    np.testing.assert_allclose(ours.posterior_log_variance_clipped,
                               ref.posterior_log_variance_clipped, rtol=1e-10)
    np.testing.assert_array_equal(ours.timestep_map, np.asarray(ref.timestep_map))


def test_q_sample_identity():
    sched = make_schedule("cosine", 1000)
    x0 = jnp.ones((4, 8))
    noise = jnp.zeros((4, 8))
    t = jnp.zeros((4,), jnp.int32)
    xt = q_sample(sched, x0, t, noise)
    np.testing.assert_allclose(np.asarray(xt), np.sqrt(sched.alphas_cumprod[0]), rtol=1e-6)


def test_timestep_embedding_matches_reference():
    if not os.path.isdir(REF):
        pytest.skip("reference unavailable")
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from hma.model.diffloss import TimestepEmbedder

    t = np.asarray([0, 1, 57, 999], np.float32)
    ref = TimestepEmbedder.timestep_embedding(torch.from_numpy(t), 256).numpy()
    ours = np.asarray(timestep_embedding(jnp.asarray(t), 256))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_diffloss_train_and_sample():
    model = DiffLoss(target_channels=4, z_channels=16, depth=2, width=32,
                     num_sampling_steps="10", dtype=jnp.float32)
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    mask = jnp.asarray([1, 1, 0, 0, 1, 1, 1, 0], jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "diffusion": jax.random.PRNGKey(1)},
                        target, z, mask, method=DiffLoss.loss)
    loss = model.apply(params, target, z, mask,
                       rngs={"diffusion": jax.random.PRNGKey(2)},
                       method=DiffLoss.loss)
    assert np.isfinite(float(loss))

    sample = model.apply(params, z, jax.random.PRNGKey(3), 1.0, 1.0, True,
                         method=DiffLoss.sample)
    assert sample.shape == (8, 4)
    assert np.isfinite(np.asarray(sample)).all()

    # CFG path: with temperature 0 (no ancestral noise) the duplicated
    # halves produce identical guided samples
    z2 = jnp.concatenate([z, z * 0], axis=0)
    s2 = model.apply(params, z2, jax.random.PRNGKey(4), 0.0, 2.0, True,
                     method=DiffLoss.sample)
    np.testing.assert_allclose(np.asarray(s2[:8]), np.asarray(s2[8:]), rtol=1e-4, atol=1e-5)


def test_premod_sampler_matches_loop():
    """The premodulated sampler (precompute all (t, c)-dependent work,
    loop only the residual MLP) must reproduce the direct per-step net
    evaluation exactly — same ops, same order, same RNG sequence — for
    both the plain and the domain-stacked head, with and without CFG."""
    for num_domains in (0, 3):
        dom = None if num_domains == 0 else jnp.asarray(1, jnp.int32)
        model = DiffLoss(target_channels=5, z_channels=12, depth=2, width=48,
                         num_sampling_steps="15", num_domains=num_domains,
                         dtype=jnp.bfloat16)
        rng = np.random.default_rng(1)
        target = jnp.asarray(rng.normal(size=(6, 5)), jnp.float32)
        z = jnp.asarray(rng.normal(size=(6, 12)), jnp.float32)
        params = model.init({"params": jax.random.PRNGKey(0),
                             "diffusion": jax.random.PRNGKey(1)},
                            target, z, None, dom, method=DiffLoss.loss)
        # DiT zero-init leaves every adaLN/final kernel at 0, which would
        # make the comparison vacuous — randomize all params
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
        params = jax.tree.unflatten(
            treedef, [0.05 * jax.random.normal(k, l.shape, l.dtype)
                      for k, l in zip(keys, leaves)])

        for cfg_scale, temp, clip in [(1.0, 1.0, False), (1.0, 0.7, True),
                                      (1.5, 1.0, True)]:
            zz = (jnp.concatenate([z, 0.5 * z], axis=0)
                  if cfg_scale != 1.0 else z)
            direct = model.apply(params, zz, jax.random.PRNGKey(7), temp,
                                 cfg_scale, clip, dom, False,
                                 method=DiffLoss.sample)
            premod = model.apply(params, zz, jax.random.PRNGKey(7), temp,
                                 cfg_scale, clip, dom, True,
                                 method=DiffLoss.sample)
            assert np.isfinite(np.asarray(direct)).all()
            np.testing.assert_array_equal(np.asarray(premod),
                                          np.asarray(direct))


def test_diffloss_overfits_conditional_mean():
    """With enough steps, samples should drift toward the (conditional)
    target distribution — sanity check that the loss trains the net."""
    import optax

    model = DiffLoss(target_channels=2, z_channels=2, depth=1, width=64,
                     num_sampling_steps="20", dtype=jnp.float32)
    rng = np.random.default_rng(0)
    z = jnp.asarray(np.repeat(np.eye(2, dtype=np.float32), 32, axis=0))  # 2 conditions
    target = z * 0.8 - 0.4  # per-condition targets inside the clip range
    params = model.init({"params": jax.random.PRNGKey(0),
                         "diffusion": jax.random.PRNGKey(1)},
                        target, z, None, method=DiffLoss.loss)
    tx = optax.adam(2e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        def loss_fn(p):
            return model.apply(p, target, z, None, rngs={"diffusion": key},
                               method=DiffLoss.loss)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    losses = []
    for i in range(300):
        params, opt, loss = step(params, opt, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.mean(losses[-20:]) < np.mean(losses[:20])

    s = model.apply(params, z[jnp.asarray([0, 32])], jax.random.PRNGKey(99),
                    0.0, 1.0, True, method=DiffLoss.sample)
    # condition 0 -> (0.4, -0.4); condition 1 -> (-0.4, 0.4), loosely
    assert float(s[0, 0]) > float(s[0, 1])  # condition 0
    assert float(s[1, 1]) > float(s[1, 0])  # condition 1


def test_training_losses_extreme_logvar_keeps_grads_finite():
    """Regression for the where-NaN trap in training_losses (gaussian.py).

    `vb = where(t==0, nll, kl)` evaluates both branches per row. A t==0
    row whose learned-variance output v has drifted strongly negative
    makes the DISCARDED kl branch overflow (exp(logvar1 - logvar2) = inf):
    the loss stays finite, but backward propagates 0 * inf = NaN into the
    grads — which then poisons every parameter through
    clip_by_global_norm unless skipped. This reproduced the 2026-08-19
    d512 STMAR overfit failure. The double-where fix must keep the loss
    value identical AND the grads finite."""
    sched = make_schedule("cosine", 1000)
    N, C = 8, 4
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (N, C), jnp.float32) * 0.1
    # row 0 takes the nll branch (t==0); its extreme v must not NaN the
    # kl branch's backward. Rows 1.. take the kl branch with benign v.
    t = jnp.asarray([0, 1, 2, 17, 250, 500, 750, 999], jnp.int32)

    def loss_of(vraw):
        def net(xt, tt, cond):
            eps = jnp.zeros_like(xt)
            v = jnp.where((tt == 0)[:, None], vraw, 0.0) * jnp.ones_like(xt)
            return jnp.concatenate([eps, v], axis=-1)
        out = training_losses(net, sched, x0, t, None, jax.random.PRNGKey(1))
        return jnp.mean(out["loss"]), out

    (val, out), grad = jax.value_and_grad(loss_of, has_aux=True)(-4000.0)
    assert np.isfinite(float(val)), "forward must be finite (where discards)"
    assert np.all(np.isfinite(np.asarray(out["vb"])))
    assert np.isfinite(float(grad)), (
        "NaN grad through the discarded vb branch — double-where broken")

    # mirrored case: extreme v on a t!=0 row must not NaN the discarded
    # nll branch's backward (exp(-log_scales) = inf there).
    def loss_of2(vraw):
        def net(xt, tt, cond):
            eps = jnp.zeros_like(xt)
            v = jnp.where((tt == 1)[:, None], vraw, 0.0) * jnp.ones_like(xt)
            return jnp.concatenate([eps, v], axis=-1)
        out = training_losses(net, sched, x0, t, None, jax.random.PRNGKey(1))
        return jnp.mean(out["loss"])

    val2, grad2 = jax.value_and_grad(loss_of2)(-4000.0)
    # the SELECTED kl branch at that row may legitimately be inf/huge for
    # such a v — the guard in train_step handles that visibly; what must
    # never happen is a finite loss with a NaN grad.
    if np.isfinite(float(val2)):
        assert np.isfinite(float(grad2))
