"""Fused denoise-loop Pallas kernel (ops/diffusion_sampler.py):
interpret-mode parity vs the XLA premod sampler (itself bit-exact with
the direct per-step path, tests/test_diffusion.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from hma_tpu.models.diffloss import DiffLoss


def _randomized(model, target, z, dom, seed=42):
    params = model.init({"params": jax.random.PRNGKey(0),
                         "diffusion": jax.random.PRNGKey(1)},
                        target, z, None, dom, method=DiffLoss.loss)
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree.unflatten(
        treedef, [0.05 * jax.random.normal(k, l.shape, l.dtype)
                  for k, l in zip(keys, leaves)])


def test_loop_kernel_matches_premod_sampler():
    """Forced kernel path (interpret mode on CPU) vs the XLA sampler —
    plain and domain-stacked heads, with and without CFG/temperature."""
    for num_domains in (0, 3):
        dom = None if num_domains == 0 else jnp.asarray(1, jnp.int32)
        kw = dict(target_channels=5, z_channels=12, depth=2, width=128,
                  num_sampling_steps="10", num_domains=num_domains,
                  dtype=jnp.float32)
        kmodel = DiffLoss(**kw, loop_kernel=True)
        xmodel = DiffLoss(**kw, loop_kernel=False)
        rng = np.random.default_rng(3)
        target = jnp.asarray(rng.normal(size=(6, 5)), jnp.float32)
        z = jnp.asarray(rng.normal(size=(6, 12)), jnp.float32)
        params = _randomized(xmodel, target, z, dom)

        for cfg_scale, temp, clip in [(1.0, 1.0, True), (1.0, 0.8, False),
                                      (2.0, 1.0, True)]:
            zz = (jnp.concatenate([z, 0.5 * z], axis=0)
                  if cfg_scale != 1.0 else z)
            want = xmodel.apply(params, zz, jax.random.PRNGKey(5), temp,
                                cfg_scale, clip, dom,
                                method=DiffLoss.sample)
            got = kmodel.apply(params, zz, jax.random.PRNGKey(5), temp,
                               cfg_scale, clip, dom,
                               method=DiffLoss.sample)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-4,
                err_msg=f"domains={num_domains} cfg={cfg_scale} t={temp}")


def test_loop_kernel_under_jit_and_vocab_shapes():
    """The kernel path must trace cleanly under jit at a realistic width
    (H=128 here; the real head is 1024) and produce finite samples."""
    model = DiffLoss(target_channels=16, z_channels=64, depth=4, width=128,
                     num_sampling_steps="12", dtype=jnp.float32,
                     loop_kernel=True)
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.normal(size=(56, 16)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(56, 64)), jnp.float32)
    params = _randomized(model, target, z, None, seed=7)

    @jax.jit
    def run(params, z, key):
        return model.apply(params, z, key, 1.0, 1.0, True,
                           method=DiffLoss.sample)

    out = run(params, z, jax.random.PRNGKey(2))
    assert out.shape == (56, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_supported_gate():
    from hma_tpu.ops.diffusion_sampler import supported

    # the real MAR head: K=100, N=56 rows, C=16, H=1024, depth=4
    assert supported(100, 56, 16, 1024, 4, jnp.bfloat16)
    # interactive sim: N can be a handful of rows
    assert supported(100, 45, 16, 1024, 4, jnp.bfloat16)
    assert not supported(100, 56, 16, 1000, 4, jnp.bfloat16)  # H % 128
    assert not supported(100, 40000, 16, 1024, 4, jnp.bfloat16)  # mods slice too big
