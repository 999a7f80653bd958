"""Low-precision (bf16 + stochastic rounding) Adam moment storage.

The reference trains fp32 AdamW throughout (hma/train_multi.py:896-922);
hma_tpu adds bf16 moment *storage* (train/lowp.py) to halve optimizer
HBM — the enabler for single-chip training of the 40-domain d512
1B-class card. These tests pin down:
  1. the stochastic-rounding primitive itself (neighbors-only, unbiased,
     exact on representable values, non-finite passthrough);
  2. the failure mode that motivates SR (nearest-rounded bf16 EMA stalls
     far below its fixed point; SR tracks it);
  3. adamw_lowp ~ optax.adamw on a real optimization trajectory;
  4. the domain-sliced optimizer with bf16 moments: dtypes, closeness to
     the fp32 path, inactive-slice invariance, NaN-skip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hma_tpu.train.lowp import (
    ScaleByAdamLowpState,
    adamw_lowp,
    resolve_moment_dtype,
    stochastic_round,
)
from hma_tpu.train.step import (
    TrainState,
    _prune,
    make_domain_sliced_optimizer,
    make_optimizer,
    make_train_step,
)
from tests.test_sliced_optimizer import ND, real_grads, tiny_setup


# ---------------------------------------------------------------------------
# the rounding primitive
# ---------------------------------------------------------------------------

def test_stochastic_round_neighbors_and_unbiased():
    # bf16 spacing in [1, 2) is 2^-7 (7 explicit mantissa bits); pick x
    # exactly 1/4 of the way up.
    lo = np.float32(1.0)
    hi = np.float32(1.0 + 2.0 ** -7)
    x = np.float32(1.0 + 0.25 * 2.0 ** -7)
    n = 1 << 16
    ys = jax.vmap(
        lambda k: stochastic_round(jnp.float32(x), jnp.bfloat16, k)
    )(jax.random.split(jax.random.PRNGKey(0), n))
    ys = np.asarray(ys, np.float32)
    assert set(np.unique(ys)) == {lo, hi}
    frac_up = float(np.mean(ys == hi))
    # binomial(n, 1/4): sigma ~ 0.0017 -> 0.01 is ~6 sigma
    assert abs(frac_up - 0.25) < 0.01, frac_up


def test_stochastic_round_exact_and_special_values():
    exact = jnp.asarray([0.0, -0.0, 1.0, -1.0, 0.5, -3.140625, 2.0 ** -120],
                        jnp.float32)
    assert np.all(np.asarray(exact, jnp.bfloat16).astype(np.float32)
                  == np.asarray(exact))  # precondition: all representable
    for i in range(8):
        y = stochastic_round(exact, jnp.bfloat16, jax.random.PRNGKey(i))
        np.testing.assert_array_equal(np.asarray(y, np.float32),
                                      np.asarray(exact))
    weird = jnp.asarray([np.inf, -np.inf, np.nan], jnp.float32)
    y = np.asarray(stochastic_round(weird, jnp.bfloat16, jax.random.PRNGKey(0)),
                   np.float32)
    assert y[0] == np.inf and y[1] == -np.inf and np.isnan(y[2])
    # fp32 target is the identity (no noise injected)
    z = stochastic_round(jnp.float32(1.2345678), jnp.float32,
                         jax.random.PRNGKey(0))
    assert float(z) == np.float32(1.2345678)


def test_stochastic_round_unbiased_negative():
    lo = np.float32(-(1.0 + 2.0 ** -7))
    hi = np.float32(-1.0)
    x = np.float32(-(1.0 + 0.75 * 2.0 ** -7))
    n = 1 << 16
    ys = np.asarray(jax.vmap(
        lambda k: stochastic_round(jnp.float32(x), jnp.bfloat16, k)
    )(jax.random.split(jax.random.PRNGKey(1), n)), np.float32)
    assert set(np.unique(ys)) == {lo, hi}
    # 3/4 of the way toward the away-from-zero neighbor
    assert abs(float(np.mean(ys == lo)) - 0.75) < 0.01


def test_bf16_nearest_ema_stalls_where_sr_tracks():
    """Adam's v-EMA increments are (1-b2)=1e-3 of the running value — below
    bf16's ~2^-9 half-spacing once v passes ~0.5 of its fixed point, so
    nearest rounding freezes the EMA; SR writes stay unbiased and track."""
    b2, steps, lanes = 0.999, 4000, 512
    target = 1.0  # constant g^2
    v32 = 0.0
    v_near = jnp.zeros((), jnp.bfloat16)
    v_sr = jnp.zeros((lanes,), jnp.bfloat16)

    def sr_step(carry, k):
        v = carry.astype(jnp.float32)
        v = b2 * v + (1 - b2) * target
        return stochastic_round(v, jnp.bfloat16, k), None

    keys = jax.random.split(jax.random.PRNGKey(2), steps)
    v_sr, _ = jax.lax.scan(sr_step, v_sr, keys)
    for _ in range(steps):
        v32 = b2 * v32 + (1 - b2) * target
    near_step = jax.jit(lambda v: (b2 * v.astype(jnp.float32)
                                   + (1 - b2) * target).astype(jnp.bfloat16))
    for _ in range(steps):
        v_near = near_step(v_near)

    assert 0.95 < v32 < 1.0  # fp32 truth after 4000 steps: 1 - 0.999^4000
    assert float(v_near) < 0.7 * v32, "nearest rounding should stall"
    sr_mean = float(jnp.mean(v_sr.astype(jnp.float32)))
    assert abs(sr_mean - v32) < 0.02 * v32, (sr_mean, v32)


# ---------------------------------------------------------------------------
# adamw_lowp vs optax.adamw
# ---------------------------------------------------------------------------

def _quadratic_problem():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(64, 8)), jnp.float32)
    w_true = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
    y = x @ w_true
    params = {"w": jnp.asarray(rng.normal(size=(8, 4)) * 0.1, jnp.float32),
              "b": jnp.zeros((4,), jnp.float32)}

    def loss_fn(p):
        return jnp.mean(jnp.square(x @ p["w"] + p["b"] - y))

    return params, loss_fn


def _run(tx, params, loss_fn, steps=500):
    state = tx.init(params)

    @jax.jit
    def step(p, s):
        g = jax.grad(loss_fn)(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s

    for _ in range(steps):
        params, state = step(params, state)
    return params, state, float(loss_fn(params))


def test_adamw_lowp_tracks_fp32_trajectory():
    params, loss_fn = _quadratic_problem()
    loss0 = float(loss_fn(params))
    p32, _, l32 = _run(optax.adamw(1e-2, weight_decay=1e-4), params, loss_fn)
    plp, slp, llp = _run(adamw_lowp(1e-2, weight_decay=1e-4), params, loss_fn)

    # moments really are stored bf16
    lowp_states = [s for s in jax.tree.leaves(
        slp, is_leaf=lambda s: isinstance(s, ScaleByAdamLowpState))
        if isinstance(s, ScaleByAdamLowpState)]
    assert len(lowp_states) == 1
    for leaf in jax.tree.leaves((lowp_states[0].mu, lowp_states[0].nu)):
        assert leaf.dtype == jnp.bfloat16

    assert l32 < 1e-3 * loss0
    assert llp < 2e-3 * loss0, llp  # converges like the fp32 run
    for a, b in zip(jax.tree.leaves(plp), jax.tree.leaves(p32)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.05, atol=5e-3)


def test_resolve_moment_dtype():
    assert resolve_moment_dtype(None) is None
    assert resolve_moment_dtype("float32") is None
    assert resolve_moment_dtype("fp32") is None
    assert resolve_moment_dtype("bfloat16") == jnp.bfloat16
    assert resolve_moment_dtype("bf16") == jnp.bfloat16
    with pytest.raises(ValueError):
        resolve_moment_dtype("float16")


# ---------------------------------------------------------------------------
# the domain-sliced optimizer with bf16 moments
# ---------------------------------------------------------------------------

def _moment_dtypes(state):
    return {leaf.dtype for leaf in jax.tree.leaves((state.m, state.v))}


def test_sliced_bf16_moments_track_fp32_path():
    cfg, model, params, mask, batch_for = tiny_setup()
    kw = dict(params_template=params, stacked_mask=mask, num_domains=ND)
    tx32 = make_domain_sliced_optimizer(3e-3, 0.05, **kw)
    txlp = make_domain_sliced_optimizer(3e-3, 0.05,
                                        moment_dtype=jnp.bfloat16, **kw)

    s32, slp = tx32.init(params), txlp.init(params)
    assert _moment_dtypes(s32) == {jnp.dtype(jnp.float32)}
    assert _moment_dtypes(slp) == {jnp.dtype(jnp.bfloat16)}

    p32, plp = params, params
    for i, d in enumerate([0, 1, 0, 2, 1, 0]):
        # identical grads for both trajectories (computed off the fp32 one;
        # the trajectories stay close enough that this is well-posed)
        g = real_grads(model, p32, batch_for(d), jax.random.PRNGKey(i))
        p32, s32, _ = tx32.update_and_apply(
            g, s32, p32, jnp.asarray(d), jnp.asarray(True))
        plp, slp, _ = txlp.update_and_apply(
            g, slp, plp, jnp.asarray(d), jnp.asarray(True))

    for a, b in zip(jax.tree.leaves(plp), jax.tree.leaves(p32)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-4)
    # inactive-slice invariance survives the SR write path: domain ids
    # {0,1,2} were all visited, but each leaf's untouched *rows per step*
    # must never be perturbed — verified transitively by the allclose
    # above plus exact zero moments for never-the-max domain rows is
    # covered below with a single-domain schedule.


def test_sliced_bf16_inactive_rows_untouched():
    cfg, model, params, mask, batch_for = tiny_setup()
    tx = make_domain_sliced_optimizer(
        3e-3, 0.05, params_template=params, stacked_mask=mask,
        num_domains=ND, moment_dtype=jnp.bfloat16)
    state = tx.init(params)
    p = params
    for i in range(3):  # only domain 1 ever steps
        g = real_grads(model, p, batch_for(1), jax.random.PRNGKey(i))
        p, state, _ = tx.update_and_apply(
            g, state, p, jnp.asarray(1), jnp.asarray(True))
    for a, p0 in zip(jax.tree.leaves(_prune(mask, p, True)),
                     jax.tree.leaves(_prune(mask, params, True))):
        a, p0 = np.asarray(a), np.asarray(p0)
        np.testing.assert_array_equal(np.delete(a, 1, 0), np.delete(p0, 1, 0))
        assert np.any(a[1] != p0[1])
    for m in jax.tree.leaves(state.m):
        m = np.asarray(m, np.float32)
        assert np.all(np.delete(m, 1, 0) == 0.0)


def test_sliced_bf16_nan_skip_preserves_params():
    cfg, model, params, mask, batch_for = tiny_setup()
    tx = make_domain_sliced_optimizer(
        3e-3, 0.05, params_template=params, stacked_mask=mask,
        num_domains=ND, moment_dtype=jnp.bfloat16)
    step = jax.jit(make_train_step(model, tx))
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    bad = dict(batch_for(0))
    bad["action_ids"] = jnp.full_like(bad["action_ids"], jnp.nan)
    state2, metrics = step(state, bad, jax.random.PRNGKey(0))
    assert float(metrics["skipped"]) == 1.0
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(a, b)
    for m in jax.tree.leaves(state2.opt_state.m):
        assert np.all(np.isfinite(np.asarray(m, np.float32)))


def test_bf16_moments_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore must preserve the bf16 moment leaves bit-exactly
    (resume-with-bf16-moments is the production path for the single-chip
    1B-class run; a silent upcast on restore would double HBM back)."""
    from hma_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg, model, params, mask, batch_for = tiny_setup()
    tx = make_domain_sliced_optimizer(
        3e-3, 0.05, params_template=params, stacked_mask=mask,
        num_domains=ND, moment_dtype=jnp.bfloat16)
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    step = jax.jit(make_train_step(model, tx))
    for i in range(2):
        state, _ = step(state, batch_for(i % ND), jax.random.PRNGKey(i))

    save_checkpoint(str(tmp_path), "step_2", state)
    template = TrainState(params, tx.init(params), jnp.asarray(0))
    restored = load_checkpoint(str(tmp_path / "step_2"), template)
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32))
    assert any(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(restored))


def test_dense_mup_lowp_moments_are_bf16():
    """make_optimizer(mup_width_mult=...) partitions into matrix/other —
    both partitions' Adam moments must land in bf16."""
    cfg, model, params, mask, batch_for = tiny_setup()
    tx = make_optimizer(3e-3, 0.05, params_template=params,
                        mup_width_mult=2.0, moment_dtype=jnp.bfloat16)
    state = tx.init(params)
    lowp_states = [s for s in jax.tree.leaves(
        state, is_leaf=lambda s: isinstance(s, ScaleByAdamLowpState))
        if isinstance(s, ScaleByAdamLowpState)]
    assert len(lowp_states) == 2  # matrix + other partitions
    for s in lowp_states:
        for leaf in jax.tree.leaves((s.mu, s.nu)):
            if hasattr(leaf, "dtype"):  # MaskedNode leaves have no dtype
                assert leaf.dtype == jnp.bfloat16
    # one real step runs and moves params
    g = real_grads(model, params, batch_for(0), jax.random.PRNGKey(0))
    u, _ = tx.update(g, state, params)
    p2 = optax.apply_updates(params, u)
    moved = any(np.any(np.asarray(a) != np.asarray(b))
                for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(params)))
    assert moved
