"""Low-precision Adam moment storage with stochastic rounding.

Why: the flagship cards' optimizer state is pure HBM ballast — fp32
m/v doubles the resident bytes of every parameter and the update pass
streams all of it each step. Storing the moments in bfloat16 halves
both, which is what lets the full 40-domain d512 STMAR card
(>1.2B params; reference headline model, /root/reference/README.md:108)
train on a SINGLE v5e chip: fp32 state needs 12 B/param = 14.7 GB
(+ gradients -> OOM on a 16 GB chip), bf16 moments need 8 B/param.

Why stochastic rounding and not nearest: Adam's second moment is an EMA
with increment (1-beta2) = 1e-3 of its magnitude — far below bf16's
~2^-8 relative resolution, so nearest-rounding accumulation *stalls*
(the update rounds away every step; `tests/test_lowp_moments.py::
test_bf16_nearest_ema_stalls_where_sr_tracks` demonstrates it). SR makes
each write unbiased, so the EMA tracks in expectation. All arithmetic
stays fp32; only the *storage* is bf16 (round-on-write, upcast-on-read)
— the same recipe production TPU trainers use for bf16 master state.

The rounding itself is the integer bit trick: an fp32 with its low 16
mantissa bits cleared IS the magnitude-truncated bf16 neighbor, so
adding a uniform 16-bit integer to the raw bits and truncating rounds
to the two neighbors with probabilities proportional to proximity.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


def stochastic_round(x: jax.Array, dtype, key: jax.Array) -> jax.Array:
    """Unbiased stochastic rounding of fp32 `x` to `dtype`.

    Only bfloat16 needs the bit trick (fp32 -> identity). Non-finite
    values pass through deterministic casting — adding noise to an
    inf/NaN bit pattern would scramble it.
    """
    dtype = jnp.dtype(dtype)
    x = x.astype(jnp.float32)
    if dtype == jnp.float32:
        return x
    if dtype != jnp.bfloat16:
        raise NotImplementedError(f"stochastic_round to {dtype}")
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    noise = jax.random.bits(key, x.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    rounded = (bits + noise) & jnp.uint32(0xFFFF0000)
    y = jax.lax.bitcast_convert_type(rounded, jnp.float32).astype(jnp.bfloat16)
    return jnp.where(jnp.isfinite(x), y, x.astype(jnp.bfloat16))


class ScaleByAdamLowpState(NamedTuple):
    count: jax.Array  # () int32
    mu: Any           # first moments, stored in moment_dtype
    nu: Any           # second moments, stored in moment_dtype


def _leaf_keys(base_key: jax.Array, tree: Any) -> Any:
    """One independent PRNG key per tree leaf (stable leaf order)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return jax.tree_util.tree_unflatten(
        treedef, [jax.random.fold_in(base_key, i)
                  for i in range(len(leaves))])


def scale_by_adam_lowp(b1: float = 0.9, b2: float = 0.999,
                       eps: float = 1e-8,
                       moment_dtype=jnp.bfloat16) -> optax.GradientTransformation:
    """optax.scale_by_adam with m/v *stored* in `moment_dtype`.

    Math is fp32 (read: upcast; write: stochastic round). The SR key is
    derived from the step count — deterministic, checkpoint-stable, and
    it costs no API change (GradientTransformation.update has no rng).
    """
    moment_dtype = jnp.dtype(moment_dtype)

    def init(params):
        zeros = lambda p: jnp.zeros(jnp.shape(p), moment_dtype)
        return ScaleByAdamLowpState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params))

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        c = count.astype(jnp.float32)
        base = jax.random.fold_in(jax.random.PRNGKey(0x10AD), count)
        mkeys = _leaf_keys(jax.random.fold_in(base, 0), updates)
        vkeys = _leaf_keys(jax.random.fold_in(base, 1), updates)

        mu32 = jax.tree.map(
            lambda m, g: b1 * m.astype(jnp.float32) + (1 - b1) * g,
            state.mu, updates)
        nu32 = jax.tree.map(
            lambda v, g: b2 * v.astype(jnp.float32) + (1 - b2) * jnp.square(g),
            state.nu, updates)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c
        out = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu32, nu32)
        new_state = ScaleByAdamLowpState(
            count=count,
            mu=jax.tree.map(lambda m, k: stochastic_round(m, moment_dtype, k),
                            mu32, mkeys),
            nu=jax.tree.map(lambda v, k: stochastic_round(v, moment_dtype, k),
                            nu32, vkeys))
        return out, new_state

    return optax.GradientTransformation(init, update)


def adamw_lowp(learning_rate, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8, weight_decay: float = 0.01,
               mask=None, moment_dtype=jnp.bfloat16) -> optax.GradientTransformation:
    """AdamW (optax.adamw's exact chain) with low-precision moments."""
    return optax.chain(
        scale_by_adam_lowp(b1, b2, eps, moment_dtype),
        optax.add_decayed_weights(weight_decay, mask),
        optax.scale_by_learning_rate(learning_rate))


def resolve_moment_dtype(spec: Optional[str]):
    """CLI string -> dtype or None (None = fp32 optax fast path)."""
    if spec in (None, "", "float32", "fp32"):
        return None
    if spec in ("bfloat16", "bf16"):
        return jnp.bfloat16
    raise ValueError(f"unsupported adam_moment_dtype: {spec!r}")
