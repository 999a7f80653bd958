"""Per-embodiment ("domain") action conditioning as stacked parameter tables.

The reference keys per-domain modules by dataset-name strings in
nn.ModuleDicts (reference: hma/model/st_mask_git.py:201-251), which on
TPU would force one XLA compilation per domain. Here every per-domain
module is a single module whose parameters carry a leading
`num_domains` axis; a scalar integer `domain_id` selects the slice with
one dynamic-slice gather, so one compiled program serves all
embodiments. Action vectors are zero-padded to `max_d_action`.

Components mirrored:
  - action normalization stats  (reference: ActionStat, st_mask_git.py:128)
  - BasicMLP action stem        (reference: st_mask_git.py:90)
  - ModulateLayer (adaLN)       (reference: st_mask_git.py:51)
  - per-layer cross-attention   (reference: st_transformer.py:103)
  - action readout projector    (reference: st_mask_git.py:235)
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hma_tpu.models.attention import CrossAttention


def xavier_uniform_gain(gain: float):
    """torch.nn.init.xavier_uniform_(w, gain=g) equivalent."""
    return nn.initializers.variance_scaling(gain * gain, "fan_avg", "uniform")


# torch nn.Linear's default kaiming_uniform(a=sqrt(5)): var = 1/(3*fan_in).
torch_linear_default = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def build_action_stat_tables(d_actions: Sequence[int],
                             action_stats: Sequence[Sequence[Sequence[float]]],
                             max_d_action: int) -> tuple[np.ndarray, np.ndarray]:
    """Precompute per-domain tiled (mean, std) tables of width max_d_action.

    Each domain's stats are per *base* action dim; the model input is the
    stride-concatenated window (width = base_dim * stride), so the stats
    tile `stride` times (reference: ActionStat.forward,
    st_mask_git.py:134-138). Padding uses mean=0 / std=1 so padded dims
    pass through as zeros.
    """
    n = len(d_actions)
    means = np.zeros((n, max_d_action), dtype=np.float32)
    stds = np.ones((n, max_d_action), dtype=np.float32)
    for i, (width, stat) in enumerate(zip(d_actions, action_stats)):
        mean = np.asarray(stat[0], dtype=np.float32)
        std = np.asarray(stat[1], dtype=np.float32)
        reps = width // len(mean)
        assert reps * len(mean) == width, (width, len(mean))
        means[i, :width] = np.tile(mean, reps)
        stds[i, :width] = np.tile(std, reps)
    return means, stds


def normalize_actions(actions: jax.Array, domain_id: jax.Array,
                      mean_table: jax.Array, std_table: jax.Array) -> jax.Array:
    """(x - mean) / (std + 1e-10) with per-domain tiled stats; padded dims -> 0."""
    mean = jnp.take(mean_table, domain_id, axis=0)
    std = jnp.take(std_table, domain_id, axis=0)
    return (actions - mean) / (std + 1e-10)


def unnormalize_actions(actions: jax.Array, domain_id: jax.Array,
                        mean_table: jax.Array, std_table: jax.Array) -> jax.Array:
    mean = jnp.take(mean_table, domain_id, axis=0)
    std = jnp.take(std_table, domain_id, axis=0)
    return actions * (std + 1e-10) + mean


def take_domain(table: jax.Array, domain_id: jax.Array) -> jax.Array:
    """Select a domain's row of a stacked PARAM table.

    Static rule: a table whose leading axis is 1 is a pre-sliced
    single-domain view (sliced-gradient training, train/step.py — the
    caller already extracted the active domain's row so the backward
    never materializes num_domains-1 rows of zero gradients), so index 0
    regardless of domain_id. With num_domains == 1 the two cases
    coincide (domain_id must be 0). Config CONSTANT tables (d_actions,
    action_stats) keep their full leading axis and never route through
    here — they still need the true domain_id.
    """
    idx = domain_id if table.shape[0] != 1 else 0
    return jnp.take(table, idx, axis=0)


class DomainDense(nn.Module):
    """Dense layer with a stacked per-domain kernel, selected by domain_id."""

    num_domains: int
    in_features: int
    out_features: int
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = xavier_uniform_gain(0.01)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, domain_id: jax.Array) -> jax.Array:
        kernel = self.param("kernel", self.kernel_init,
                            (self.num_domains, self.in_features, self.out_features), jnp.float32)
        w = take_domain(kernel, domain_id).astype(self.dtype)
        y = jnp.einsum("...i,io->...o", x.astype(self.dtype), w,
                       preferred_element_type=self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.num_domains, self.out_features), jnp.float32)
            y = y + take_domain(bias, domain_id).astype(self.dtype)
        return y


class DomainLayerNorm(nn.Module):
    """LayerNorm with stacked per-domain scale/bias, computed in fp32."""

    num_domains: int
    features: int
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, domain_id: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.num_domains, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.num_domains, self.features), jnp.float32)
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mu) * jax.lax.rsqrt(var + self.epsilon)
        y = y * take_domain(scale, domain_id) + take_domain(bias, domain_id)
        return y.astype(self.dtype)


class ActionStemMLP(nn.Module):
    """Per-domain action stem: Dense -> LayerNorm -> ReLU -> Dense.

    (reference: BasicMLP, st_mask_git.py:90-98; xavier gain 0.01 init)
    """

    num_domains: int
    max_d_action: int
    d_model: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, actions: jax.Array, domain_id: jax.Array) -> jax.Array:
        h = DomainDense(self.num_domains, self.max_d_action, self.d_model,
                        dtype=self.dtype, name="fc1")(actions, domain_id)
        h = DomainLayerNorm(self.num_domains, self.d_model, dtype=self.dtype, name="ln")(h, domain_id)
        h = jax.nn.relu(h)
        return DomainDense(self.num_domains, self.d_model, self.d_model,
                           dtype=self.dtype, name="fc2")(h, domain_id)


class DomainModulate(nn.Module):
    """Token-wise adaLN modulation from action features.

    y = linear_out(norm(x) * (1 + scale) + shift), with (shift, scale)
    produced per (batch, frame) from the action embedding
    (reference: ModulateLayer, st_mask_git.py:51-76; eps 1e-6, no affine
    on the norm).
    """

    num_domains: int
    d_model: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array, domain_id: jax.Array) -> jax.Array:
        """x: (..., d_model); cond: broadcastable to x's leading dims, (..., d_model)."""
        h = DomainDense(self.num_domains, self.d_model, self.d_model,
                        kernel_init=xavier_uniform_gain(0.1),
                        dtype=self.dtype, name="ada_fc1")(cond, domain_id)
        h = jax.nn.silu(h)
        shift_scale = DomainDense(self.num_domains, self.d_model, 2 * self.d_model,
                                  kernel_init=xavier_uniform_gain(0.1),
                                  dtype=self.dtype, name="ada_fc2")(h, domain_id)
        shift, scale = jnp.split(shift_scale, 2, axis=-1)
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        normed = ((x32 - mu) * jax.lax.rsqrt(var + 1e-6)).astype(self.dtype)
        modulated = normed * (1 + scale) + shift
        return DomainDense(self.num_domains, self.d_model, self.d_model,
                           kernel_init=xavier_uniform_gain(0.1),
                           dtype=self.dtype, name="linear_out")(modulated, domain_id)


class DomainCrossAttention(nn.Module):
    """Per-domain cross-attention action injection.

    Unlike the reference (one BasicCrossAttention per domain,
    st_transformer.py:103), all domains share attention weights here via
    stacked kernels in DomainDense form. q: (B, N, C); kv: (B, M, C).

    compat="reference" reproduces the reference BasicCrossAttention
    computation exactly (hma/model/attention.py:95-132) so checkpoints
    trained with action_network="cross_attention" import faithfully:
      - the `.repeat` k/v tiling mispairs examples: query row i=b*S+s of
        the (B*S, T, C) view reads action row i % B;
      - q/k/v stay (B', T, H, D) with NO head transpose, so torch's
        batched matmul contracts over head_dim and attention runs
        ACROSS THE HEAD AXIS, per (row, timestep): softmax over an
        (H, H) table;
      - the output `transpose(1, 2).reshape(B', T, C)` reinterprets the
        (H, T, D) block as (T, H*D), scrambling heads across timesteps.
    In that mode q must be the (B, S, T, C) view (the caller's
    pre-flatten layout) so the row pairing is recoverable.
    Note the reference always builds its action projectors with
    num_heads=8, qk_norm=True and muP scale 8/head_dim regardless of the
    trunk config (st_mask_git.py:245-247) — both modes here match that.
    """

    num_domains: int
    num_heads: int
    d_model: int
    dtype: jnp.dtype = jnp.bfloat16
    compat: str = "fixed"

    @nn.compact
    def __call__(self, q: jax.Array, kv: jax.Array, domain_id: jax.Array) -> jax.Array:
        head_dim = self.d_model // self.num_heads
        scale = 8.0 / head_dim  # muP-style scale, matching BasicCrossAttention default
        dd = lambda name: DomainDense(self.num_domains, self.d_model, self.d_model,
                                      use_bias=False, dtype=self.dtype, name=name)
        # shared fp32 qk-norm, as in BasicCrossAttention (attention.py:121-127)
        ln_scale = self.param("qk_ln_scale", nn.initializers.ones, (self.num_domains, head_dim), jnp.float32)
        ln_bias = self.param("qk_ln_bias", nn.initializers.zeros, (self.num_domains, head_dim), jnp.float32)
        g = take_domain(ln_scale, domain_id)
        b = take_domain(ln_bias, domain_id)

        def _ln(u):
            u32 = u.astype(jnp.float32)
            mu = jnp.mean(u32, axis=-1, keepdims=True)
            var = jnp.var(u32, axis=-1, keepdims=True)
            return ((u32 - mu) * jax.lax.rsqrt(var + 1e-5) * g + b).astype(self.dtype)

        proj = DomainDense(self.num_domains, self.d_model, self.d_model,
                           use_bias=True, dtype=self.dtype, name="proj")

        if self.compat == "reference":
            B, S, T, C = q.shape
            H, D = self.num_heads, head_dim
            # torch `.repeat` pairing: query row i = b*S+s uses kv[i % B]
            idx = (jnp.arange(B)[:, None] * S + jnp.arange(S)[None, :]) % B
            kvp = jnp.take(kv[:, :T], idx, axis=0)  # (B, S, T, C)
            qh = dd("to_q")(q, domain_id).reshape(B, S, T, H, D)
            kh = dd("to_k")(kvp, domain_id).reshape(B, S, T, H, D)
            vh = dd("to_v")(kvp, domain_id).reshape(B, S, T, H, D)
            qh, kh = _ln(qh), _ln(kh)
            qh = qh * jnp.asarray(scale, self.dtype)
            # head-axis attention: per (b, s, t), an (H, H) softmax table
            logits = jnp.einsum("bsthd,bstgd->bsthg", qh, kh,
                                preferred_element_type=jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("bsthg,bstgd->bsthd", probs, vh)
            # torch (B', T, H, D).transpose(1, 2).reshape(B', T, C): the
            # (H, T, D) block reinterpreted row-major as (T, H*D)
            out = out.transpose(0, 1, 3, 2, 4).reshape(B, S, T, C)
            return proj(out, domain_id)

        B, N, C = q.shape
        M = kv.shape[1]
        qh = dd("to_q")(q, domain_id).reshape(B, N, self.num_heads, head_dim)
        kh = dd("to_k")(kv, domain_id).reshape(B, M, self.num_heads, head_dim)
        vh = dd("to_v")(kv, domain_id).reshape(B, M, self.num_heads, head_dim)
        qh, kh = _ln(qh), _ln(kh)
        qh = qh * jnp.asarray(scale, self.dtype)
        logits = jnp.einsum("bnhd,bmhd->bhnm", qh, kh, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", probs, vh).reshape(B, N, C)
        return proj(out, domain_id)


class ActionReadout(nn.Module):
    """Pooled action readout head: d_model -> max_d_action, per domain.

    (reference: action_out_projectors, st_mask_git.py:235)
    """

    num_domains: int
    d_model: int
    max_d_action: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, domain_id: jax.Array) -> jax.Array:
        return DomainDense(self.num_domains, self.d_model, self.max_d_action,
                           kernel_init=torch_linear_default,
                           dtype=self.dtype, name="out")(x, domain_id)
