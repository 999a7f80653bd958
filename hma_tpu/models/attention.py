"""Attention primitives for the ST transformer.

TPU-first equivalents of the reference attention stack
(reference: hma/model/attention.py):
  - fused QKV projection, optional shared fp32 qk-LayerNorm over head_dim,
    muP scale 8/head_dim;
  - bidirectional (spatial) and causal (temporal) self-attention;
  - an incremental `decode_step` path for the temporal axis backed by an
    explicit KV cache, which the reference lacks entirely — its rollout
    recomputes the full stack per MaskGIT step (hma/generate.py:157).

Kernel strategy (all measured on v5e; experiments/attn_probe.py and
experiments/temporal_probe.py):
  - spatial pass (B*T=96, S=320, H=8, D=32, bidirectional): the
    whole-block Pallas kernel in `hma_tpu.ops.fused_attention` wins
    1.64x over XLA on forward+backward (3.18 vs 5.22 ms) by keeping the
    fp32 S x S logits in VMEM in BOTH directions.
  - temporal pass (B*S=2560, T=12, causal): the site-on-lanes kernel in
    `hma_tpu.ops.temporal_attention` wins ~2.5x on forward+backward
    (1.9 vs 5.4 ms) — XLA pads every T-sized minor dim to the (8, 128)
    tile, a 10-40x blowup the lane-major layout avoids entirely.
  - both gates are in `_use_fused`; decode paths (KV cache) stay XLA.
  - discarded alternatives: a grid-per-(b,h) whole-block kernel with an
    XLA backward lost to XLA by ~11% end-to-end; the stock jax
    flash_attention kernel is 2.6x slower at S=320/D=32 and its
    backward fails to lower at D=32.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

# "auto" (default): fused kernel on a single TPU device; "never": always
# XLA; "always": force the kernel (e.g. future shard_map integration).
_FUSED_MODE = os.environ.get("HMA_TPU_FUSED_ATTN", "auto")


def _use_fused(shape, causal: bool) -> bool:
    """Whether a Pallas kernel applies to this full-pass attention shape
    (trace-time decision). Bidirectional (spatial) shapes route to the
    whole-block kernel in ops/fused_attention; causal (temporal) shapes
    with tiny T route to the site-on-lanes kernel in
    ops/temporal_attention. Multi-device meshes are handled by each
    kernel's custom_partitioning rule, so this is purely a backend/shape
    gate.
    """
    if _FUSED_MODE == "never":
        return False
    if causal:
        from hma_tpu.ops.temporal_attention import supported
    else:
        from hma_tpu.ops.fused_attention import supported

    if not supported(shape, shape[-1]):
        return False
    if _FUSED_MODE == "always":
        return True
    return jax.default_backend() not in ("cpu", "gpu")

# Decoder-internal linears use xavier_uniform(gain=0.1), matching the
# reference's STTransformerDecoder._init_weights (st_transformer.py:159-169).
# Without pre-LN in the blocks (the qk_norm quirk), larger inits make the
# residual stream grow exponentially with depth.
_DECODER_INIT = nn.initializers.variance_scaling(0.1 * 0.1, "fan_avg", "uniform")


def _attend(q: jax.Array, k: jax.Array, v: jax.Array, *,
            causal: bool, kv_mask: Optional[jax.Array] = None,
            dtype=jnp.bfloat16) -> jax.Array:
    """Scaled dot-product attention. q,k,v: (B, N|M, H, D); q is pre-scaled.

    Logits and softmax run in fp32 (the reference runs under bf16 autocast
    where softmax is fp32); output is cast back to `dtype`.
    """
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    if causal:
        n, m = logits.shape[-2], logits.shape[-1]
        # Align the causal diagonal to the *end* of the kv axis so a
        # single-query decode step attends to every cached position.
        row = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
        logits = jnp.where(col - (m - n) > row, NEG_INF, logits)
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v)


class SelfAttention(nn.Module):
    """Self-attention with fused QKV and shared fp32 qk-LayerNorm.

    Mirrors the reference semantics (hma/model/attention.py:10-61): a
    single LayerNorm module normalizes both q and k per head over
    head_dim, and scale = 8/head_dim under muP else head_dim**-0.5.
    Quirk preserved: the reference constructs `nn.Dropout(attn_drop)` but
    never calls it in forward (attention.py:29,37-61), so `attn_drop`
    (0.1 in the MAR model cards) is a no-op there and here.
    """

    num_heads: int
    d_model: int
    qkv_bias: bool = False
    proj_bias: bool = True
    qk_norm: bool = True
    use_mup: bool = True
    attn_drop: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.head_dim = self.d_model // self.num_heads
        self.scale = 8.0 / self.head_dim if self.use_mup else self.head_dim**-0.5
        self.qkv = nn.Dense(3 * self.d_model, use_bias=self.qkv_bias,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            kernel_init=_DECODER_INIT, name="qkv")
        self.proj = nn.Dense(self.d_model, use_bias=self.proj_bias,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             kernel_init=_DECODER_INIT, name="proj")
        if self.qk_norm:
            # One LN applied to both q and k, in fp32 (reference: attention.py:43-48).
            self.norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                     param_dtype=jnp.float32, name="norm")

    def _qkv(self, x: jax.Array):
        B, N, _ = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, self.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.qk_norm:
            q = self.norm(q.astype(jnp.float32)).astype(self.dtype)
            k = self.norm(k.astype(jnp.float32)).astype(self.dtype)
        q = q * jnp.asarray(self.scale, dtype=self.dtype)
        return q, k, v

    def __call__(self, x: jax.Array, causal: bool = False) -> jax.Array:
        B, N, C = x.shape
        q, k, v = self._qkv(x)
        if _use_fused(q.shape, causal):
            if causal:
                from hma_tpu.ops.temporal_attention import (
                    fused_temporal_attention)

                out = fused_temporal_attention(q, k, v)
            else:
                from hma_tpu.ops.fused_attention import fused_attention

                out = fused_attention(q, k, v, causal)
        else:
            out = _attend(q, k, v, causal=causal, dtype=self.dtype)
        # Tag for the "attn" remat policy (save_only_these_names): saving
        # this one (B, N, C) tensor per attention lets the backward pass
        # skip re-running the attention forward during remat, at ~16 MB
        # per layer per pass — see STTransformerDecoder.remat_policy.
        out = jax.ad_checkpoint.checkpoint_name(out, "attn_out")
        return self.proj(out.reshape(B, N, C))

    def temporal_resident(self, x_BTSC: jax.Array) -> jax.Array:
        """Causal temporal attention with the residual stream kept in
        (B, T, S, C) layout — no (B,T,S,C)<->(B,S,T,C) transpose pair.

        The Pallas site-on-lanes kernel's internal layout is (H, T, D, N)
        with N = B*S on lanes; this path produces that layout directly
        from the per-head qkv tensors (one 5-D transpose each, replacing
        the residual transpose + wrapper transpose of the default path).
        Falls back to the XLA path (via an explicit regroup) off-TPU.
        """
        B, T, S, C = x_BTSC.shape
        H, D = self.num_heads, self.head_dim
        qkv = self.qkv(x_BTSC).reshape(B, T, S, 3, H, D)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        if self.qk_norm:
            q = self.norm(q.astype(jnp.float32)).astype(self.dtype)
            k = self.norm(k.astype(jnp.float32)).astype(self.dtype)
        q = q * jnp.asarray(self.scale, dtype=self.dtype)

        if _use_fused((B * S, T, H, D), True):
            from hma_tpu.ops.temporal_attention import (
                fused_temporal_attention_kl)

            def to_kl(u):  # (B,T,S,H,D) -> (H,T,D,B*S)
                return u.transpose(3, 1, 4, 0, 2).reshape(H, T, D, B * S)

            out = fused_temporal_attention_kl(to_kl(q), to_kl(k), to_kl(v))
            out = (out.reshape(H, T, D, B, S)
                      .transpose(3, 1, 4, 0, 2).reshape(B, T, S, C))
        else:
            def to_n(u):  # (B,T,S,H,D) -> (B*S, T, H, D)
                return u.transpose(0, 2, 1, 3, 4).reshape(B * S, T, H, D)

            out = _attend(to_n(q), to_n(k), to_n(v), causal=True,
                          dtype=self.dtype)
            out = (out.reshape(B, S, T, H * D).transpose(0, 2, 1, 3))
        out = jax.ad_checkpoint.checkpoint_name(out, "attn_out")
        return self.proj(out)

    def decode_step(self, x_t: jax.Array, k_cache: jax.Array, v_cache: jax.Array,
                    t: jax.Array):
        """Causal attention for one timestep against a read-only KV cache.

        Args:
            x_t: (B, 1, C) current-timestep activations.
            k_cache/v_cache: (B, T_max, H, D) cached (post-qk-norm) keys and
                values for timesteps < t; entries at >= t are ignored.
            t: scalar int32 current timestep.

        Returns:
            (out, k_t, v_t): the attention output and this timestep's K/V
            slices (B, 1, H, D). The caller decides whether to write them
            into the cache — keeping the cache read-only here lets MaskGIT
            refinement steps run without forcing whole-cache copies
            (measured: the fastest of the layouts tried on v5e; a
            lane-aligned (T, N, C) grouped-head variant benched slower).
        """
        B = x_t.shape[0]
        q, k, v = self._qkv(x_t)
        t_max = k_cache.shape[1]
        k_all = jnp.concatenate([k_cache, k], axis=1)
        v_all = jnp.concatenate([v_cache, v], axis=1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (B, t_max + 1), 1)
        valid = (iota < t) | (iota == t_max)
        out = _attend(q, k_all, v_all, causal=False, kv_mask=valid,
                      dtype=self.dtype)
        return self.proj(out.reshape(B, 1, self.d_model)), k, v

    def decode_window(self, x: jax.Array, k_cache: jax.Array,
                      v_cache: jax.Array, t0: jax.Array):
        """Causal attention for F consecutive timesteps [t0, t0+F) against
        a read-only KV cache holding timesteps < t0.

        x: (B, F, C). Returns (out (B, F, C), k_w, v_w) where k_w/v_w are
        the window's (B, F, H, D) KV slices for the caller to write.
        Fusing several timesteps into one pass shares every op across the
        window — this is what makes one-pass prefill and the fused
        fill+first-refinement rollout passes cheap.
        """
        B, F, C = x.shape
        q, k, v = self._qkv(x)  # (B, F, H, D)
        t_max = k_cache.shape[1]
        k_all = jnp.concatenate([k_cache, k], axis=1)  # (B, T+F, H, D)
        v_all = jnp.concatenate([v_cache, v], axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, (F, t_max + F), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (F, t_max + F), 0)
        # cache slots valid below t0; window slots causal within the window
        valid = jnp.where(col < t_max, col < t0, (col - t_max) <= row)
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k_all,
                            preferred_element_type=jnp.float32)
        logits = jnp.where(valid[None, None], logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", probs, v_all).reshape(B, F, C)
        return self.proj(out), k, v


class CrossAttention(nn.Module):
    """Cross-attention used by action stems (reference: attention.py:64).

    q: (B, N, d_model); k/v: (B, M, d_model). Unlike the reference, k/v
    broadcast per-example (the reference's `.repeat` tiles the whole
    tensor, mispairing examples when B_q > B_kv — a latent bug we do not
    replicate); callers expand k/v to q's batch themselves.
    """

    num_heads: int
    d_model: int
    qkv_bias: bool = False
    proj_bias: bool = True
    qk_norm: bool = True
    use_mup: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.head_dim = self.d_model // self.num_heads
        self.scale = 8.0 / self.head_dim if self.use_mup else self.head_dim**-0.5
        dense = lambda name: nn.Dense(self.d_model, use_bias=self.qkv_bias,
                                      dtype=self.dtype, param_dtype=jnp.float32,
                                      kernel_init=_DECODER_INIT, name=name)
        self.to_q, self.to_k, self.to_v = dense("to_q"), dense("to_k"), dense("to_v")
        self.proj = nn.Dense(self.d_model, use_bias=self.proj_bias,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             kernel_init=_DECODER_INIT, name="proj")
        if self.qk_norm:
            self.norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                     param_dtype=jnp.float32, name="norm")

    def __call__(self, q: jax.Array, k: jax.Array, v: jax.Array,
                 causal: bool = False) -> jax.Array:
        B, N, C = q.shape
        M = k.shape[1]
        q = self.to_q(q).reshape(B, N, self.num_heads, self.head_dim)
        k = self.to_k(k).reshape(B, M, self.num_heads, self.head_dim)
        v = self.to_v(v).reshape(B, M, self.num_heads, self.head_dim)
        if self.qk_norm:
            q = self.norm(q.astype(jnp.float32)).astype(self.dtype)
            k = self.norm(k.astype(jnp.float32)).astype(self.dtype)
        q = q * jnp.asarray(self.scale, dtype=self.dtype)
        out = _attend(q, k, v, causal=causal, dtype=self.dtype)
        return self.proj(out.reshape(B, N, C))
