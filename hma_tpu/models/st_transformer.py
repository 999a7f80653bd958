"""Spatiotemporal factorized transformer (Genie-style).

Per block (reference: STBlock, hma/model/st_transformer.py:79-114):
  1. bidirectional *spatial* self-attention over the S(+action) tokens of
     each frame,
  2. per-domain action injection (additive "mlp" / "cross_attention" /
     adaLN "modulate"),
  3. causal *temporal* self-attention over T per spatial site,
  4. MLP.
Attention cost is O(B*T*S^2 + B*S*T^2), never O((T*S)^2).

Quirk preserved from the reference: when qk_norm is on (the default),
norm1/norm2 are Identity — the only normalization in the block is the
fp32 qk-LayerNorm inside attention (st_transformer.py:52,73).

Beyond the reference, every block also exposes `frame_step`: a
single-frame decode path against a temporal KV cache, making AR rollout
O(1) frames of compute per MaskGIT step instead of O(T).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from hma_tpu.models.action_stems import (
    DomainCrossAttention,
    DomainModulate,
    xavier_uniform_gain,
)
from hma_tpu.models.attention import SelfAttention


class Mlp(nn.Module):
    """Dense -> GELU -> Dense (reference: st_transformer.py:9-27)."""

    d_model: int
    mlp_ratio: float = 4.0
    mlp_bias: bool = True
    mlp_drop: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        hidden = int(self.d_model * self.mlp_ratio)
        x = nn.Dense(hidden, use_bias=self.mlp_bias, dtype=self.dtype,
                     param_dtype=jnp.float32,
                     kernel_init=xavier_uniform_gain(0.1), name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.mlp_drop)(x, deterministic=deterministic)
        x = nn.Dense(self.d_model, use_bias=self.mlp_bias, dtype=self.dtype,
                     param_dtype=jnp.float32,
                     kernel_init=xavier_uniform_gain(0.1), name="fc2")(x)
        return nn.Dropout(self.mlp_drop)(x, deterministic=deterministic)


class STBlock(nn.Module):
    """One spatiotemporal block. See module docstring for structure."""

    num_heads: int
    d_model: int
    qkv_bias: bool = False
    proj_bias: bool = True
    qk_norm: bool = True
    use_mup: bool = True
    attn_drop: float = 0.0
    mlp_ratio: float = 4.0
    mlp_bias: bool = True
    mlp_drop: float = 0.0
    action_processing: str = "mlp"  # substring-matched: mlp | cross_attention | modulate
    num_domains: int = 0
    dtype: jnp.dtype = jnp.bfloat16
    # "fixed" | "reference": see GenieConfig.cross_attention_compat
    cross_attention_compat: str = "fixed"
    # "transpose" (default): classic (B,T,S,C)<->(B,S,T,C) residual-stream
    # transposes around the temporal half. "resident": keep (B,T,S,C)
    # resident and feed the temporal kernel its internal layout directly
    # (SelfAttention.temporal_resident) — measured on v5e in
    # experiments/layout_probe.py.
    temporal_layout: str = "transpose"

    def setup(self):
        attn_kwargs = dict(num_heads=self.num_heads, d_model=self.d_model,
                           qkv_bias=self.qkv_bias, proj_bias=self.proj_bias,
                           qk_norm=self.qk_norm, use_mup=self.use_mup,
                           attn_drop=self.attn_drop, dtype=self.dtype)
        self.spatial_attn = SelfAttention(**attn_kwargs, name="spatial_attn")
        self.temporal_attn = SelfAttention(**attn_kwargs, name="temporal_attn")
        self.mlp = Mlp(d_model=self.d_model, mlp_ratio=self.mlp_ratio,
                       mlp_bias=self.mlp_bias, mlp_drop=self.mlp_drop,
                       dtype=self.dtype, name="mlp")
        if not self.qk_norm:
            self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")
            self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")
        if self.num_domains > 0:
            if "cross_attention" in self.action_processing:
                self.action_projector = DomainCrossAttention(
                    num_domains=self.num_domains, num_heads=8,
                    d_model=self.d_model, dtype=self.dtype,
                    compat=self.cross_attention_compat,
                    name="action_projector")
            elif "modulate" in self.action_processing:
                self.action_projector = DomainModulate(
                    num_domains=self.num_domains, d_model=self.d_model,
                    dtype=self.dtype, name="action_projector")
            # "mlp" mode: identity projector, purely additive.

    def _pre1(self, x):
        return x if self.qk_norm else self.norm1(x).astype(self.dtype)

    def _pre2(self, x):
        return x if self.qk_norm else self.norm2(x).astype(self.dtype)

    def _inject(self, x_BSTC: jax.Array, action_emb: jax.Array,
                domain_id: jax.Array) -> jax.Array:
        """Action injection on the (B, S, T, C) view. action_emb: (B, T, C)."""
        T = x_BSTC.shape[2]
        if "mlp" in self.action_processing:
            return x_BSTC + action_emb[:, None, :T]
        if "cross_attention" in self.action_processing:
            B, S, _, C = x_BSTC.shape
            if self.cross_attention_compat == "reference":
                # quirk-exact path needs the (B, S, T, C) view to recover
                # the reference's row pairing (see DomainCrossAttention)
                return x_BSTC + self.action_projector(
                    x_BSTC, action_emb[:, :T], domain_id)
            q = x_BSTC.reshape(B, S * T, C)
            out = self.action_projector(q, action_emb[:, :T], domain_id)
            return x_BSTC + out.reshape(B, S, T, C)
        if "modulate" in self.action_processing:
            return x_BSTC + self.action_projector(x_BSTC, action_emb[:, None, :T], domain_id)
        return x_BSTC

    def _inject_btsc(self, x_BTSC: jax.Array, action_emb: jax.Array,
                     domain_id: jax.Array) -> jax.Array:
        """Action injection without leaving the (B, T, S, C) layout."""
        T = x_BTSC.shape[1]
        if "mlp" in self.action_processing:
            return x_BTSC + action_emb[:, :T, None]
        if "modulate" in self.action_processing:
            return x_BTSC + self.action_projector(
                x_BTSC, action_emb[:, :T, None], domain_id)
        raise NotImplementedError(
            f"temporal_layout='resident' with {self.action_processing}")

    def __call__(self, x_TSC: jax.Array, action_emb: Optional[jax.Array] = None,
                 domain_id: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        """Full forward. x_TSC: (B, T, S, C); action_emb: (B, T, C)."""
        B, T, S, C = x_TSC.shape
        x_SC = x_TSC.reshape(B * T, S, C)
        x_SC = x_SC + self.spatial_attn(self._pre1(x_SC))

        if self.temporal_layout == "resident":
            x = x_SC.reshape(B, T, S, C)
            if action_emb is not None and self.num_domains > 0:
                x = self._inject_btsc(x, action_emb, domain_id)
            x = x + self.temporal_attn.temporal_resident(x)
            return x + self.mlp(self._pre2(x), deterministic=deterministic)

        x_BSTC = x_SC.reshape(B, T, S, C).transpose(0, 2, 1, 3)  # (B, S, T, C)

        if action_emb is not None and self.num_domains > 0:
            x_BSTC = self._inject(x_BSTC, action_emb, domain_id)

        x_TC = x_BSTC.reshape(B * S, T, C)
        x_TC = x_TC + self.temporal_attn(x_TC, causal=True)
        x_TC = x_TC + self.mlp(self._pre2(x_TC), deterministic=deterministic)
        return x_TC.reshape(B, S, T, C).transpose(0, 2, 1, 3)

    def frame_step(self, x_SC: jax.Array, t: jax.Array,
                   k_cache: jax.Array, v_cache: jax.Array,
                   action_emb: Optional[jax.Array] = None,
                   domain_id: Optional[jax.Array] = None,
                   action_live: Optional[jax.Array] = None):
        """Single-frame decode. x_SC: (B, S, C) activations of frame t.

        k_cache/v_cache: (B*S, T_max, H, D) temporal KV for this block
        (read-only). Returns (x_SC_out, k_t, v_t) with this frame's
        (B*S, 1, H, D) KV slices for the caller to write (or discard).

        action_live: optional (B,) float gate on the per-layer action
        injection — rows with 0 get no action conditioning at all,
        matching the trained action_ids=None branch (used by the MAR
        rollout's classifier-free guidance to run [cond | uncond] halves
        of one doubled batch through a single program).
        """
        B, S, C = x_SC.shape
        x_SC = x_SC + self.spatial_attn(self._pre1(x_SC))

        if action_emb is not None and self.num_domains > 0:
            live = (1.0 if action_live is None
                    else action_live[:, None, None].astype(x_SC.dtype))
            if "mlp" in self.action_processing:
                cond_t = jnp.take_along_axis(
                    action_emb, t[None, None, None].astype(jnp.int32), axis=1)
                x_SC = x_SC + cond_t * live
            elif "cross_attention" in self.action_processing:
                if self.cross_attention_compat == "reference":
                    raise NotImplementedError(
                        "cross_attention_compat='reference' mixes "
                        "timesteps (the scrambled head/time reshape, "
                        "hma/model/attention.py:130), so per-frame cached "
                        "decode cannot be exact — use the full-recompute "
                        "rollout (rollout.maskgit.generate_tokens_full)")
                x_SC = x_SC + self.action_projector(x_SC, action_emb,
                                                    domain_id) * live
            elif "modulate" in self.action_processing:
                cond_t = jnp.take_along_axis(
                    action_emb, t[None, None, None].astype(jnp.int32), axis=1)
                x_SC = x_SC + self.action_projector(x_SC, cond_t,
                                                    domain_id) * live

        # No pre-norm on the temporal branch, matching the full path above
        # (reference applies norm only before spatial attn and the MLP).
        x_TC = x_SC.reshape(B * S, 1, C)
        attn_out, k_t, v_t = self.temporal_attn.decode_step(
            x_TC, k_cache, v_cache, t)
        x_TC = x_TC + attn_out
        x_TC = x_TC + self.mlp(self._pre2(x_TC), deterministic=True)
        return x_TC.reshape(B, S, C), k_t, v_t



    def window_step(self, x_FSC: jax.Array, t0: jax.Array,
                    k_cache: jax.Array, v_cache: jax.Array,
                    action_emb: Optional[jax.Array] = None,
                    domain_id: Optional[jax.Array] = None):
        """Multi-frame decode for frames [t0, t0+F) against the cache.

        x_FSC: (B, F, S, C). Returns (x_out, k_w, v_w) with the window's
        (B*S, F, H, D) temporal KV slices.
        """
        B, F, S, C = x_FSC.shape
        x_SC = x_FSC.reshape(B * F, S, C)
        x_SC = x_SC + self.spatial_attn(self._pre1(x_SC))
        x_FSC = x_SC.reshape(B, F, S, C)

        if action_emb is not None and self.num_domains > 0:
            cond = jax.lax.dynamic_slice_in_dim(action_emb, t0, F, axis=1)
            if "mlp" in self.action_processing:
                x_FSC = x_FSC + cond[:, :, None]
            elif "cross_attention" in self.action_processing:
                if self.cross_attention_compat == "reference":
                    raise NotImplementedError(
                        "cross_attention_compat='reference' mixes "
                        "timesteps; cached window decode cannot be exact "
                        "— use rollout.maskgit.generate_tokens_full")
                q = x_FSC.reshape(B, F * S, C)
                out = self.action_projector(q, action_emb, domain_id)
                x_FSC = x_FSC + out.reshape(B, F, S, C)
            elif "modulate" in self.action_processing:
                x_FSC = x_FSC + self.action_projector(x_FSC, cond[:, :, None],
                                                      domain_id)

        x_TC = x_FSC.transpose(0, 2, 1, 3).reshape(B * S, F, C)
        attn_out, k_w, v_w = self.temporal_attn.decode_window(
            x_TC, k_cache, v_cache, t0)
        x_TC = x_TC + attn_out
        x_TC = x_TC + self.mlp(self._pre2(x_TC), deterministic=True)
        return x_TC.reshape(B, S, F, C).transpose(0, 2, 1, 3), k_w, v_w


class _STScanBody(nn.Module):
    """nn.scan body: one STBlock returning the (carry, ys) pair the scan
    protocol wants. Field set mirrors STBlock (a dict attribute would
    break flax's hashability requirement for lifted transforms)."""

    num_heads: int
    d_model: int
    qkv_bias: bool = False
    proj_bias: bool = True
    qk_norm: bool = True
    use_mup: bool = True
    attn_drop: float = 0.0
    mlp_ratio: float = 4.0
    mlp_bias: bool = True
    mlp_drop: float = 0.0
    action_processing: str = "mlp"
    num_domains: int = 0
    dtype: jnp.dtype = jnp.bfloat16
    cross_attention_compat: str = "fixed"
    temporal_layout: str = "transpose"

    @nn.compact
    def __call__(self, x_TSC, action_emb, domain_id, deterministic):
        x_TSC = STBlock(
            num_heads=self.num_heads, d_model=self.d_model,
            qkv_bias=self.qkv_bias, proj_bias=self.proj_bias,
            qk_norm=self.qk_norm, use_mup=self.use_mup,
            attn_drop=self.attn_drop, mlp_ratio=self.mlp_ratio,
            mlp_bias=self.mlp_bias, mlp_drop=self.mlp_drop,
            action_processing=self.action_processing,
            num_domains=self.num_domains, dtype=self.dtype,
            cross_attention_compat=self.cross_attention_compat,
            temporal_layout=self.temporal_layout,
            name="block")(x_TSC, action_emb, domain_id, deterministic)
        return x_TSC, None


def stack_layer_params(dec_params: dict, num_layers: int) -> dict:
    """Loop layout {'layers_i': {...}} -> scan layout
    {'layers_scan': {'block': stacked (L, ...)}} (same decoder weights,
    scan-over-layers trunk). Inverse: unstack_layer_params."""
    import numpy as _np

    layers = [dec_params[f"layers_{i}"] for i in range(num_layers)]
    stacked = jax.tree.map(lambda *xs: _np.stack(
        [_np.asarray(x) for x in xs]), *layers)
    rest = {k: v for k, v in dec_params.items()
            if not k.startswith("layers_")}
    return {**rest, "layers_scan": {"block": stacked}}


def unstack_layer_params(dec_params: dict, num_layers: int) -> dict:
    """Inverse of stack_layer_params."""
    import numpy as _np

    stacked = dec_params["layers_scan"]["block"]
    rest = {k: v for k, v in dec_params.items() if k != "layers_scan"}
    out = dict(rest)
    for i in range(num_layers):
        out[f"layers_{i}"] = jax.tree.map(
            lambda x, i=i: _np.asarray(x)[i], stacked)
    return out


class STTransformerDecoder(nn.Module):
    """Stack of STBlocks (reference: st_transformer.py:117-177)."""

    num_layers: int
    num_heads: int
    d_model: int
    qkv_bias: bool = False
    proj_bias: bool = True
    qk_norm: bool = True
    use_mup: bool = True
    attn_drop: float = 0.0
    mlp_ratio: float = 4.0
    mlp_bias: bool = True
    mlp_drop: float = 0.0
    action_processing: str = "mlp"
    num_domains: int = 0
    dtype: jnp.dtype = jnp.bfloat16
    cross_attention_compat: str = "fixed"
    temporal_layout: str = "transpose"
    remat: bool = False
    # "full": recompute the whole block in the backward (min memory,
    # +1 extra fwd of compute). "dots": save matmul outputs, recompute
    # only elementwise ops — near-none recompute cost at ~2x the
    # activation memory of "full". "attn": save only the attention
    # outputs (checkpoint_name-tagged in SelfAttention) — the backward
    # re-runs the cheap matmuls but skips both attention forwards, at
    # ~32 MB/layer extra. Measured a wash vs "full" on v5e at B=8
    # (0.308 vs 0.305 s/step — the Pallas attention forwards are cheap
    # enough to recompute), so "full" stays the default; see
    # experiments/mfu_probe.py.
    remat_policy: str = "full"
    # scan-over-layers: collapse the L-block trunk into ONE lax.scan so
    # the HLO carries a single block body instead of L inlined copies —
    # a compile-time lever for the 32-block cards (VERDICT r4 #7; the
    # 1.5B card compiles in ~28 min inlined). Params stack to (L, ...)
    # under 'layers_scan/block'; convert checkpoints with
    # stack_layer_params/unstack_layer_params. Training path only: the
    # cached decode paths (frame_step/window_step) keep the loop layout,
    # whose rollout programs are small enough that inlining is not the
    # compile wall.
    scan_layers: bool = False

    def setup(self):
        block = STBlock
        policy = None
        if self.remat:
            if self.remat_policy == "dots":
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            elif self.remat_policy == "attn":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "attn_out")
        if self.scan_layers:
            body = _STScanBody
            if self.remat:
                # same static_argnums trap as below: `self` counts as 0,
                # `deterministic` is positional 4
                body = nn.remat(body, static_argnums=(4,), policy=policy)
            self.layers_scan = nn.scan(
                body, variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                length=self.num_layers,
            )(num_heads=self.num_heads, d_model=self.d_model,
              qkv_bias=self.qkv_bias, proj_bias=self.proj_bias,
              qk_norm=self.qk_norm, use_mup=self.use_mup,
              attn_drop=self.attn_drop, mlp_ratio=self.mlp_ratio,
              mlp_bias=self.mlp_bias, mlp_drop=self.mlp_drop,
              action_processing=self.action_processing,
              num_domains=self.num_domains, dtype=self.dtype,
              cross_attention_compat=self.cross_attention_compat,
              temporal_layout=self.temporal_layout, name="layers_scan")
            self.layers = []
            return
        if self.remat:
            # static_argnums counts `self` as 0 (flax subtracts 1 before
            # lifting), so `deterministic` — positional arg 4 of
            # STBlock.__call__ — is index 4, NOT 3. With (3,) the Python
            # bool reaches jax.remat traced, and nn.Dropout's
            # `(rate == 0.0) or deterministic` raises
            # TracerBoolConversionError whenever mlp_drop > 0 (the MAR
            # cards; the discrete cards' drop=0.0 short-circuits, which
            # is why only STMAR training hit it).
            block = nn.remat(STBlock, static_argnums=(4,), policy=policy)
        self.layers = [
            block(num_heads=self.num_heads, d_model=self.d_model,
                  qkv_bias=self.qkv_bias, proj_bias=self.proj_bias,
                  qk_norm=self.qk_norm, use_mup=self.use_mup,
                  attn_drop=self.attn_drop, mlp_ratio=self.mlp_ratio,
                  mlp_bias=self.mlp_bias, mlp_drop=self.mlp_drop,
                  action_processing=self.action_processing,
                  num_domains=self.num_domains, dtype=self.dtype,
                  cross_attention_compat=self.cross_attention_compat,
                  temporal_layout=self.temporal_layout,
                  name=f"layers_{i}")
            for i in range(self.num_layers)
        ]

    def __call__(self, x_TSC: jax.Array, action_emb: Optional[jax.Array] = None,
                 domain_id: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        if self.scan_layers:
            x_TSC, _ = self.layers_scan(x_TSC, action_emb, domain_id,
                                        deterministic)
            return x_TSC
        for layer in self.layers:
            x_TSC = layer(x_TSC, action_emb, domain_id, deterministic)
        return x_TSC

    def frame_step(self, x_SC: jax.Array, t: jax.Array,
                   k_cache: jax.Array, v_cache: jax.Array,
                   action_emb: Optional[jax.Array] = None,
                   domain_id: Optional[jax.Array] = None,
                   update_cache: bool = True,
                   action_live: Optional[jax.Array] = None):
        """x_SC: (B, S, C); k/v_cache: (L, B*S, T_max, H, D).

        With update_cache, each layer's frame-t KV slice is written with an
        in-place dynamic-update-slice on the big cache buffer (XLA aliases
        the chain — no full-cache stack/copy); otherwise the caches pass
        through untouched. action_live: see STBlock.frame_step.
        """
        assert not self.scan_layers, (
            "frame_step needs the loop layout; convert params with "
            "unstack_layer_params and build the model with scan_layers=False")
        t = jnp.asarray(t, jnp.int32)
        zero = jnp.asarray(0, jnp.int32)
        for i, layer in enumerate(self.layers):
            x_SC, k_t, v_t = layer.frame_step(x_SC, t, k_cache[i], v_cache[i],
                                              action_emb, domain_id,
                                              action_live)
            if update_cache:
                idx = (jnp.asarray(i, jnp.int32), zero, t, zero, zero)
                k_cache = jax.lax.dynamic_update_slice(k_cache, k_t[None], idx)
                v_cache = jax.lax.dynamic_update_slice(v_cache, v_t[None], idx)
        return x_SC, k_cache, v_cache

    def window_step(self, x_FSC: jax.Array, t0: jax.Array,
                    k_cache: jax.Array, v_cache: jax.Array,
                    action_emb: Optional[jax.Array] = None,
                    domain_id: Optional[jax.Array] = None,
                    write_frames: int = 0):
        """Multi-frame cached decode; writes the first `write_frames`
        frames' KV slices into the caches at [t0, t0+write_frames)."""
        assert not self.scan_layers, (
            "window_step needs the loop layout; convert params with "
            "unstack_layer_params and build the model with scan_layers=False")
        t0 = jnp.asarray(t0, jnp.int32)
        zero = jnp.asarray(0, jnp.int32)
        for i, layer in enumerate(self.layers):
            x_FSC, k_w, v_w = layer.window_step(x_FSC, t0, k_cache[i],
                                                v_cache[i], action_emb,
                                                domain_id)
            if write_frames > 0:
                idx = (jnp.asarray(i, jnp.int32), zero, t0, zero, zero)
                k_cache = jax.lax.dynamic_update_slice(
                    k_cache, k_w[:, :write_frames][None], idx)
                v_cache = jax.lax.dynamic_update_slice(
                    v_cache, v_w[:, :write_frames][None], idx)
        return x_FSC, k_cache, v_cache
