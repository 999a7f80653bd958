"""STMAR: continuous spatiotemporal MAR model with per-token diffusion head.

Rebuild of the reference STMAR (hma/model/st_mar.py:37): the same
ST-transformer trunk as STMaskGIT, but over continuous SVD-VAE latents
(B, T, h, w, C): masked positions are replaced by a learned latent mask
token, patchified (patch_size p), embedded linearly, and the trunk's
per-token outputs condition a SimpleMLPAdaLN diffusion head (DiffLoss)
that models the latent distribution per token. Per-domain action
diffusion heads mirror st_mar.py:81-100 as one domain-stacked module.

Differences from the reference, by design:
  - trunk init keeps the stable xavier(0.1) scheme; the reference's
    STMAR.initialize_weights clobbers every Linear to N(0, 0.02)
    (st_mar.py:105) which makes the (norm-free) 32-layer stream grow
    ~1e5x at init — the end LayerNorms mask it, we avoid it entirely;
  - generation (rollout/mar.py) uses the KV-cached single-frame path and
    static-size order slices instead of data-dependent boolean gathers.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from hma_tpu.config import DiffusionGenieConfig
from hma_tpu.models.action_stems import (
    ActionStemMLP,
    build_action_stat_tables,
    normalize_actions,
)
from hma_tpu.models.diffloss import DiffLoss
from hma_tpu.models.st_transformer import STTransformerDecoder


def patchify(x: jax.Array, p: int) -> jax.Array:
    """(B, T, H, W, C) -> (B, T, H/p, W/p, C*p*p) (reference: st_mar.py:199)."""
    B, T, H, W, C = x.shape
    x = x.reshape(B, T, H // p, p, W // p, p, C)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(B, T, H // p, W // p, C * p * p)


def unpatchify(x: jax.Array, p: int, c: int) -> jax.Array:
    """Inverse of `patchify` (reference: st_mar.py:208)."""
    B, T, H, W, _ = x.shape
    x = x.reshape(B, T, H, W, p, p, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(B, T, H * p, W * p, c)


class STMAR(nn.Module):
    """Continuous masked-AR world model with diffusion decoding."""

    config: DiffusionGenieConfig
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False  # checkpoint each STBlock (training memory)
    remat_policy: str = "full"  # "full" | "dots" (see STTransformerDecoder)
    # scan-over-layers trunk (training compile-time lever; see
    # STTransformerDecoder.scan_layers + stack/unstack_layer_params)
    scan_layers: bool = False
    temporal_layout: str = "transpose"  # "transpose" | "resident" (STBlock)
    # Declare domain-stacked PARAM tables with one row instead of
    # num_domains: the sliced-gradient training path (train/step.py
    # make_train_step(stacked_mask=...)) feeds pre-sliced single-domain
    # tables so the backward never materializes the other domains' zero
    # gradients. Config CONSTANTS (d_actions, action_stats) keep their
    # full tables — take_domain only redirects size-1 param tables.
    single_domain_params: bool = False

    def setup(self):
        cfg = self.config
        nd_rows = 1 if self.single_domain_params else cfg.num_domains
        self.h = self.w = cfg.h
        self.patch_dim = cfg.vae_embed_dim * cfg.patch_size**2
        self.seq_len = cfg.S // cfg.patch_size**2

        self.decoder = STTransformerDecoder(
            num_layers=cfg.num_layers, num_heads=cfg.num_heads, d_model=cfg.d_model,
            qkv_bias=cfg.qkv_bias, proj_bias=cfg.proj_bias, qk_norm=cfg.qk_norm,
            use_mup=cfg.use_mup, attn_drop=cfg.attn_drop, mlp_ratio=cfg.mlp_ratio,
            mlp_bias=cfg.mlp_bias, mlp_drop=cfg.mlp_drop,
            action_processing=cfg.action_network, num_domains=nd_rows,
            dtype=self.dtype, remat=self.remat,
            cross_attention_compat=getattr(cfg, "cross_attention_compat",
                                           "fixed"),
            temporal_layout=self.temporal_layout,
            remat_policy=self.remat_policy, scan_layers=self.scan_layers,
            name="decoder")
        self.pos_embed_TSC = self.param(
            "pos_embed_TSC", nn.initializers.zeros,
            (1, cfg.T, self.seq_len + cfg.action_token_size, cfg.d_model), jnp.float32)
        self.diffusion_pos_embed_learned = self.param(
            "diffusion_pos_embed_learned", nn.initializers.normal(0.02),
            (1, self.seq_len * cfg.T, cfg.d_model), jnp.float32)
        self.mask_token = self.param(
            "mask_token", nn.initializers.zeros, (1, 1, cfg.vae_embed_dim), jnp.float32)
        self.action_mask_tokens = self.param(
            "action_mask_tokens", nn.initializers.zeros,
            (1, cfg.T, 1, cfg.d_model), jnp.float32)
        self.token_embed = nn.Dense(
            cfg.d_model, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.02), name="token_embed")
        self.out_x_proj = nn.Dense(
            cfg.d_model, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.02), name="out_x_proj")
        # muP: out_x_proj is a FixedMuReadout in the reference
        # (st_mar.py:60-61); fold output_mult/width_mult into a constant
        # pre-scale exactly as STMaskGIT does (base width 256).
        self.readout_scale = (256.0 / cfg.d_model) if cfg.use_mup else 1.0
        self.decoder_norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                         param_dtype=jnp.float32, name="decoder_norm")
        self.z_proj_ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                      param_dtype=jnp.float32, name="z_proj_ln")
        self.diffloss = DiffLoss(
            target_channels=self.patch_dim, z_channels=cfg.d_model,
            depth=cfg.diffloss_d, width=cfg.diffloss_w,
            num_sampling_steps=cfg.num_sampling_steps, dtype=self.dtype,
            name="diffloss")

        if cfg.num_domains > 0 and (cfg.use_actions or cfg.init_actions):
            mean_table, std_table = build_action_stat_tables(
                cfg.d_actions, cfg.action_stats, cfg.max_d_action)
            self.action_mean_table = jnp.asarray(mean_table)
            self.action_std_table = jnp.asarray(std_table)
            self.action_stem = ActionStemMLP(
                num_domains=nd_rows, max_d_action=cfg.max_d_action,
                d_model=cfg.d_model, dtype=self.dtype, name="action_stem")
            if cfg.jointly_predict_actions:
                self.action_diff_loss = DiffLoss(
                    target_channels=cfg.max_d_action, z_channels=cfg.d_model,
                    depth=cfg.diffloss_d, width=cfg.diffloss_w,
                    num_sampling_steps=cfg.num_sampling_steps,
                    num_domains=nd_rows, dtype=self.dtype,
                    name="action_diff_loss")

    # ------------------------------------------------------------------

    def _action_embedding(self, action_ids, domain_id, skip_normalization=False):
        if not skip_normalization:
            action_ids = normalize_actions(action_ids, domain_id,
                                           self.action_mean_table, self.action_std_table)
        return self.action_stem(action_ids.astype(self.dtype), domain_id)

    def compute_latents(self, x_TSC_in: jax.Array,
                        action_ids: Optional[jax.Array] = None,
                        domain_id: Optional[jax.Array] = None,
                        action_mask: Optional[jax.Array] = None,
                        skip_normalization: bool = False,
                        deterministic: bool = True):
        """Patchified latents (B, T, h_, w_, patch_dim) or (B, T, S_p,
        patch_dim) -> conditioning z.

        Returns (z (B, T, S_p, d_model) fp32, pooled action latents or None).
        (reference: st_mar.py:146-197)
        """
        cfg = self.config
        if x_TSC_in.ndim == 5:
            B, T, h_, w_, pd = x_TSC_in.shape
            x_TSC_in = x_TSC_in.reshape(B, T, h_ * w_, pd)
        B, T, S, _ = x_TSC_in.shape
        x_TSC = self.token_embed(x_TSC_in.astype(self.dtype))

        action_emb = None
        if action_ids is not None and cfg.num_domains > 0:
            action_emb = self._action_embedding(action_ids, domain_id, skip_normalization)
            if "concat" in cfg.action_network:
                cond = jnp.broadcast_to(
                    action_emb[:, :T, None, :],
                    (B, T, cfg.action_token_size, cfg.d_model)).astype(self.dtype)
                if action_mask is not None and cfg.jointly_predict_actions:
                    mask_tok = self.action_mask_tokens[:, :T].astype(self.dtype)
                    cond = action_mask[:, :T] * mask_tok + (1 - action_mask[:, :T]) * cond
                x_TSC = jnp.concatenate([x_TSC, cond], axis=2)
        elif cfg.jointly_predict_actions:
            cond = jnp.broadcast_to(
                self.action_mask_tokens[:, :T].astype(self.dtype),
                (B, T, cfg.action_token_size, cfg.d_model))
            x_TSC = jnp.concatenate([x_TSC, cond], axis=2)

        S_tot = x_TSC.shape[2]
        x_TSC = self.z_proj_ln(
            (x_TSC + self.pos_embed_TSC[:, :T, :S_tot].astype(self.dtype)
             ).astype(jnp.float32)).astype(self.dtype)
        x_TSC = self.decoder(x_TSC, action_emb, domain_id, deterministic)

        action_latents = None
        if cfg.jointly_predict_actions:
            action_latents = jnp.mean(
                x_TSC[:, :, -cfg.action_token_size:], axis=2).astype(jnp.float32)

        x_states = x_TSC[:, :, :S]
        z = self.decoder_norm(
            self.out_x_proj(x_states * self.readout_scale).astype(jnp.float32))
        dpe = self.diffusion_pos_embed_learned.reshape(1, cfg.T, self.seq_len, cfg.d_model)
        z = z + dpe[:, :T, :S]
        return z, action_latents

    # ------------------------------------------------------------------

    def __call__(self, input_ids: jax.Array, labels: jax.Array,
                 action_ids: Optional[jax.Array] = None,
                 domain_id: Optional[jax.Array] = None,
                 masked_tokens_indicator: Optional[jax.Array] = None,
                 deterministic: bool = True):
        """Diffusion training loss over masked patch rows.

        input_ids/labels: (B, T, h, w, C) float latents (already x SVD_SCALE);
        masked_tokens_indicator: (B, T, h, w) {0,1}
        (reference: st_mar.py:219-275).
        """
        cfg = self.config
        B, T, H, W, C = input_ids.shape
        p = cfg.patch_size
        mask = masked_tokens_indicator
        assert mask is not None, "STMAR training requires masked_tokens_indicator"

        x = jnp.where(mask[..., None] > 0,
                      self.mask_token[None].astype(input_ids.dtype), input_ids)
        x = patchify(x, p)

        action_mask = None
        if action_ids is not None and cfg.jointly_predict_actions:
            # suffix masking: from a random timestep to T (st_mar.py:241-252)
            k = self.make_rng("action_drop")
            t0 = jax.random.randint(k, (B, 1), 0, T)
            action_mask = (jnp.arange(T)[None, :] >= t0).astype(self.dtype)
            action_mask = action_mask[..., None, None]

        z, action_latents = self.compute_latents(
            x, action_ids, domain_id, action_mask, deterministic=deterministic)

        target = patchify(labels, p)
        patch_mask = (patchify(mask[..., None].astype(jnp.float32), p)
                      .sum(-1) > 0).astype(jnp.float32)

        rows_z = z.reshape(-1, cfg.d_model)
        rows_t = target.reshape(-1, self.patch_dim).astype(jnp.float32)
        rows_m = patch_mask.reshape(-1)
        # diffusion_batch_mul: tile every token row so each contributes
        # several independent (t, noise) diffusion samples per step —
        # reference st_mar.py:122-125 (torch .repeat tiles along dim 0).
        mul = cfg.diffusion_batch_mul
        if mul > 1:
            rows_z = jnp.tile(rows_z, (mul, 1))
            rows_t = jnp.tile(rows_t, (mul, 1))
            rows_m = jnp.tile(rows_m, (mul,))
        loss = self.diffloss.loss(rows_t, rows_z, rows_m)

        out = {"loss": loss, "acc": jnp.zeros((), jnp.float32)}
        if action_latents is not None and action_ids is not None:
            d_act = jnp.take(jnp.asarray(cfg.d_actions, jnp.int32), domain_id)
            dim_mask = (jnp.arange(cfg.max_d_action) < d_act).astype(jnp.float32)
            a_rows_z = action_latents.reshape(-1, cfg.d_model)
            a_rows_t = action_ids.reshape(-1, cfg.max_d_action).astype(jnp.float32)
            a_rows_m = action_mask[..., 0, 0].reshape(-1)
            if mul > 1:  # reference st_mar.py:136-140
                a_rows_z = jnp.tile(a_rows_z, (mul, 1))
                a_rows_t = jnp.tile(a_rows_t, (mul, 1))
                a_rows_m = jnp.tile(a_rows_m, (mul,))
            out["action_loss"] = self.action_diff_loss.loss(
                a_rows_t, a_rows_z, a_rows_m, domain_id, dim_mask)
            out["actions"] = action_latents
        return out

    # ------------------------------------------------------------------
    # Incremental (KV-cached) path
    # ------------------------------------------------------------------

    def init_cache(self, batch_size: int, with_actions: bool = True):
        cfg = self.config
        S_tot = self.seq_len + (cfg.action_token_size
                                if (with_actions and "concat" in cfg.action_network
                                    and cfg.num_domains > 0) or cfg.jointly_predict_actions
                                else 0)
        head_dim = cfg.d_model // cfg.num_heads
        shape = (cfg.num_layers, batch_size * S_tot, cfg.T, cfg.num_heads, head_dim)
        return jnp.zeros(shape, self.dtype), jnp.zeros(shape, self.dtype)

    def frame_latents(self, patches_S: jax.Array, t: jax.Array,
                      k_cache: jax.Array, v_cache: jax.Array,
                      action_ids: Optional[jax.Array] = None,
                      domain_id: Optional[jax.Array] = None,
                      skip_normalization: bool = False,
                      update_cache: bool = True,
                      action_live: Optional[jax.Array] = None):
        """Single-frame conditioning latents against the temporal KV cache.

        patches_S: (B, S_p, patch_dim) patchified latents of frame t.
        Returns (z (B, S_p, d_model) fp32, action_latent (B, d_model) or
        None, k_cache, v_cache). action_live: optional (B,) float — rows
        with 0 run the trained no-actions branch (action mask tokens, no
        per-layer injection); used for classifier-free guidance.
        """
        cfg = self.config
        B, S, _ = patches_S.shape
        x_SC = self.token_embed(patches_S.astype(self.dtype))

        action_emb = None
        if action_ids is not None and cfg.num_domains > 0:
            action_emb = self._action_embedding(action_ids, domain_id, skip_normalization)
            if "concat" in cfg.action_network:
                cond_t = jnp.take_along_axis(
                    action_emb, t[None, None, None].astype(jnp.int32), axis=1)
                cond = jnp.broadcast_to(
                    cond_t[:, :, None, :],
                    (B, 1, cfg.action_token_size, cfg.d_model))[:, 0]
                cond = cond.astype(self.dtype)
                if action_live is not None:
                    # rows with live=0 take the learned action mask tokens
                    # — the trained no-actions branch — so a doubled
                    # [cond | uncond] CFG batch runs in one program
                    mask_t = jax.lax.dynamic_slice_in_dim(
                        self.action_mask_tokens, t, 1, axis=1)[:, 0]
                    live = action_live[:, None, None].astype(self.dtype)
                    cond = live * cond + (1 - live) * mask_t.astype(self.dtype)
                x_SC = jnp.concatenate([x_SC, cond], axis=1)
        elif cfg.jointly_predict_actions:
            # mirror compute_latents' no-actions branch: frame t's learned
            # action mask tokens (init_cache sizes S_tot for this case)
            mask_t = jax.lax.dynamic_slice_in_dim(
                self.action_mask_tokens, t, 1, axis=1)[:, 0]
            cond = jnp.broadcast_to(mask_t.astype(self.dtype),
                                    (B, cfg.action_token_size, cfg.d_model))
            x_SC = jnp.concatenate([x_SC, cond], axis=1)

        S_tot = x_SC.shape[1]
        pos_t = jax.lax.dynamic_slice_in_dim(
            self.pos_embed_TSC[:, :, :S_tot], t, 1, axis=1)[:, 0]
        x_SC = self.z_proj_ln(
            (x_SC + pos_t.astype(self.dtype)).astype(jnp.float32)).astype(self.dtype)

        x_SC, k_cache, v_cache = self.decoder.frame_step(
            x_SC, t, k_cache, v_cache, action_emb, domain_id, update_cache,
            action_live)

        action_latent = None
        if cfg.jointly_predict_actions:
            action_latent = jnp.mean(
                x_SC[:, -cfg.action_token_size:], axis=1).astype(jnp.float32)

        x_states = x_SC[:, :S]
        z = self.decoder_norm(
            self.out_x_proj(x_states * self.readout_scale).astype(jnp.float32))
        dpe = self.diffusion_pos_embed_learned.reshape(1, cfg.T, self.seq_len, cfg.d_model)
        z = z + jax.lax.dynamic_slice_in_dim(dpe, t, 1, axis=1)[:, 0]
        return z, action_latent, k_cache, v_cache

    # diffusion head passthroughs (used by rollout/mar.py via apply(method=...))
    def sample_tokens(self, z_rows: jax.Array, key: jax.Array,
                      temperature: float = 1.0, cfg_scale=1.0,
                      clip_denoised: bool = True):
        return self.diffloss.sample(z_rows, key, temperature, cfg_scale, clip_denoised)

    def sample_actions(self, z_rows: jax.Array, key: jax.Array, domain_id,
                       temperature: float = 1.0, cfg_scale=1.0,
                       clip_denoised: bool = True):
        return self.action_diff_loss.sample(z_rows, key, temperature, cfg_scale,
                                            clip_denoised, domain_id=domain_id)
