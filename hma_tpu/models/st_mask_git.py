"""STMaskGIT: discrete spatiotemporal masked-autoregressive video model.

Rebuild of the reference model (hma/model/st_mask_git.py:150) as a Flax
module with static shapes and integer domain ids:

  - FactorizedEmbedding over the 2**18 MagVit2 vocab (2 x 512 factors);
  - learned positional embedding over (T, S + action_token_size);
  - per-domain action stems appended as `action_token_size` extra tokens
    per frame ("concat") and injected per layer (modulate / additive /
    cross-attention);
  - STTransformerDecoder trunk;
  - factored cross-entropy readout (muP multipliers folded in as a
    constant scale) and optional pooled action readout.

Generation lives in hma_tpu/rollout/maskgit.py; this module additionally
exposes `frame_logits` — a single-frame forward against a temporal KV
cache — which is what makes TPU rollout O(1) frames per MaskGIT step.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hma_tpu.config import GenieConfig
from hma_tpu.models.action_stems import (
    ActionReadout,
    ActionStemMLP,
    build_action_stat_tables,
    normalize_actions,
    torch_linear_default,
    xavier_uniform_gain,
)
from hma_tpu.models.factorization import (
    FactorizedEmbedding,
    factorize_labels,
)
from hma_tpu.models.st_transformer import STTransformerDecoder


def smoothed_ce_floor(num_factored_vocabs: int, factored_vocab_size: int,
                      smooth: float = 0.01) -> float:
    """Analytic minimum of the label-smoothed factored CE.

    `compute_video_loss_and_acc` sums, over `num_factored_vocabs` factors,
    CE(q, p) with q = (1-eps)*onehot + eps/K uniform. The minimum over p
    (at p = q) is the entropy of q, which is nonzero: for the flagship
    card (eps=0.01, K=512, 2 factors) the floor is ~0.2363. Convergence
    checks must therefore judge the EXCESS loss over this floor — a model
    at acc 1.0 never drives the raw smoothed CE below it.
    """
    eps, K = smooth, factored_vocab_size
    q_correct = (1.0 - eps) + eps / K
    q_other = eps / K
    h = -(q_correct * np.log(q_correct)
          + (K - 1) * q_other * np.log(q_other))
    return float(num_factored_vocabs * h)


class STMaskGIT(nn.Module):
    """Discrete masked-transformer world model."""

    config: GenieConfig
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False  # checkpoint each STBlock (training memory)
    remat_policy: str = "full"  # "full" | "dots" (see STTransformerDecoder)
    # scan-over-layers trunk (training compile-time lever; see
    # STTransformerDecoder.scan_layers + stack/unstack_layer_params)
    scan_layers: bool = False
    temporal_layout: str = "transpose"  # "transpose" | "resident" (STBlock)
    # Declare domain-stacked PARAM tables with one row (sliced-gradient
    # training, train/step.py); see STMAR.single_domain_params.
    single_domain_params: bool = False

    @property
    def mask_token_id(self) -> int:
        return self.config.image_vocab_size

    def setup(self):
        cfg = self.config
        nd_rows = 1 if self.single_domain_params else cfg.num_domains
        self.h = self.w = cfg.h
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
            (1, cfg.T, cfg.S + cfg.action_token_size, cfg.d_model), jnp.float32)
        self.token_embed = FactorizedEmbedding(
            factored_vocab_size=cfg.factored_vocab_size,
            num_factored_vocabs=cfg.num_factored_vocabs,
            d_model=cfg.d_model, mask_token_id=self.mask_token_id,
            dtype=self.dtype, name="token_embed")
        # muP uses FixedMuReadout's xavier(0.01); plain mode keeps torch's
        # default Linear init (reference: st_mask_git.py:191-192).
        readout_init = (xavier_uniform_gain(0.01) if cfg.use_mup
                        else torch_linear_default)
        self.out_x_proj = nn.Dense(
            cfg.factored_vocab_size * cfg.num_factored_vocabs,
            dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=readout_init, name="out_x_proj")
        # muP readout: y = W(output_mult * x / width_mult); fold the
        # multipliers into a constant pre-scale (reference: FixedMuReadout,
        # st_mask_git.py:772-789, base width 256).
        self.readout_scale = (256.0 / cfg.d_model) if cfg.use_mup else 1.0
        self.action_mask_tokens = self.param(
            "action_mask_tokens", nn.initializers.zeros,
            (1, cfg.T, 1, cfg.d_model), jnp.float32)

        if cfg.num_domains > 0 and (cfg.use_actions or cfg.init_actions):
            mean_table, std_table = build_action_stat_tables(
                cfg.d_actions, cfg.action_stats, cfg.max_d_action)
            self.action_mean_table = jnp.asarray(mean_table)
            self.action_std_table = jnp.asarray(std_table)
            self.action_stem = ActionStemMLP(
                num_domains=nd_rows, max_d_action=cfg.max_d_action,
                d_model=cfg.d_model, dtype=self.dtype, name="action_stem")
            if cfg.jointly_predict_actions:
                self.action_readout = ActionReadout(
                    num_domains=nd_rows, d_model=cfg.d_model,
                    max_d_action=cfg.max_d_action, dtype=self.dtype,
                    name="action_readout")

    # ------------------------------------------------------------------
    # Shared embedding / conditioning
    # ------------------------------------------------------------------

    def _action_embedding(self, action_ids: jax.Array, domain_id: jax.Array,
                          skip_normalization: bool = False) -> jax.Array:
        """Raw (B, T, max_da) actions -> (B, T, d_model) stem output."""
        if not skip_normalization:
            action_ids = normalize_actions(action_ids, domain_id,
                                           self.action_mean_table, self.action_std_table)
        return self.action_stem(action_ids.astype(self.dtype), domain_id)

    def _concat_action_tokens(self, x_TSC: jax.Array, action_emb: jax.Array,
                              action_mask: Optional[jax.Array]) -> jax.Array:
        """Append `action_token_size` copies of the per-frame action embedding.

        action_mask: optional (B, T, 1, 1) float; masked frames use the
        learned action mask token (reference: st_mask_git.py:653-661).
        """
        cfg = self.config
        T = x_TSC.shape[1]
        cond = jnp.broadcast_to(
            action_emb[:, :T, None, :],
            (x_TSC.shape[0], T, cfg.action_token_size, cfg.d_model))
        if action_mask is not None and cfg.jointly_predict_actions:
            mask_tok = self.action_mask_tokens[:, :T].astype(self.dtype)
            cond = action_mask[:, :T] * mask_tok + (1 - action_mask[:, :T]) * cond
        return jnp.concatenate([x_TSC, cond.astype(self.dtype)], axis=2)

    # ------------------------------------------------------------------
    # Full forward
    # ------------------------------------------------------------------

    def compute_logits(self, x_TS: jax.Array,
                       action_ids: Optional[jax.Array] = None,
                       domain_id: Optional[jax.Array] = None,
                       action_mask: Optional[jax.Array] = None,
                       skip_normalization: bool = False,
                       deterministic: bool = True):
        """Full-stack forward (reference: st_mask_git.py:632-686).

        Args:
            x_TS: (B, T, S) int32 token ids (mask_token_id for masked).
            action_ids: (B, T, max_d_action) float32 raw actions, or None.
            domain_id: scalar int32 domain index.
            action_mask: optional (B, T, 1, 1) float mask for action tokens.

        Returns:
            (logits, action_pred): logits (B, C_out, T, H, W) fp32;
            action_pred (B, T, max_d_action) or None.
        """
        cfg = self.config
        B, T, S = x_TS.shape
        h = w = int(np.sqrt(S))
        x_TSC = self.token_embed(x_TS)

        action_emb = None
        if action_ids is not None and cfg.num_domains > 0:
            action_emb = self._action_embedding(action_ids, domain_id, skip_normalization)
            if "concat" in cfg.action_network:
                x_TSC = self._concat_action_tokens(x_TSC, action_emb, action_mask)
        elif cfg.jointly_predict_actions:
            cond = jnp.broadcast_to(
                self.action_mask_tokens[:, :T].astype(self.dtype),
                (B, T, cfg.action_token_size, cfg.d_model))
            x_TSC = jnp.concatenate([x_TSC, cond], axis=2)

        S_tot = x_TSC.shape[2]
        x_TSC = x_TSC + self.pos_embed_TSC[:, :T, :S_tot].astype(self.dtype)
        x_TSC = self.decoder(x_TSC, action_emb, domain_id, deterministic)

        action_pred = None
        if cfg.jointly_predict_actions:
            pooled = jnp.mean(x_TSC[:, :, -cfg.action_token_size:], axis=2)
            # action_out_projectors are (Fixed)MuReadout under muP too
            # (reference: st_mask_git.py:222-235), so the same fold applies.
            action_pred = self.action_readout(
                pooled * self.readout_scale, domain_id).astype(jnp.float32)

        logits = None
        if cfg.jointly_predict_states:
            x_states = x_TSC[:, :, :S]
            logits = self.out_x_proj(x_states * self.readout_scale).astype(jnp.float32)
            logits = logits.reshape(B, T, h, w, -1).transpose(0, 4, 1, 2, 3)
        return logits, action_pred

    # ------------------------------------------------------------------
    # Training loss
    # ------------------------------------------------------------------

    def __call__(self, input_ids: jax.Array, labels: jax.Array,
                 action_ids: Optional[jax.Array] = None,
                 domain_id: Optional[jax.Array] = None,
                 deterministic: bool = True,
                 action_mask: Optional[jax.Array] = None):
        """Masked-token factored cross-entropy (+ optional action MSE).

        input_ids/labels: (B, T, S) int32; loss is computed over masked
        tokens of frames 1..T-1 (reference: st_mask_git.py:688-735).
        """
        cfg = self.config
        B, T, S = input_ids.shape
        h = w = int(np.sqrt(S))

        if (action_ids is not None and cfg.jointly_predict_actions
                and action_mask is None):
            drop_key = self.make_rng("action_drop")
            k1, k2 = jax.random.split(drop_key)
            drop_ratio = jax.random.uniform(k1, (B, 1, 1))
            action_mask = (jax.random.uniform(k2, (B, T, 1)) < drop_ratio)
            action_mask = action_mask[..., None].astype(self.dtype)

        logits_CTHW, action_pred = self.compute_logits(
            input_ids, action_ids, domain_id, action_mask,
            deterministic=deterministic)

        x_THW = input_ids.reshape(B, T, h, w)
        relevant_mask = (x_THW[:, 1:] == self.mask_token_id)

        out = {}
        if logits_CTHW is not None:
            loss, acc = self.compute_video_loss_and_acc(
                logits_CTHW, labels.reshape(B, T, h, w), relevant_mask)
            out["loss"], out["acc"] = loss, acc
        else:
            out["loss"] = jnp.zeros((), jnp.float32)
            out["acc"] = jnp.zeros((), jnp.float32)

        if action_pred is not None and action_ids is not None:
            # Elementwise MSE against *raw* action labels, masked to dropped
            # frames and real (unpadded) action dims, mean over all elements
            # (reference: st_mask_git.py:724-726).
            d_act = jnp.take(jnp.asarray(cfg.d_actions, jnp.int32), domain_id)
            dim_valid = (jnp.arange(cfg.max_d_action) < d_act).astype(jnp.float32)
            err = (action_pred - action_ids) ** 2 * dim_valid
            masked = err * action_mask[..., 0].astype(jnp.float32)
            out["action_loss"] = jnp.sum(masked) / jnp.maximum(
                B * T * jnp.sum(dim_valid), 1.0)
            out["actions"] = action_pred
        return out

    def compute_video_loss_and_acc(self, logits_CTHW, targets_THW, relevant_mask_THW):
        """Factored CE (label smoothing 0.01) + exact-token accuracy over
        masked tokens of frames 1.. (reference: st_mask_git.py:603-630)."""
        cfg = self.config
        logits = logits_CTHW[:, :, 1:]          # (B, C, T-1, H, W)
        targets = targets_THW[:, 1:]             # (B, T-1, H, W)
        fv, nv = cfg.factored_vocab_size, cfg.num_factored_vocabs
        B, C, Tm1, H, W = logits.shape
        # channel layout: (num_vocabs, vocab_size)
        fl = logits.reshape(B, nv, fv, Tm1, H, W)
        ft = factorize_labels(targets, nv, fv)    # (B, nv, T-1, H, W)

        logp = jax.nn.log_softmax(fl.astype(jnp.float32), axis=2)
        smooth = 0.01
        onehot_ll = jnp.take_along_axis(logp, ft[:, :, None], axis=2)[:, :, 0]
        # label-smoothed CE: (1-eps)*nll + eps/K * sum(-logp)
        ce = -(1 - smooth) * onehot_ll - (smooth / fv) * jnp.sum(logp, axis=2)
        loss_THW = jnp.sum(ce, axis=1)            # sum over factored vocabs
        acc_THW = jnp.all(jnp.argmax(fl, axis=2) == ft, axis=1)

        m = relevant_mask_THW.astype(jnp.float32)
        num = jnp.maximum(jnp.sum(m), 1.0)
        return jnp.sum(loss_THW * m) / num, jnp.sum(acc_THW * m) / num

    # ------------------------------------------------------------------
    # Incremental (KV-cached) path
    # ------------------------------------------------------------------

    def init_cache(self, batch_size: int, with_actions: bool = True):
        """Zeroed temporal KV caches: (L, B*S_tot, T, H, Dh) each."""
        cfg = self.config
        S_tot = cfg.S + (cfg.action_token_size
                         if (with_actions and "concat" in cfg.action_network
                             and cfg.num_domains > 0) or cfg.jointly_predict_actions
                         else 0)
        head_dim = cfg.d_model // cfg.num_heads
        shape = (cfg.num_layers, batch_size * S_tot, cfg.T, cfg.num_heads, head_dim)
        return jnp.zeros(shape, self.dtype), jnp.zeros(shape, self.dtype)

    def frame_logits(self, tokens_S: jax.Array, t: jax.Array,
                     k_cache: jax.Array, v_cache: jax.Array,
                     action_ids: Optional[jax.Array] = None,
                     domain_id: Optional[jax.Array] = None,
                     skip_normalization: bool = False,
                     update_cache: bool = True):
        """Forward for a single frame t against the temporal KV cache.

        tokens_S: (B, S) int32 token ids of frame t.
        Returns (logits (B, S, nv, fv) fp32, k_cache, v_cache).

        Exactness: spatial attention is per-frame and temporal attention is
        causal, so frame t's logits depend only on frames <= t; with the
        caches holding frames < t this equals the full forward's frame t
        (verified in tests/test_st_maskgit.py).
        """
        cfg = self.config
        B, S = tokens_S.shape
        x_SC = self.token_embed(tokens_S)

        action_emb = None
        if action_ids is not None and cfg.num_domains > 0:
            action_emb = self._action_embedding(action_ids, domain_id, skip_normalization)
            if "concat" in cfg.action_network:
                cond_t = jnp.take_along_axis(
                    action_emb, t[None, None, None].astype(jnp.int32), axis=1)
                cond = jnp.broadcast_to(
                    cond_t[:, :, None, :],
                    (B, 1, cfg.action_token_size, cfg.d_model))[:, 0]
                x_SC = jnp.concatenate([x_SC, cond.astype(self.dtype)], axis=1)
        elif cfg.jointly_predict_actions:
            # no actions supplied: append frame t's learned action mask
            # tokens, mirroring compute_logits' elif branch — init_cache
            # sizes S_tot for this case, so omitting it would break the
            # cached==full exactness contract (and the cache concat).
            mask_t = jax.lax.dynamic_slice_in_dim(
                self.action_mask_tokens, t, 1, axis=1)[:, 0]
            cond = jnp.broadcast_to(mask_t.astype(self.dtype),
                                    (B, cfg.action_token_size, cfg.d_model))
            x_SC = jnp.concatenate([x_SC, cond], axis=1)

        S_tot = x_SC.shape[1]
        pos_t = jax.lax.dynamic_slice_in_dim(
            self.pos_embed_TSC[:, :, :S_tot], t, 1, axis=1)[:, 0]
        x_SC = x_SC + pos_t.astype(self.dtype)

        x_SC, k_cache, v_cache = self.decoder.frame_step(
            x_SC, t, k_cache, v_cache, action_emb, domain_id, update_cache)

        x_states = x_SC[:, :S]
        logits = self.out_x_proj(x_states * self.readout_scale).astype(jnp.float32)
        logits = logits.reshape(B, S, cfg.num_factored_vocabs, cfg.factored_vocab_size)
        return logits, k_cache, v_cache

    def window_logits(self, tokens_FS: jax.Array, t0: jax.Array,
                      k_cache: jax.Array, v_cache: jax.Array,
                      action_ids: Optional[jax.Array] = None,
                      domain_id: Optional[jax.Array] = None,
                      skip_normalization: bool = False,
                      write_frames: int = 0):
        """Cached forward over frames [t0, t0+F) in one pass.

        tokens_FS: (B, F, S) int32. Returns (logits (B, F, S, nv, fv) fp32,
        k_cache, v_cache) with the first `write_frames` frames' KV written.
        Note: measured on v5e, an F=2 window pass costs ~5x an F=1 pass
        (Mosaic tiles the (N, F, H, D) temporal tensors poorly for tiny
        F>1), so the production rollout (rollout/maskgit.py) keeps
        separate single-frame refine + fill passes; this entry remains
        for multi-frame decode experiments and is exactness-tested.
        """
        cfg = self.config
        B, F, S = tokens_FS.shape
        x_FSC = self.token_embed(tokens_FS)

        action_emb = None
        if action_ids is not None and cfg.num_domains > 0:
            action_emb = self._action_embedding(action_ids, domain_id,
                                                skip_normalization)
            if "concat" in cfg.action_network:
                cond = jax.lax.dynamic_slice_in_dim(action_emb, t0, F, axis=1)
                cond = jnp.broadcast_to(
                    cond[:, :, None, :],
                    (B, F, cfg.action_token_size, cfg.d_model))
                x_FSC = jnp.concatenate([x_FSC, cond.astype(self.dtype)], axis=2)
        elif cfg.jointly_predict_actions:
            # mirror compute_logits' no-actions branch (see frame_logits)
            mask_w = jax.lax.dynamic_slice_in_dim(
                self.action_mask_tokens, t0, F, axis=1)
            cond = jnp.broadcast_to(
                mask_w.astype(self.dtype),
                (B, F, cfg.action_token_size, cfg.d_model))
            x_FSC = jnp.concatenate([x_FSC, cond], axis=2)

        S_tot = x_FSC.shape[2]
        pos = jax.lax.dynamic_slice_in_dim(
            self.pos_embed_TSC[:, :, :S_tot], t0, F, axis=1)
        x_FSC = x_FSC + pos.astype(self.dtype)

        x_FSC, k_cache, v_cache = self.decoder.window_step(
            x_FSC, t0, k_cache, v_cache, action_emb, domain_id,
            write_frames=write_frames)

        x_states = x_FSC[:, :, :S]
        logits = self.out_x_proj(x_states * self.readout_scale).astype(jnp.float32)
        logits = logits.reshape(B, F, S, cfg.num_factored_vocabs,
                                cfg.factored_vocab_size)
        return logits, k_cache, v_cache
