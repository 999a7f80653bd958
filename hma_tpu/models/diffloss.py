"""MAR diffusion head: AdaLN-modulated residual MLP + diffusion losses.

Rebuild of the reference DiffLoss (hma/model/diffloss.py): a per-token
SimpleMLPAdaLN predicting (eps, v), trained with the 1000-step cosine
schedule and sampled with a respaced schedule (default "100"). A
domain-stacked variant serves the per-embodiment action heads
(reference: st_mar.py:81-100) from one compiled program.

Init note: the reference zero-initializes adaLN/final layers DiT-style
(diffloss.py:196-208) but then STMAR.initialize_weights() clobbers every
Linear back to N(0, 0.02) (st_mar.py:105-108 -> st_mask_git.py:737-748).
We keep the DiT zero-init — the vendored code's intended behavior.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from hma_tpu.diffusion.gaussian import (
    make_schedule,
    p_sample_loop,
    p_sample_loop_indexed,
    training_losses,
)
from hma_tpu.models.action_stems import (
    DomainDense,
    take_domain,
    xavier_uniform_gain,
)


def timestep_embedding(t: jax.Array, dim: int, max_period: int = 10000) -> jax.Array:
    """DiT sinusoidal embedding, cos-then-sin order (reference: diffloss.py:84-101)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class _TimestepEmbedder(nn.Module):
    hidden: int
    freq_dim: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        h = timestep_embedding(t, self.freq_dim)
        h = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                     kernel_init=nn.initializers.normal(0.02), name="fc1")(h)
        h = jax.nn.silu(h)
        return nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=nn.initializers.normal(0.02), name="fc2")(h)


class SimpleMLPAdaLN(nn.Module):
    """Residual MLP with adaLN conditioning (reference: diffloss.py:151-233).

    __call__(x (N, C), t (N,), c (N, Z)) -> (N, 2C): [eps, v].
    """

    in_channels: int
    model_channels: int
    z_channels: int
    num_res_blocks: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array, c: jax.Array) -> jax.Array:
        xavier = xavier_uniform_gain(0.1)
        dense = lambda n, name, init=xavier: nn.Dense(
            n, dtype=self.dtype, param_dtype=jnp.float32, kernel_init=init, name=name)

        h = dense(self.model_channels, "input_proj")(x.astype(self.dtype))
        t_emb = _TimestepEmbedder(self.model_channels, dtype=self.dtype,
                                  name="time_embed")(t)
        c_emb = dense(self.model_channels, "cond_embed")(c.astype(self.dtype))
        y = t_emb + c_emb

        for i in range(self.num_res_blocks):
            mod = dense(3 * self.model_channels, f"res_{i}_adaLN",
                        nn.initializers.zeros)(jax.nn.silu(y))
            shift, scale, gate = jnp.split(mod, 3, axis=-1)
            hn = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                              name=f"res_{i}_ln")(h.astype(jnp.float32)).astype(self.dtype)
            hh = hn * (1 + scale) + shift
            hh = dense(self.model_channels, f"res_{i}_fc1")(hh)
            hh = jax.nn.silu(hh)
            hh = dense(self.model_channels, f"res_{i}_fc2")(hh)
            h = h + gate * hh

        mod = dense(2 * self.model_channels, "final_adaLN",
                    nn.initializers.zeros)(jax.nn.silu(y))
        shift, scale = jnp.split(mod, 2, axis=-1)
        hn = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                          dtype=jnp.float32, name="final_ln")(h.astype(jnp.float32))
        hh = hn.astype(self.dtype) * (1 + scale) + shift
        out = dense(2 * self.in_channels, "final_linear", nn.initializers.zeros)(hh)
        return out.astype(jnp.float32)


class DomainSimpleMLPAdaLN(nn.Module):
    """Per-domain stacked SimpleMLPAdaLN (action diffusion heads).

    Channels are padded to `in_channels` = max_d_action across domains;
    the padded output layout is [eps(max) | v(max)] so each half of the
    reference's per-domain final layer pads independently on import.
    Every parameter group carries a leading domain axis — the reference
    keeps one full DiffLoss per domain (st_mar.py:89-100), including its
    own TimestepEmbedder and res-block LayerNorms, so those stack too.
    """

    num_domains: int
    in_channels: int
    model_channels: int
    z_channels: int
    num_res_blocks: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array, c: jax.Array,
                 domain_id: jax.Array) -> jax.Array:
        from hma_tpu.models.action_stems import DomainLayerNorm

        xavier = xavier_uniform_gain(0.1)
        dd = lambda i, o, name, init=xavier: DomainDense(
            self.num_domains, i, o, kernel_init=init, dtype=self.dtype, name=name)

        h = dd(self.in_channels, self.model_channels, "input_proj")(x, domain_id)
        t_freq = timestep_embedding(t, 256).astype(self.dtype)
        t_emb = dd(256, self.model_channels, "time_fc1",
                   nn.initializers.normal(0.02))(t_freq, domain_id)
        t_emb = dd(self.model_channels, self.model_channels, "time_fc2",
                   nn.initializers.normal(0.02))(jax.nn.silu(t_emb), domain_id)
        c_emb = dd(self.z_channels, self.model_channels, "cond_embed")(c, domain_id)
        y = t_emb + c_emb

        for i in range(self.num_res_blocks):
            mod = dd(self.model_channels, 3 * self.model_channels, f"res_{i}_adaLN",
                     nn.initializers.zeros)(jax.nn.silu(y), domain_id)
            shift, scale, gate = jnp.split(mod, 3, axis=-1)
            hn = DomainLayerNorm(self.num_domains, self.model_channels,
                                 epsilon=1e-6, dtype=self.dtype,
                                 name=f"res_{i}_ln")(h, domain_id)
            hh = hn * (1 + scale) + shift
            hh = dd(self.model_channels, self.model_channels, f"res_{i}_fc1")(hh, domain_id)
            hh = jax.nn.silu(hh)
            hh = dd(self.model_channels, self.model_channels, f"res_{i}_fc2")(hh, domain_id)
            h = h + gate * hh

        mod = dd(self.model_channels, 2 * self.model_channels, "final_adaLN",
                 nn.initializers.zeros)(jax.nn.silu(y), domain_id)
        shift, scale = jnp.split(mod, 2, axis=-1)
        hn = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                          dtype=jnp.float32, name="final_ln")(h.astype(jnp.float32))
        hh = hn.astype(self.dtype) * (1 + scale) + shift
        out = dd(self.model_channels, 2 * self.in_channels, "final_linear",
                 nn.initializers.zeros)(hh, domain_id)
        return out.astype(jnp.float32)


def _apply_dense(p: dict, x: jax.Array, dtype) -> jax.Array:
    """nn.Dense with explicit params — op-identical to flax's Dense body
    (promote_dtype → dot_general → bias add; linear.py:253-300). Modules
    can't be constructed inside a bound method, hence the inlined math."""
    from flax.linen.dtypes import promote_dtype

    x, kernel, bias = promote_dtype(x, p["kernel"], p.get("bias"), dtype=dtype)
    y = jax.lax.dot_general(x, kernel, (((x.ndim - 1,), (0,)), ((), ())))
    if bias is not None:
        y = y + jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))
    return y


def _apply_domain_dense(p: dict, x: jax.Array, domain_id, dtype) -> jax.Array:
    """DomainDense with the domain slice taken here (action_stems.py:89-100)."""
    w = take_domain(p["kernel"], domain_id).astype(dtype)
    y = jnp.einsum("...i,io->...o", x.astype(dtype), w,
                   preferred_element_type=dtype)
    if "bias" in p:
        y = y + take_domain(p["bias"], domain_id).astype(dtype)
    return y


def _apply_ln(p: Optional[dict], x: jax.Array) -> jax.Array:
    """fp32 nn.LayerNorm(eps=1e-6), with or without scale/bias params —
    op-identical to flax's fast-variance path (normalization.py:138-226)."""
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1)
    mu2 = jnp.mean(jax.lax.square(x), axis=-1)
    var = jnp.maximum(0.0, mu2 - jax.lax.square(mu))
    y = x - mu[..., None]
    mul = jax.lax.rsqrt(var[..., None] + 1e-6)
    fshape = (1,) * (x.ndim - 1) + (-1,)
    if p is not None:
        mul = mul * p["scale"].reshape(fshape)
    y = y * mul
    if p is not None:
        y = y + p["bias"].reshape(fshape)
    return y


def _apply_domain_ln(p: dict, x: jax.Array, domain_id, dtype) -> jax.Array:
    """DomainLayerNorm(eps=1e-6) with the domain slice taken here
    (action_stems.py:103-121)."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + 1e-6)
    y = (y * take_domain(p["scale"], domain_id)
         + take_domain(p["bias"], domain_id))
    return y.astype(dtype)


def premod_phases(net_params: dict, *, num_res_blocks: int, dtype,
                  domain_id=None):
    """Split SimpleMLPAdaLN / DomainSimpleMLPAdaLN into two phases for
    sampling:

      precompute(t_all (K,), c (N, Z)) -> mods   # all (t, c)-dependent work
      residual(x (N, C), mods_k) -> (N, 2C)      # the x-dependent MLP

    During ancestral sampling, x is the only quantity that changes between
    denoise steps — the timestep/cond embeddings and every adaLN modulation
    depend on (t, c) alone, so they can be computed for all K respaced
    steps in one batched pass (one read of those weights instead of K).
    The sequential loop then touches only input_proj/fc1/fc2/final_linear
    (~⅓ of the head's weights) plus the small precomputed mod rows, which
    cuts the sampler's per-step HBM traffic ~2.5× — the head is
    weight-read-bound at MAR batch sizes (the N rows of x are tiny).

    `domain_id=None` selects the plain net (param keys time_embed/…);
    otherwise the domain-stacked net (time_fc1/…) is sliced at domain_id.
    Matches the module __call__s in this file op-for-op; exactness is
    pinned by tests/test_diffusion.py::test_premod_sampler_matches_loop.
    """
    P = net_params
    domain = domain_id is not None

    if domain:
        dense = lambda p, x: _apply_domain_dense(p, x, domain_id, dtype)
        res_ln = lambda p, x: _apply_domain_ln(p, x, domain_id, dtype)
    else:
        dense = lambda p, x: _apply_dense(p, x, dtype)
        res_ln = lambda p, x: _apply_ln(p, x).astype(dtype)

    def precompute(t_all: jax.Array, c: jax.Array) -> dict:
        t_freq = timestep_embedding(t_all, 256)
        if domain:
            t_emb = dense(P["time_fc1"], t_freq.astype(dtype))
            t_emb = dense(P["time_fc2"], jax.nn.silu(t_emb))
        else:
            t_emb = dense(P["time_embed"]["fc1"], t_freq)
            t_emb = dense(P["time_embed"]["fc2"], jax.nn.silu(t_emb))
        c_emb = dense(P["cond_embed"], c.astype(dtype))
        y = t_emb[:, None, :] + c_emb[None, :, :]  # (K, N, H)
        sy = jax.nn.silu(y)
        return {
            "blocks": tuple(dense(P[f"res_{i}_adaLN"], sy)
                            for i in range(num_res_blocks)),
            "final": dense(P["final_adaLN"], sy),
        }

    def residual(x: jax.Array, mods_k: dict) -> jax.Array:
        h = dense(P["input_proj"], x.astype(dtype))
        for i in range(num_res_blocks):
            shift, scale, gate = jnp.split(mods_k["blocks"][i], 3, axis=-1)
            hn = res_ln(P[f"res_{i}_ln"], h)
            hh = hn * (1 + scale) + shift
            hh = dense(P[f"res_{i}_fc1"], hh)
            hh = jax.nn.silu(hh)
            hh = dense(P[f"res_{i}_fc2"], hh)
            h = h + gate * hh
        shift, scale = jnp.split(mods_k["final"], 2, axis=-1)
        hn = _apply_ln(None, h)
        hh = hn.astype(dtype) * (1 + scale) + shift
        out = dense(P["final_linear"], hh)
        return out.astype(jnp.float32)

    return precompute, residual


class DiffLoss(nn.Module):
    """Diffusion loss head (reference: hma/model/diffloss.py:10-59).

    Methods must be called through module.apply(..., method=...):
      - loss(target (N,C), z (N,Z), mask (N,) or None, rngs needed)
      - sample(z (N,Z) [or (2N,Z) with cfg != 1], key) -> (N or 2N, C)
    """

    target_channels: int
    z_channels: int
    depth: int
    width: int
    num_sampling_steps: str = "100"
    num_domains: int = 0  # > 0: domain-stacked net
    dtype: jnp.dtype = jnp.bfloat16
    # None: auto (TPU + supported shapes). True: force the fused denoise
    # loop kernel (interpret-mode off-TPU — for tests). False: never.
    loop_kernel: Optional[bool] = None

    def setup(self):
        if self.num_domains > 0:
            self.net = DomainSimpleMLPAdaLN(
                num_domains=self.num_domains, in_channels=self.target_channels,
                model_channels=self.width, z_channels=self.z_channels,
                num_res_blocks=self.depth, dtype=self.dtype, name="net")
        else:
            self.net = SimpleMLPAdaLN(
                in_channels=self.target_channels, model_channels=self.width,
                z_channels=self.z_channels, num_res_blocks=self.depth,
                dtype=self.dtype, name="net")
        self.train_sched = make_schedule("cosine", 1000, "")
        self.gen_sched = make_schedule("cosine", 1000, self.num_sampling_steps)

    def _apply_net(self, domain_id):
        if self.num_domains > 0:
            return lambda x, t, c: self.net(x, t, c, domain_id)
        return lambda x, t, c: self.net(x, t, c)

    def loss(self, target: jax.Array, z: jax.Array,
             mask: Optional[jax.Array] = None,
             domain_id: Optional[jax.Array] = None,
             dim_mask: Optional[jax.Array] = None) -> jax.Array:
        """Masked diffusion loss over token rows (reference: diffloss.py:28-35).

        dim_mask: optional (C,) validity mask for padded action channels.
        """
        key = self.make_rng("diffusion")
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (target.shape[0],), 0, self.train_sched.num_timesteps)
        net = self._apply_net(domain_id)
        if dim_mask is not None:
            base = net
            net = lambda x, tt, c: base(x * dim_mask, tt, c)
            target = target * dim_mask
        # channel_mask keeps padded action dims out of the loss mean: their
        # noise targets are hidden from the net by the input mask, so they
        # would otherwise add an irreducible E[eps^2]=1 floor per padded
        # dim and dilute the real channels' gradient (the reference's
        # exact-width per-domain heads have no padding to mask).
        out = training_losses(net, self.train_sched, target, t, z, kn,
                              channel_mask=dim_mask)
        loss = out["loss"]
        if mask is not None:
            loss = jnp.sum(loss * mask) / (jnp.sum(mask) + 1e-8)
        else:
            loss = jnp.mean(loss)
        return loss

    def sample(self, z: jax.Array, key: jax.Array, temperature: float = 1.0,
               cfg: float = 1.0, clip_denoised: bool = False,
               domain_id: Optional[jax.Array] = None,
               premod: bool = True) -> jax.Array:
        """Ancestral sampling; with cfg != 1, z is (2N, Z) [cond; uncond]
        and the returned (2N, C) halves are identical guided samples
        (reference: diffloss.py:37-59, forward_with_cfg :235-243).

        premod=True (default) runs the premodulated sampler — identical
        numerics (see premod_phases), ~2.5× less HBM traffic per denoise
        step. premod=False keeps the direct per-step net evaluation (the
        oracle for the exactness test)."""
        if premod:
            return self._sample_premod(z, key, temperature, cfg,
                                       clip_denoised, domain_id)
        net = self._apply_net(domain_id)
        if cfg != 1.0:
            n = z.shape[0] // 2
            noise = jax.random.normal(key, (n, self.target_channels), jnp.float32)
            noise = jnp.concatenate([noise, noise], axis=0)

            def guided(x, t, c):
                half = x[:n]
                combined = jnp.concatenate([half, half], axis=0)
                out = net(combined, t, c)
                eps, rest = out[..., :self.target_channels], out[..., self.target_channels:]
                cond_eps, uncond_eps = eps[:n], eps[n:]
                half_eps = uncond_eps + cfg * (cond_eps - uncond_eps)
                eps = jnp.concatenate([half_eps, half_eps], axis=0)
                return jnp.concatenate([eps, rest], axis=-1)

            fn = guided
        else:
            noise = jax.random.normal(key, (z.shape[0], self.target_channels), jnp.float32)
            fn = net
        key = jax.random.fold_in(key, 1)
        return p_sample_loop(fn, self.gen_sched, noise, z, key,
                             temperature=temperature, clip_denoised=clip_denoised)

    def _sample_premod(self, z, key, temperature, cfg, clip_denoised,
                       domain_id):
        """sample() via premod_phases + p_sample_loop_indexed. Bit-exact
        with the direct path: identical ops in the same order, identical
        RNG sequence — only the batching of the (t, c)-only computations
        differs (verified by tests/test_diffusion.py). On TPU, supported
        shapes run the whole loop as one VMEM-resident Pallas kernel
        (ops/diffusion_sampler.py; tolerance-tested vs this path)."""
        sched = self.gen_sched
        net_params = self.variables["params"]["net"]
        precompute, residual = premod_phases(
            net_params, num_res_blocks=self.depth, dtype=self.dtype,
            domain_id=domain_id if self.num_domains > 0 else None)
        t_all = jnp.asarray(sched.timestep_map)  # net sees original timesteps
        mods = precompute(t_all, z)
        C = self.target_channels

        if self._use_loop_kernel(z.shape[0], temperature, cfg):
            return self._sample_kernel(z, key, mods, float(temperature),
                                       float(cfg), clip_denoised, domain_id)

        if cfg != 1.0:
            n = z.shape[0] // 2
            noise = jax.random.normal(key, (n, C), jnp.float32)
            noise = jnp.concatenate([noise, noise], axis=0)

            def net_idx(x, idx):
                mods_k = jax.tree.map(lambda m: jnp.take(m, idx, axis=0), mods)
                half = x[:n]
                combined = jnp.concatenate([half, half], axis=0)
                out = residual(combined, mods_k)
                eps, rest = out[..., :C], out[..., C:]
                cond_eps, uncond_eps = eps[:n], eps[n:]
                half_eps = uncond_eps + cfg * (cond_eps - uncond_eps)
                eps = jnp.concatenate([half_eps, half_eps], axis=0)
                return jnp.concatenate([eps, rest], axis=-1)
        else:
            noise = jax.random.normal(key, (z.shape[0], C), jnp.float32)

            def net_idx(x, idx):
                mods_k = jax.tree.map(lambda m: jnp.take(m, idx, axis=0), mods)
                return residual(x, mods_k)

        key = jax.random.fold_in(key, 1)
        return p_sample_loop_indexed(net_idx, sched, noise, key,
                                     temperature=temperature,
                                     clip_denoised=clip_denoised)

    def _use_loop_kernel(self, n_rows: int, temperature, cfg) -> bool:
        from hma_tpu.ops.diffusion_sampler import supported

        if self.loop_kernel is False:
            return False
        if not isinstance(temperature, (int, float)):
            return False
        if not isinstance(cfg, (int, float)):
            return False
        if self.loop_kernel is True:
            return True
        if jax.default_backend() in ("cpu", "gpu"):
            return False
        return supported(self.gen_sched.num_timesteps, n_rows,
                         self.target_channels, self.width, self.depth,
                         self.dtype)

    def _loop_kernel_fc_params(self, domain_id):
        """Extract (and for the domain net, slice) the sequential-phase
        weights, cast to the compute dtype so they sit in VMEM at bf16."""
        P = self.variables["params"]["net"]
        names = (["input_proj", "final_linear"]
                 + [f"res_{j}_fc1" for j in range(self.depth)]
                 + [f"res_{j}_fc2" for j in range(self.depth)])
        fc = {}
        sl = (lambda a: take_domain(a, domain_id)) \
            if self.num_domains > 0 else (lambda a: a)
        for n in names:
            fc[n] = {"kernel": sl(P[n]["kernel"]).astype(self.dtype),
                     "bias": sl(P[n]["bias"]).astype(self.dtype)}
        for j in range(self.depth):
            ln = P[f"res_{j}_ln"]
            fc[f"res_{j}_ln"] = {"scale": sl(ln["scale"]),
                                 "bias": sl(ln["bias"])}
        return fc

    def _sample_kernel(self, z, key, mods, temperature, cfg, clip_denoised,
                       domain_id):
        from hma_tpu.ops.diffusion_sampler import (
            fused_denoise_loop, pregenerate_noises, schedule_table)

        sched = self.gen_sched
        C = self.target_channels
        N = z.shape[0]
        if cfg != 1.0:
            n_half = N // 2
            noise = jax.random.normal(key, (n_half, C), jnp.float32)
            noise = jnp.concatenate([noise, noise], axis=0)
        else:
            n_half = 0
            noise = jax.random.normal(key, (N, C), jnp.float32)
        key = jax.random.fold_in(key, 1)
        zs = pregenerate_noises(key, sched.num_timesteps, N, C)
        mods_cat = jnp.concatenate(list(mods["blocks"]) + [mods["final"]],
                                   axis=-1)
        # Mosaic DMAs slice the mods row axis, which must be aligned to
        # the (16, 128) bf16 tile; pad rows AFTER the RNG draws (so real
        # rows get the same normals as the XLA path) — pads ride along
        # inertly at the tail and are sliced off here.
        pad = (-N) % 16
        if pad:
            noise = jnp.pad(noise, ((0, pad), (0, 0)))
            zs = jnp.pad(zs, ((0, 0), (0, pad), (0, 0)))
            mods_cat = jnp.pad(mods_cat, ((0, 0), (0, pad), (0, 0)))
        out = fused_denoise_loop(
            noise, zs, mods_cat, jnp.asarray(schedule_table(sched)),
            self._loop_kernel_fc_params(domain_id), depth=self.depth,
            temperature=temperature, clip_denoised=clip_denoised,
            domain_ln=self.num_domains > 0, n_half=n_half, cfg=cfg,
            dtype=self.dtype,
            interpret=jax.default_backend() in ("cpu", "gpu"))
        return out[:N] if pad else out
