"""The MAR diffusion head's full denoise loop as ONE Pallas TPU kernel.

Why: ancestral sampling runs K (default 100) strictly sequential denoise
steps whose per-step work is tiny at MAR batch sizes (N = tens of token
rows). As XLA ops the loop is *latency*-bound, not bandwidth-bound — the
device trace of the d512 MAR rollout (experiments/mar_probe.py trace)
shows ~31 us per denoise step of which only ~14 us is leaf compute; the
rest is per-op scheduling and HBM weight-stream latency across the ~15
ops of every step, times 16k steps per window.

The TPU-native fix: v5e VMEM is large (a 120 MB scratch compiles and
runs; measured in this image), so the entire x-dependent weight set of
SimpleMLPAdaLN — input_proj, per-block fc1/fc2 + LN affines, final
linear, ~16 MB bf16 at width 1024 — stays RESIDENT in VMEM for all K
steps, the precomputed per-step adaLN modulations (see
hma_tpu.models.diffloss.premod_phases) stream in via one async DMA per
step, and the whole loop body runs inside a single kernel: K*15 XLA ops
become 1 pallas_call. The reference's CUDA design has no analog short of
a persistent megakernel (hma/model/diffloss.py:37-59 launches ~8 CUDA
kernels per denoise step).

Numerics follow the XLA premod path op-for-op (same matmul shapes and
dtypes, same fp32 LayerNorms, same posterior update); transcendental
implementations differ (Mosaic vs XLA exp/rsqrt), so parity is tested to
tolerance, in interpret mode on CPU (tests/test_diffusion_kernel.py) and
the XLA path remains the fallback for unsupported shapes/backends.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln(x32: jax.Array, scale, bias, *, domain: bool) -> jax.Array:
    """fp32 LayerNorm(eps=1e-6) over the last axis.

    domain=False: flax fast-variance form (normalization.py:138-226);
    domain=True: DomainLayerNorm's jnp.var form (action_stems.py:103-121).
    scale/bias None = the parameterless final LN.
    """
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    if domain:
        var = jnp.mean(jax.lax.square(x32 - mu), axis=-1, keepdims=True)
        y = (x32 - mu) * jax.lax.rsqrt(var + 1e-6)
        if scale is not None:
            y = y * scale + bias
        return y
    mu2 = jnp.mean(jax.lax.square(x32), axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - jax.lax.square(mu))
    mul = jax.lax.rsqrt(var + 1e-6)
    if scale is not None:
        mul = mul * scale
    y = (x32 - mu) * mul
    if bias is not None:
        y = y + bias
    return y


def _denoise_kernel(*refs, depth: int, K: int, C: int, H: int,
                    temperature: float, clip_denoised: bool,
                    domain_ln: bool, n_half: int, cfg: float, dtype):
    """refs layout (see fused_denoise_loop): inputs
    [x0, zs, sched, w_in, b_in, (ln_s, ln_b, w1, b1, w2, b2) x depth,
     w_out, b_out, mods(HBM)] + outputs [x_out] + scratch [buf, sem].
    """
    it = iter(refs)
    x0_ref, zs_ref, sched_ref = next(it), next(it), next(it)
    w_in_ref, b_in_ref = next(it), next(it)
    blocks = [tuple(next(it) for _ in range(6)) for _ in range(depth)]
    w_out_ref, b_out_ref = next(it), next(it)
    mods_ref = next(it)
    x_out_ref = next(it)
    buf_ref, sem_ref = next(it), next(it)

    f32 = jnp.float32

    def dot(a, w_ref, b_ref):
        y = jnp.dot(a.astype(dtype), w_ref[:].astype(dtype),
                    preferred_element_type=f32).astype(dtype)
        return y + b_ref[:].astype(dtype)[None, :]

    one = jnp.asarray(1.0, dtype)  # explicit dtype: Mosaic rejects the
    # weak-typed f32 literal broadcast into a bf16 vector

    def net(x, mods):
        """SimpleMLPAdaLN residual phase on (Nn, C) rows; mods (Nn, M)."""
        h = dot(x, w_in_ref, b_in_ref)
        for j, (ln_s, ln_b, w1, b1, w2, b2) in enumerate(blocks):
            off = j * 3 * H
            shift = mods[:, off:off + H]
            scale = mods[:, off + H:off + 2 * H]
            gate = mods[:, off + 2 * H:off + 3 * H]
            hn = _ln(h.astype(f32), ln_s[:].astype(f32)[None, :],
                     ln_b[:].astype(f32)[None, :], domain=domain_ln).astype(dtype)
            hh = hn * (one + scale) + shift
            hh = dot(hh, w1, b1)
            # silu via f32 sigmoid: Mosaic rejects the f32 constants that
            # jax.nn.silu's bf16 lowering broadcasts into bf16 vectors
            hh = (hh.astype(f32) * jax.nn.sigmoid(hh.astype(f32))).astype(dtype)
            hh = dot(hh, w2, b2)
            h = h + gate * hh
        off = depth * 3 * H
        shift = mods[:, off:off + H]
        scale = mods[:, off + H:off + 2 * H]
        hn = _ln(h.astype(f32), None, None, domain=False)
        hh = hn.astype(dtype) * (one + scale) + shift
        return dot(hh, w_out_ref, b_out_ref).astype(f32)  # (Nn, 2C)

    def _mods_dma(i, slot):
        return pltpu.make_async_copy(mods_ref.at[K - 1 - i],
                                     buf_ref.at[slot], sem_ref.at[slot])

    def step(i, x):
        idx = K - 1 - i
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < K)
        def _():  # prefetch next step's mods while this step computes
            _mods_dma(i + 1, jax.lax.rem(i + 1, 2)).start()

        _mods_dma(i, slot).wait()
        mods = buf_ref[slot]
        if n_half > 0:
            # rows: [cond(n) | uncond(n) | alignment padding]; the net
            # input duplicates the cond rows, pads pass through inertly
            half = x[:n_half].astype(dtype)
            parts = [half, half]
            if x.shape[0] > 2 * n_half:
                parts.append(x[2 * n_half:].astype(dtype))
            out = net(jnp.concatenate(parts, axis=0), mods)
            eps, rest = out[:, :C], out[:, C:]
            cond_eps = eps[:n_half]
            uncond_eps = eps[n_half:2 * n_half]
            half_eps = uncond_eps + cfg * (cond_eps - uncond_eps)
            parts = [half_eps, half_eps]
            if x.shape[0] > 2 * n_half:
                parts.append(eps[2 * n_half:])
            eps = jnp.concatenate(parts, axis=0)
        else:
            out = net(x.astype(dtype), mods)
            eps, rest = out[:, :C], out[:, C:]

        srac = sched_ref[idx, 0]
        srm1 = sched_ref[idx, 1]
        pmc1 = sched_ref[idx, 2]
        pmc2 = sched_ref[idx, 3]
        minlog = sched_ref[idx, 4]
        maxlog = sched_ref[idx, 5]
        x0p = srac * x - srm1 * eps
        if clip_denoised:
            x0p = jnp.clip(x0p, -1.0, 1.0)
        mean = pmc1 * x0p + pmc2 * x
        # clamp to the defined interpolation domain, matching
        # diffusion/gaussian.py learned_range_log_variance (the unbounded
        # form overflows the VB backward when v drifts past ±1; the
        # sampler must stay bit-consistent with the reference path)
        frac = jnp.clip((rest + 1.0) / 2.0, 0.0, 1.0)
        logvar = frac * maxlog + (1.0 - frac) * minlog
        nonzero = (idx != 0).astype(f32)
        z = zs_ref[i].astype(f32)
        return mean + nonzero * jnp.exp(0.5 * logvar) * z * temperature

    _mods_dma(0, 0).start()  # warm up the double buffer
    x = jax.lax.fori_loop(0, K, step, x0_ref[:].astype(f32))
    x_out_ref[:] = x


def supported(K: int, N: int, C: int, H: int, depth: int,
              dtype=jnp.bfloat16) -> bool:
    """Gate: weights must fit VMEM comfortably and dims tile sanely."""
    itemsize = jnp.dtype(dtype).itemsize
    weight_bytes = (C * H + depth * 2 * H * H + H * 2 * C) * itemsize
    mods_row_bytes = N * (depth * 3 * H + 2 * H) * itemsize
    zs_bytes = K * N * C * 4
    budget = (weight_bytes + mods_row_bytes * 2 + zs_bytes
              + 4 * N * max(H, C) * 4)
    return (budget < 96 * 2**20 and H % 128 == 0 and K >= 2
            and N * (depth * 3 * H + 2 * H) * itemsize < 16 * 2**20)


def fused_denoise_loop(x_noise: jax.Array, zs: jax.Array, mods: jax.Array,
                       sched_tbl: jax.Array, fc_params: dict, *,
                       depth: int, temperature: float, clip_denoised: bool,
                       domain_ln: bool, n_half: int = 0, cfg: float = 1.0,
                       dtype=jnp.bfloat16, interpret: bool = False):
    """Run the K-step ancestral loop in one kernel.

    x_noise (N, C) f32; zs (K, N, C) f32 pregenerated per-step normals in
    scan order (zs[i] belongs to idx = K-1-i); mods (K, N, depth*3H+2H)
    premodulations; sched_tbl (K, 8) f32 rows
    [sqrt_recip_ac, sqrt_recipm1_ac, post_mean_c1, post_mean_c2,
     post_logvar_clipped, log_betas, 0, 0]; fc_params with keys
    input_proj/res_{i}_ln/res_{i}_fc1/res_{i}_fc2/final_linear, each
    {kernel, bias} ({scale, bias} for LNs), already domain-sliced.
    """
    N, C = x_noise.shape
    K = zs.shape[0]
    H = fc_params["input_proj"]["kernel"].shape[-1]
    M = depth * 3 * H + 2 * H

    ins = [x_noise, zs, sched_tbl,
           fc_params["input_proj"]["kernel"], fc_params["input_proj"]["bias"]]
    for j in range(depth):
        ins += [fc_params[f"res_{j}_ln"]["scale"],
                fc_params[f"res_{j}_ln"]["bias"],
                fc_params[f"res_{j}_fc1"]["kernel"],
                fc_params[f"res_{j}_fc1"]["bias"],
                fc_params[f"res_{j}_fc2"]["kernel"],
                fc_params[f"res_{j}_fc2"]["bias"]]
    ins += [fc_params["final_linear"]["kernel"],
            fc_params["final_linear"]["bias"], mods]

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [vmem] * (len(ins) - 1) + [pl.BlockSpec(memory_space=pl.ANY)]

    kernel = functools.partial(
        _denoise_kernel, depth=depth, K=K, C=C, H=H,
        temperature=float(temperature), clip_denoised=bool(clip_denoised),
        domain_ln=bool(domain_ln), n_half=int(n_half), cfg=float(cfg),
        dtype=dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
        in_specs=in_specs,
        out_specs=vmem,
        scratch_shapes=[pltpu.VMEM((2, N, M), mods.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * K * N * (C * H + depth * 2 * H * H + 2 * H * C),
            bytes_accessed=K * N * M * mods.dtype.itemsize,
            transcendentals=K * N * (depth + 1) * H),
    )(*ins)


def pregenerate_noises(key: jax.Array, K: int, N: int, C: int) -> jax.Array:
    """The per-step normals exactly as p_sample_loop would draw them:
    key_{i+1}, k_i = split(key_i); z_i = normal(k_i, (N, C))."""

    def body(key, _):
        key, k = jax.random.split(key)
        return key, jax.random.normal(k, (N, C), jnp.float32)

    _, zs = jax.lax.scan(body, key, None, length=K)
    return zs


def schedule_table(sched) -> np.ndarray:
    """(K, 8) fp32 schedule rows for fused_denoise_loop."""
    K = sched.num_timesteps
    tbl = np.zeros((K, 8), np.float32)
    tbl[:, 0] = sched.sqrt_recip_alphas_cumprod
    tbl[:, 1] = sched.sqrt_recipm1_alphas_cumprod
    tbl[:, 2] = sched.posterior_mean_coef1
    tbl[:, 3] = sched.posterior_mean_coef2
    tbl[:, 4] = sched.posterior_log_variance_clipped
    tbl[:, 5] = np.log(np.maximum(sched.betas, 1e-20))
    return tbl
