"""Gaussian diffusion (IDDPM/ADM lineage) as pure jnp functions.

Functional rebuild of the reference's vendored OpenAI/DiT diffusion stack
(hma/diffusion/gaussian_diffusion.py, respace.py): cosine beta schedule,
epsilon prediction with LEARNED_RANGE variance, MSE + VB training loss,
respaced ancestral sampling with temperature. All schedule tensors are
precomputed numpy constants folded into the jaxpr; the sampling loop is a
lax.scan (the reference's Python loop over 1000/100 steps would unroll).

Used by the MAR diffusion head (hma_tpu/models/diffloss.py): train
diffusion = 1000-step cosine, gen diffusion = respaced "100"
(reference: hma/model/diffloss.py:25-26).
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class DiffusionSchedule(NamedTuple):
    """Precomputed schedule tensors, length = num (respaced) timesteps."""

    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray
    timestep_map: np.ndarray  # respaced index -> original timestep (for the net)

    @property
    def num_timesteps(self) -> int:
        return len(self.betas)


def cosine_betas(num_steps: int, max_beta: float = 0.999) -> np.ndarray:
    """squaredcos_cap_v2 schedule (reference: gaussian_diffusion.py:45-62)."""

    def alpha_bar(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    betas = []
    for i in range(num_steps):
        t1, t2 = i / num_steps, (i + 1) / num_steps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.asarray(betas, dtype=np.float64)


def linear_betas(num_steps: int) -> np.ndarray:
    scale = 1000 / num_steps
    return np.linspace(scale * 1e-4, scale * 2e-2, num_steps, dtype=np.float64)


def space_timesteps(num_timesteps: int, section_counts) -> list[int]:
    """Evenly-strided timestep subsets (reference: respace.py:12-57)."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return list(range(0, num_timesteps, i))
            raise ValueError(f"cannot create exactly {desired} steps with an integer stride")
        section_counts = [int(x) for x in section_counts.split(",")]
    elif isinstance(section_counts, int):
        section_counts = [section_counts]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx, all_steps = 0, []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur, taken = 0.0, []
        for _ in range(count):
            taken.append(start_idx + round(cur))
            cur += stride
        all_steps += taken
        start_idx += size
    return sorted(all_steps)


def make_schedule(noise_schedule: str = "cosine", diffusion_steps: int = 1000,
                  timestep_respacing="") -> DiffusionSchedule:
    betas = cosine_betas(diffusion_steps) if noise_schedule == "cosine" else linear_betas(diffusion_steps)

    if timestep_respacing in (None, "", []):
        use = list(range(diffusion_steps))
    else:
        use = space_timesteps(diffusion_steps, timestep_respacing)

    # re-derive betas over the retained timesteps (reference: respace.py:61-92)
    alphas_cumprod_full = np.cumprod(1.0 - betas)
    new_betas, timestep_map = [], []
    last = 1.0
    for t in use:
        new_betas.append(1 - alphas_cumprod_full[t] / last)
        last = alphas_cumprod_full[t]
        timestep_map.append(t)
    betas = np.asarray(new_betas, dtype=np.float64)

    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.append(1.0, ac[:-1])
    posterior_variance = betas * (1.0 - ac_prev) / (1.0 - ac)
    posterior_log = np.log(np.append(posterior_variance[1], posterior_variance[1:]))
    return DiffusionSchedule(
        betas=betas,
        alphas_cumprod=ac,
        alphas_cumprod_prev=ac_prev,
        sqrt_alphas_cumprod=np.sqrt(ac),
        sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - ac),
        sqrt_recip_alphas_cumprod=np.sqrt(1.0 / ac),
        sqrt_recipm1_alphas_cumprod=np.sqrt(1.0 / ac - 1),
        posterior_variance=posterior_variance,
        posterior_log_variance_clipped=posterior_log,
        posterior_mean_coef1=betas * np.sqrt(ac_prev) / (1.0 - ac),
        posterior_mean_coef2=(1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac),
        timestep_map=np.asarray(timestep_map, dtype=np.int32),
    )


def _extract(arr: np.ndarray, t: jax.Array, ndim: int) -> jax.Array:
    """Gather schedule values at t and broadcast to an ndim tensor."""
    out = jnp.take(jnp.asarray(arr, jnp.float32), t)
    return out.reshape(t.shape + (1,) * (ndim - t.ndim))


def q_sample(sched: DiffusionSchedule, x0: jax.Array, t: jax.Array,
             noise: jax.Array) -> jax.Array:
    """Forward diffusion (reference: gaussian_diffusion.py:269-287)."""
    return (_extract(sched.sqrt_alphas_cumprod, t, x0.ndim) * x0
            + _extract(sched.sqrt_one_minus_alphas_cumprod, t, x0.ndim) * noise)


def q_posterior_mean(sched, x0, xt, t):
    return (_extract(sched.posterior_mean_coef1, t, x0.ndim) * x0
            + _extract(sched.posterior_mean_coef2, t, x0.ndim) * xt)


def predict_x0_from_eps(sched, xt, t, eps):
    return (_extract(sched.sqrt_recip_alphas_cumprod, t, xt.ndim) * xt
            - _extract(sched.sqrt_recipm1_alphas_cumprod, t, xt.ndim) * eps)


def learned_range_log_variance(sched, t, v, ndim):
    """Interpolate log-variance between posterior (min) and beta (max)
    from the model's raw v output (reference: gaussian_diffusion.py:306-315).

    frac is clamped to the [0, 1] domain the interpolation is defined
    on. The reference leaves it unbounded and merely *assumes* v stays
    in [-1, 1]; at scale that assumption fails — the d512 STMAR overfit
    run (2026-08-20, mar_overfit log) drifted v past the boundary around
    step 225, model_logvar left [min_log, max_log], and every backward
    overflowed through the VB exp()s from then on (grad_norm=inf), so
    the NaN-guard skipped 100% of subsequent steps and training froze at
    eval 0.60. Clamping bounds every downstream exp(); an out-of-range
    variance head saturates at the boundary (which IS the optimum the
    drift overshot) instead of killing the run. Forward-identical to the
    reference whenever v is in range — the only regime its own training
    survives."""
    min_log = _extract(sched.posterior_log_variance_clipped, t, ndim)
    max_log = _extract(np.log(np.maximum(sched.betas, 1e-20)), t, ndim)
    frac = jnp.clip((v.astype(jnp.float32) + 1) / 2, 0.0, 1.0)
    return frac * max_log + (1 - frac) * min_log


def _normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N1 || N2) elementwise (reference: diffusion_utils.py:12-25).

    The exp() inputs are clamped at ±80 — fp32 exp overflows to inf just
    past 88, and an inf here either makes the loss inf (selected branch)
    or, worse, turns the discarded vb branch's zero cotangent into
    0*inf = NaN in the backward. At the clamp boundary the KL is ~5e34:
    astronomically past any reachable variance, loss still explodes
    visibly, but the gradient stays finite and points back toward sane
    logvar — training recovers via grad clipping instead of NaN-skipping
    forever."""
    return 0.5 * (-1.0 + logvar2 - logvar1
                  + jnp.exp(jnp.clip(logvar1 - logvar2, -80.0, 80.0))
                  + ((mean1 - mean2) ** 2)
                  * jnp.exp(jnp.clip(-logvar2, -80.0, 80.0)))


def _discretized_gaussian_log_likelihood(x, means, log_scales):
    """(reference: diffusion_utils.py:43-64)

    -log_scales is clamped at ±80 before exp (see _normal_kl): past the
    clamp the CDFs are saturated at 0/1 anyway, so the forward is
    unchanged, while the backward becomes exactly 0 (the true saturated
    gradient) instead of pdf(inf)*inf = NaN."""
    centered = x - means
    inv_stdv = jnp.exp(jnp.clip(-log_scales, -80.0, 80.0))
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_plus = jax.scipy.stats.norm.cdf(plus_in)
    cdf_min = jax.scipy.stats.norm.cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999, log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min,
                  jnp.log(jnp.clip(cdf_delta, 1e-12))))


def training_losses(net_apply: Callable, sched: DiffusionSchedule,
                    x0: jax.Array, t: jax.Array, cond, key: jax.Array,
                    channel_mask: Optional[jax.Array] = None):
    """Per-example loss: eps-MSE + VB term for the learned variance
    (reference: gaussian_diffusion.py:675-745, LossType.MSE + LEARNED_RANGE).

    net_apply(x_t, t, cond) -> (..., 2*C): [eps_pred, v].
    channel_mask: optional (C,) validity weights for padded channels —
    masked channels carry unpredictable noise targets (the net never sees
    them), so averaging over them would add a constant loss floor and
    dilute the real channels' gradient; the reference sidesteps this with
    exact-width per-domain heads (hma/model/st_mar.py:89-100).
    Returns dict with 'loss' shaped like t (mean over non-batch dims).
    """
    noise = jax.random.normal(key, x0.shape, x0.dtype)
    xt = q_sample(sched, x0, t, noise)
    out = net_apply(xt, t, cond)
    C = x0.shape[-1]
    eps_pred, v = out[..., :C], out[..., C:]

    nb = tuple(range(1, x0.ndim))

    def cmean(x):
        if channel_mask is None:
            return jnp.mean(x, axis=nb)
        w = jnp.broadcast_to(channel_mask, x.shape).astype(jnp.float32)
        return jnp.sum(x * w, axis=nb) / jnp.maximum(jnp.sum(w, axis=nb), 1e-8)

    mse = cmean((noise.astype(jnp.float32) - eps_pred.astype(jnp.float32)) ** 2)

    # VB term with frozen mean (stop-gradient on eps)
    x0_pred = predict_x0_from_eps(sched, xt, t, jax.lax.stop_gradient(eps_pred))
    model_mean = q_posterior_mean(sched, x0_pred, xt, t)
    model_logvar = learned_range_log_variance(sched, t, v, x0.ndim)

    true_mean = q_posterior_mean(sched, x0, xt, t)
    true_logvar = _extract(sched.posterior_log_variance_clipped, t, x0.ndim)

    # Double-where: `vb = where(t==0, nll, kl)` evaluates BOTH branches on
    # every row, and a row whose learned logvar has drifted far enough
    # makes the UNSELECTED branch's forward overflow (exp(-logvar) in the
    # nll for t!=0, exp(logvar1-logvar2) in the kl for t==0). The where
    # discards the inf in the forward — loss stays finite — but the
    # backward multiplies the branch's zero cotangent through the inf
    # intermediate: 0*inf = NaN, poisoning every grad. Feeding each
    # branch a benign logvar (the finite true_logvar) on the rows where
    # the other branch is selected is bit-identical in the forward and
    # kills the NaN path. Observed in the wild: d512 STMAR overfit run
    # 2026-08-19 (finite loss, NaN grads by step ~50).
    t_is0 = (t == 0).reshape(t.shape + (1,) * (x0.ndim - t.ndim))
    kl_logvar = jnp.where(t_is0, true_logvar, model_logvar)
    kl = _normal_kl(true_mean, true_logvar, model_mean, kl_logvar)
    kl = cmean(kl) / math.log(2.0)

    nll_logvar = jnp.where(t_is0, model_logvar, true_logvar)
    nll = -_discretized_gaussian_log_likelihood(x0, model_mean, 0.5 * nll_logvar)
    nll = cmean(nll) / math.log(2.0)
    vb = jnp.where(t == 0, nll, kl)

    return {"loss": mse + vb, "mse": mse, "vb": vb}


def _p_sample_step(sched: DiffusionSchedule, x: jax.Array, idx: jax.Array,
                   out: jax.Array, k: jax.Array, temperature: float,
                   clip_denoised: bool) -> jax.Array:
    """One ancestral-sampling update given the net output for step `idx`
    (reference: gaussian_diffusion.py:358-392)."""
    t = jnp.full((x.shape[0],), idx, jnp.int32)
    C = x.shape[-1]
    eps, v = out[..., :C], out[..., C:]
    x0_pred = predict_x0_from_eps(sched, x, t, eps)
    if clip_denoised:
        x0_pred = jnp.clip(x0_pred, -1.0, 1.0)
    mean = q_posterior_mean(sched, x0_pred, x, t)
    logvar = learned_range_log_variance(sched, t, v, x.ndim)
    z = jax.random.normal(k, x.shape, jnp.float32)
    nonzero = (idx != 0).astype(jnp.float32)
    return mean + nonzero * jnp.exp(0.5 * logvar) * z * temperature


def p_sample_loop(net_apply: Callable, sched: DiffusionSchedule,
                  noise: jax.Array, cond, key: jax.Array, *,
                  temperature: float = 1.0, clip_denoised: bool = False):
    """Ancestral sampling scan from t = T-1 .. 0
    (reference: gaussian_diffusion.py:358-447). The net receives the
    *original* timestep via timestep_map (respace.py:95-119)."""
    tmap = jnp.asarray(sched.timestep_map)

    def body(carry, idx):
        x, key = carry
        key, k = jax.random.split(key)
        t = jnp.full((x.shape[0],), idx, jnp.int32)
        out = net_apply(x, jnp.take(tmap, t), cond)
        x = _p_sample_step(sched, x, idx, out, k, temperature, clip_denoised)
        return (x.astype(noise.dtype), key), None

    steps = jnp.arange(sched.num_timesteps - 1, -1, -1)
    (x, _), _ = jax.lax.scan(body, (noise, key), steps)
    return x


def p_sample_loop_indexed(net_apply_idx: Callable, sched: DiffusionSchedule,
                          noise: jax.Array, key: jax.Array, *,
                          temperature: float = 1.0,
                          clip_denoised: bool = False):
    """p_sample_loop for nets keyed by the *respaced step index* instead of
    (t, cond) — used by the premodulated sampler (diffloss.py), which
    precomputes every timestep-/cond-dependent quantity for all steps in
    one batched pass and only runs the x-dependent residual MLP inside the
    sequential loop. RNG sequence is identical to p_sample_loop."""

    def body(carry, idx):
        x, key = carry
        key, k = jax.random.split(key)
        out = net_apply_idx(x, idx)
        x = _p_sample_step(sched, x, idx, out, k, temperature, clip_denoised)
        return (x.astype(noise.dtype), key), None

    steps = jnp.arange(sched.num_timesteps - 1, -1, -1)
    (x, _), _ = jax.lax.scan(body, (noise, key), steps)
    return x
