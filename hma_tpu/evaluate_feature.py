"""Continuous-model (STMAR) evaluation CLI: `python -m hma_tpu.evaluate_feature`.

Rebuild of the reference's continuous evaluator (hma/evaluate_diffusion.py;
the README's `evaluate_feature.py` never existed — a known reference gap,
SURVEY.md §2.6): teacher-forced frame prediction over val latents with
latent-space MSE, diffusion loss, and — when an SVD-VAE decode fn and the
FVD/FID backbones are available — pixel metrics. FID/FVD hooks accept any
callable embedding fn (hma_tpu.metrics.fid / fvd).

Distributed: data-parallel over the device mesh and multi-process capable,
like hma_tpu/evaluate.py (the reference ran under multi-GPU Accelerate,
hma/evaluate.py:227,387-401). Latent MSE reduces inside jit; FID/FVD
inputs are gathered across processes (small eval sets) so the statistics
stay global.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from hma_tpu.config import DiffusionGenieConfig
from hma_tpu.data.datasets import RawFeatureDataset
from hma_tpu.metrics.token import AvgMetric
from hma_tpu.models.st_mar import STMAR
from hma_tpu.parallel import distributed as dist
from hma_tpu.parallel.sharded_eval import (
    local_rows,
    put_batch,
    round_batch,
    setup_eval_mesh,
    shard_params,
)
from hma_tpu.rollout.mar import generate_latents, teacher_forced_latents
from hma_tpu.train.trainer import _pad_actions
from hma_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint, load_config_json
from hma_tpu.utils.logging import MetricLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate a continuous (STMAR) HMA model")
    p.add_argument("--checkpoint_dir", type=str, required=True)
    p.add_argument("--val_data_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="eval_feature_out")
    p.add_argument("--domain", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--maskgit_steps", type=int, default=None)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--cfg", type=float, default=1.0,
                   help="classifier-free guidance scale (uncond = the "
                        "trained action-dropout branch; see rollout/mar.py)")
    p.add_argument("--num_prompt_frames", type=int, default=4)
    p.add_argument("--eval_mode", type=str, default="teacher_forced",
                   choices=["teacher_forced", "autoregressive"],
                   help="teacher_forced: each frame predicted from GT "
                        "history (the reference's eval loop, "
                        "evaluate_diffusion.py:144-212); autoregressive: "
                        "free rollout from --num_prompt_frames")
    p.add_argument("--max_examples", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute_fvd", action="store_true",
                   help="FVD over accumulated decoded clips (needs a pixel decoder)")
    p.add_argument("--compute_fid", action="store_true")
    p.add_argument("--vae_checkpoint", type=str, default=None,
                   help="diffusers AutoencoderKLTemporalDecoder torch "
                        "state_dict path: enables pixel-space FID/FVD "
                        "(reference: datasets/utils.py:17-24)")
    p.add_argument("--fvd_backend", type=str, default="styleganv",
                   choices=["styleganv", "videogpt"],
                   help="I3D variant for pixel FVD (paper used styleganv)")
    p.add_argument("--i3d_weights", type=str, default=None,
                   help="torch I3D state_dict for the chosen FVD backend")
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--sp", type=int, default=1)
    p.add_argument("--use_wandb", action="store_true")
    return p.parse_args(argv)


def _decode_clips(vae_ckpt: str, latents: np.ndarray,
                  clamp: float = 25.0) -> np.ndarray:
    """(B, T, h, w, C) x SVD_SCALE latents -> (B, T, H, W, 3) uint8 via the
    SVD temporal VAE (reference: evaluate_diffusion.py:194-212). The ±25
    clamp applies to the RAW (unscaled) latents, as the reference does
    (visualize.py:157)."""
    from hma_tpu.data.datasets import SVD_SCALE
    from hma_tpu.rollout.decode import load_svd_decoder

    decode = load_svd_decoder(vae_ckpt)
    out = []
    for i in range(latents.shape[0]):  # per-clip to bound device memory
        z = jnp.asarray(np.clip(latents[i:i + 1] / SVD_SCALE, -clamp, clamp),
                        jnp.float32)
        out.append(np.asarray(decode(z)))
    img = np.concatenate(out)  # (B, T, H, W, 3) in [-1, 1]
    return np.clip((img + 1) * 127.5, 0, 255).astype(np.uint8)


def load_mar_model(checkpoint_dir: str):
    ckpt = checkpoint_dir
    if not (Path(ckpt) / "state").exists() and not (Path(ckpt) / "config.json").exists():
        newest = latest_checkpoint(checkpoint_dir)
        if newest:
            ckpt = newest
    config = load_config_json(ckpt)
    assert isinstance(config, DiffusionGenieConfig), "checkpoint is not a continuous model"
    model = STMAR(config)
    state = load_checkpoint(ckpt, None)
    params = state["params"] if isinstance(state, dict) and "params" in state else state[0]
    return model, {"params": params["params"] if "params" in params else params}, config


def main(argv=None):
    args = parse_args(argv)
    dist.init_distributed()
    mesh = setup_eval_mesh(fsdp=args.fsdp, tp=args.tp, sp=args.sp,
                           batch_hint=args.batch_size)
    model, params, config = load_mar_model(args.checkpoint_dir)
    params = shard_params(params, mesh)
    dataset = RawFeatureDataset(args.val_data_dir, window_size=config.T,
                                use_actions=config.use_actions,
                                domain=args.domain)
    domain = args.domain or dataset.name
    domain_id = jnp.asarray(
        config.action_domains.index(domain)
        if config.action_domains and domain in config.action_domains else 0,
        jnp.int32)

    assert (args.eval_mode == "teacher_forced"
            or args.num_prompt_frames < config.T), (
        f"--num_prompt_frames {args.num_prompt_frames} leaves no frames to "
        f"generate autoregressively (model T={config.T})")

    @jax.jit
    def gen_jit(p, lat, act, dom, key):
        if args.eval_mode == "teacher_forced":
            pred = teacher_forced_latents(
                model, p, lat, act, dom, key,
                maskgit_steps=args.maskgit_steps,
                temperature=args.temperature, cfg=args.cfg)
            out = jnp.concatenate([lat[:, :1], pred], axis=1)
        else:
            out = generate_latents(
                model, p, lat, args.num_prompt_frames, act, dom, key,
                maskgit_steps=args.maskgit_steps, temperature=args.temperature,
                cfg=args.cfg)
        # reduced inside jit -> replicated global-batch mean; frames the
        # model actually predicted (teacher-forced: 1..T-1, AR: prompt..T-1)
        t0 = 1 if args.eval_mode == "teacher_forced" else args.num_prompt_frames
        err = (out[:, t0:] - lat[:, t0:]) ** 2
        # per-predicted-frame breakdown, reduced inside jit (the reference
        # logs per-step losses, evaluate_diffusion.py:262-306)
        mse_frames = jnp.mean(err, axis=(0, 2, 3, 4))
        return out, jnp.mean(err), mse_frames

    logger = MetricLogger(args.output_dir, project="video_val",
                          config=vars(args),
                          use_wandb=args.use_wandb and dist.is_primary())
    metrics = {k: AvgMetric() for k in ["latent_mse", "gen_time"]}
    frame_sum, frame_n = None, 0
    key = jax.random.PRNGKey(args.seed)
    h = w = config.h
    C = config.vae_embed_dim

    def load_global(lo, B):
        my_idx = dist.local_slice(np.arange(lo, lo + B))
        items = [dataset[int(i)] for i in my_idx]
        local = {"lat": np.stack([it["input_ids"] for it in items])
                 .reshape(len(items), config.T, h, w, C).astype(np.float32)}
        if "action_ids" in items[0]:
            local["actions"] = _pad_actions(
                np.stack([it["action_ids"] for it in items]).astype(np.float32),
                config.max_d_action)
        g = put_batch(local, mesh)
        return g["lat"], g.get("actions")

    total = round_batch(min(args.max_examples, len(dataset)), mesh)
    B_full = round_batch(args.batch_size, mesh)
    assert B_full > 0, (
        f"--batch_size {args.batch_size} smaller than the data-parallel "
        f"degree; raise it to a multiple of dp*fsdp*processes")
    assert total > 0, (
        f"min(--max_examples {args.max_examples}, len(dataset) "
        f"{len(dataset)}) rounds to 0 over the data-parallel degree — "
        f"nothing would be evaluated")
    n_done = 0
    with mesh:
        while n_done < total:
            B = min(B_full, total - n_done)
            key, k_b = jax.random.split(key)
            lat, actions = load_global(n_done, B)
            t0 = time.time()
            out, mse, mse_frames = gen_jit(params, lat, actions, domain_id, k_b)
            mse = float(mse)
            mse_frames = np.asarray(mse_frames, np.float64)
            frame_sum = (mse_frames * B if frame_sum is None
                         else frame_sum + mse_frames * B)
            frame_n += B
            n_pred = (config.T - 1 if args.eval_mode == "teacher_forced"
                      else config.T - args.num_prompt_frames)
            gen_time = (time.time() - t0) / max(n_pred, 1)
            metrics["latent_mse"].update(mse, B)
            metrics["gen_time"].update(gen_time, B)
            n_done += B

    result = {k: m.mean() for k, m in metrics.items() if m.count > 0}
    result["num_examples"] = n_done
    if frame_n:
        result["latent_mse_per_frame"] = (frame_sum / frame_n).tolist()
    # FID/FVD over decoded pixels (reference: evaluate_diffusion.py:368-375).
    # Without an SVD-VAE pixel decoder (weights not bundled), the latent
    # clips themselves are embedded — still a distribution distance, and
    # the same code path once decode weights are supplied.
    if args.compute_fvd or args.compute_fid:
        preds, gts = [], []
        with mesh:
            for i in range(0, total, B_full):
                B2 = min(B_full, total - i)
                lat, acts = load_global(i, B2)
                out, _, _ = gen_jit(params, lat, acts, domain_id,
                                 jax.random.PRNGKey(100 + i))
                preds.append(local_rows(out))
                gts.append(local_rows(lat))
        pred = np.concatenate(preds) if preds else np.zeros((0, config.T, h, w, C))
        gt = np.concatenate(gts) if gts else np.zeros((0, config.T, h, w, C))
        if jax.process_count() > 1:
            # small eval sets: gather every process's shard so the
            # FID/FVD statistics stay global
            from jax.experimental import multihost_utils

            pred = np.concatenate(multihost_utils.process_allgather(pred))
            gt = np.concatenate(multihost_utils.process_allgather(gt))
        if args.vae_checkpoint:
            # decode latents to pixels; FID/FVD on real frames
            # (reference: evaluate_diffusion.py:368-375)
            pred_px = _decode_clips(args.vae_checkpoint, pred)
            gt_px = _decode_clips(args.vae_checkpoint, gt)
            if args.compute_fid:
                from hma_tpu.metrics.fid import calculate_fid

                result["fid"] = calculate_fid(
                    pred_px.reshape(-1, *pred_px.shape[2:]),
                    gt_px.reshape(-1, *gt_px.shape[2:]))
            if args.compute_fvd and config.T >= 10:
                from hma_tpu.metrics.fvd import calculate_fvd, load_i3d_torch_weights

                i3d_params = None
                if args.i3d_weights:
                    import torch

                    i3d_params = load_i3d_torch_weights(
                        torch.load(args.i3d_weights, map_location="cpu"))
                result["fvd"] = calculate_fvd(pred_px, gt_px,
                                              backend=args.fvd_backend,
                                              i3d_params=i3d_params)
        flat_embed = lambda v: v.reshape(len(v), -1).astype(np.float32)
        if args.compute_fid:
            from hma_tpu.metrics.fid import fid_from_features

            result["fid_latent"] = fid_from_features(
                flat_embed(pred.reshape(-1, *pred.shape[2:])),
                flat_embed(gt.reshape(-1, *gt.shape[2:])))
        if args.compute_fvd and config.T >= 10:
            from hma_tpu.metrics.fvd import calculate_fvd

            result["fvd_latent"] = calculate_fvd(pred, gt, embed_fn=flat_embed)
    if dist.is_primary():
        logger.log({f"val/{domain}_{k}": v for k, v in result.items()})
    logger.close()
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
