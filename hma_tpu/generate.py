"""Rollout CLI: `python -m hma_tpu.generate ...`

Mirrors the reference (hma/generate.py): loads a checkpoint, rolls out
future frames with MaskGIT (teacher-forced or fully autoregressive), and
writes the [prompt | prediction | ground truth] stream to
`video.bin` + `metadata.json` for visualize.py. Generation runs the
KV-cached jitted engine instead of (T-1)*steps full forwards.

`--use_feature` switches to the continuous family (reference:
hma/generate.py:116-126): an STMAR checkpoint rolls out SVD-VAE latents
and the output video.bin is float16 (N, C, h, w) raw latents — the same
on-disk contract RawFeatureDataset reads — so visualize.py can decode it
with the SVD temporal VAE.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from hma_tpu.data.datasets import RawTokenDataset
from hma_tpu.models.st_mask_git import STMaskGIT
from hma_tpu.rollout.maskgit import make_generator, teacher_forced_logits
from hma_tpu.train.trainer import _pad_actions
from hma_tpu.utils.checkpoint import latest_checkpoint, load_checkpoint, load_config_json


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Autoregressive MaskGIT rollout")
    p.add_argument("--checkpoint_dir", type=str, required=True)
    p.add_argument("--val_data_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--domain", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--maskgit_steps", type=int, default=None,
                   help="default: 2 (discrete) / the model card's "
                        "maskgit_steps (--use_feature)")
    p.add_argument("--temperature", type=float, default=None,
                   help="default: 0.0 greedy (discrete) / 1.0 (--use_feature)")
    p.add_argument("--num_prompt_frames", type=int, default=8)
    p.add_argument("--window_size", type=int, default=None,
                   help="frames per rollout window (default: the model "
                        "card's T; must be <= T)")
    p.add_argument("--example_ind", type=int, default=0)
    p.add_argument("--max_examples", "--max_example", type=int, default=16)
    p.add_argument("--teacher_force_time", action="store_true")
    p.add_argument("--use_feature", action="store_true",
                   help="continuous family: STMAR checkpoint over VAE latents")
    p.add_argument("--cfg", type=float, default=1.0,
                   help="--use_feature classifier-free guidance scale. "
                        "Works here (doubled [cond|uncond] batch; uncond = "
                        "the trained action-dropout branch) unlike the "
                        "reference, whose cfg path is dead code "
                        "(st_mar.py:417-439); meaningful when the model "
                        "trained with drop_action_ratio > 0")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def load_model(checkpoint_dir: str):
    """Load (model, params) from a trainer checkpoint directory (or its
    newest step subdir, reference: generate.py:97-104)."""
    ckpt = checkpoint_dir
    if not (Path(ckpt) / "state").exists() and not (Path(ckpt) / "config.json").exists():
        newest = latest_checkpoint(checkpoint_dir)
        if newest:
            ckpt = newest
    config = load_config_json(ckpt)
    model = STMaskGIT(config)
    state = load_checkpoint(ckpt, None)
    params = state["params"] if isinstance(state, dict) and "params" in state else state[0]
    return model, {"params": params["params"] if "params" in params else params}, config


def main(argv=None):
    args = parse_args(argv)
    if args.use_feature:
        return main_feature(args)
    model, params, config = load_model(args.checkpoint_dir)

    T = args.window_size or config.T
    assert T <= config.T, f"--window_size {T} exceeds the model's T={config.T}"
    assert args.num_prompt_frames < T, (
        f"--num_prompt_frames {args.num_prompt_frames} leaves no frames to "
        f"generate in a {T}-frame window")
    dataset = RawTokenDataset(args.val_data_dir, window_size=T,
                              use_actions=config.use_actions,
                              name=args.domain or "")
    domain = args.domain or dataset.name
    domain_id = jnp.asarray(
        config.action_domains.index(domain)
        if config.action_domains and domain in config.action_domains else 0,
        jnp.int32)

    B = min(args.batch_size, args.max_examples)
    items = [dataset[args.example_ind + i] for i in range(B)]
    tokens = np.stack([it["input_ids"] for it in items]).reshape(
        B, T, -1).astype(np.int32)
    actions = None
    if "action_ids" in items[0]:
        actions = jnp.asarray(_pad_actions(
            np.stack([it["action_ids"] for it in items]).astype(np.float32),
            config.max_d_action))

    steps = args.maskgit_steps if args.maskgit_steps is not None else 2
    temperature = args.temperature if args.temperature is not None else 0.0
    key = jax.random.PRNGKey(args.seed)
    if args.teacher_force_time:
        samples, _ = teacher_forced_logits(
            model, params, jnp.asarray(tokens), actions, domain_id, key,
            maskgit_steps=steps, temperature=temperature)
        pred = np.concatenate([tokens[:, :1], np.asarray(samples)], axis=1)
    else:
        run = make_generator(model, num_prompt_frames=args.num_prompt_frames,
                             maskgit_steps=steps,
                             temperature=temperature)
        pred = np.asarray(run(params, jnp.asarray(tokens), actions, domain_id, key))

    # output layout [prompt | prediction | ground truth] per example
    h = w = config.h
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    rows = []
    for i in range(B):
        prompt = tokens[i, :args.num_prompt_frames]
        rows.append(np.concatenate([prompt, pred[i, args.num_prompt_frames:],
                                    tokens[i, args.num_prompt_frames:]]))
    video = np.concatenate(rows).reshape(-1, h, w).astype(np.uint32)
    video.tofile(out / "video.bin")
    meta = {
        "num_images": int(video.shape[0]),
        "h": h, "w": w,
        "token_dtype": "uint32",
        "vocab_size": int(config.image_vocab_size),
        "name": domain,
        "num_prompt_frames": args.num_prompt_frames,
        "window_size": int(T),
        "generation_layout": "prompt,pred,gt",
    }
    with open(out / "metadata.json", "w") as f:
        json.dump(meta, f)
    print(f"wrote {video.shape[0]} frames to {out}")


def main_feature(args):
    """Continuous rollout (reference: hma/generate.py:116-126): STMAR over
    SVD-VAE latents, output = [prompt | pred | gt] raw float16 latents in
    the RawFeatureDataset on-disk layout ((N, C, h, w), unscaled).
    Honors --window_size and --teacher_force_time like the discrete path
    (the reference shares both branches across families, generate.py:124,
    157-170)."""
    from hma_tpu.data.datasets import SVD_SCALE, RawFeatureDataset
    from hma_tpu.evaluate_feature import load_mar_model
    from hma_tpu.rollout.mar import make_mar_generator, teacher_forced_latents

    model, params, config = load_mar_model(args.checkpoint_dir)
    T = args.window_size or config.T
    assert T <= config.T, f"--window_size {T} exceeds the model's T={config.T}"
    assert args.num_prompt_frames < T, (
        f"--num_prompt_frames {args.num_prompt_frames} leaves no frames to "
        f"generate in a {T}-frame window")
    dataset = RawFeatureDataset(args.val_data_dir, window_size=T,
                                use_actions=config.use_actions,
                                domain=args.domain)
    domain = args.domain or dataset.name
    domain_id = jnp.asarray(
        config.action_domains.index(domain)
        if config.action_domains and domain in config.action_domains else 0,
        jnp.int32)

    B = min(args.batch_size, args.max_examples)
    items = [dataset[args.example_ind + i] for i in range(B)]
    h, w, C = items[0]["h"], items[0]["w"], items[0]["c"]
    # items are (T*h*w, C) x SVD_SCALE; the MAR engine consumes (B, T, h, w, C)
    lat = np.stack([it["input_ids"] for it in items]).reshape(
        B, T, h, w, C).astype(np.float32)
    actions = None
    if "action_ids" in items[0]:
        actions = jnp.asarray(_pad_actions(
            np.stack([it["action_ids"] for it in items]).astype(np.float32),
            config.max_d_action))

    temperature = args.temperature if args.temperature is not None else 1.0
    key = jax.random.PRNGKey(args.seed)
    if args.teacher_force_time:
        frames = teacher_forced_latents(
            model, params, jnp.asarray(lat), actions, domain_id, key,
            maskgit_steps=args.maskgit_steps, temperature=temperature,
            cfg=args.cfg)
        pred = np.concatenate([lat[:, :1], np.asarray(frames)], axis=1)
    else:
        run = make_mar_generator(model,
                                 num_prompt_frames=args.num_prompt_frames,
                                 maskgit_steps=args.maskgit_steps,
                                 temperature=temperature, cfg=args.cfg)
        pred = np.asarray(run(params, jnp.asarray(lat), actions, domain_id,
                              key))

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    rows = []
    for i in range(B):
        rows.append(np.concatenate([lat[i, :args.num_prompt_frames],
                                    pred[i, args.num_prompt_frames:],
                                    lat[i, args.num_prompt_frames:]]))
    # (N, h, w, C) x SVD_SCALE -> raw (N, C, h, w) float16 on disk
    video = (np.concatenate(rows) / SVD_SCALE).transpose(0, 3, 1, 2) \
        .astype(np.float16)
    video.tofile(out / "video.bin")
    meta = {
        "num_images": int(video.shape[0]),
        "h": h, "w": w,
        "latent_channels": int(C),
        "token_dtype": "float16",
        "name": domain,
        "num_prompt_frames": args.num_prompt_frames,
        "window_size": int(T),
        "generation_layout": "prompt,pred,gt",
    }
    with open(out / "metadata.json", "w") as f:
        json.dump(meta, f)
    print(f"wrote {video.shape[0]} latent frames to {out}")


if __name__ == "__main__":
    main()
