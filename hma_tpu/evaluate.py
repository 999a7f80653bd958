"""Discrete-model evaluation CLI: `python -m hma_tpu.evaluate ...`

Rebuild of the reference evaluator (hma/evaluate.py): teacher-forced
per-frame MaskGIT prediction over the val set, reporting CE
loss/perplexity/masked accuracy, per-frame generation/decode wall time,
and — when a MagVit2 tokenizer checkpoint is supplied — pixel metrics
(PSNR/SSIM) plus the ΔPSNR controllability probe (ground-truth-action
PSNR minus the mean over `--num_action_trials` random-action rollouts,
reference: evaluate.py:352-376).

Distributed: runs data-parallel over the full device mesh, multi-process
capable (the reference evaluates under multi-GPU Accelerate with
cross-rank gathers, evaluate.py:227,387-401). Token metrics are reduced
inside jit over the global batch; host-side pixel metrics aggregate via
process_allgather. See parallel/sharded_eval.py.

Deliberately not replicated: the reference deletes old checkpoints from
inside the evaluator (evaluate.py:130-137).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from hma_tpu.data.datasets import RawTokenDataset
from hma_tpu.generate import load_model
from hma_tpu.metrics.image import batch_psnr, batch_ssim
from hma_tpu.metrics.token import AvgMetric, teacher_forced_metrics
from hma_tpu.parallel import distributed as dist
from hma_tpu.parallel.sharded_eval import (
    local_rows,
    put_batch,
    round_batch,
    setup_eval_mesh,
    shard_params,
)
from hma_tpu.rollout.maskgit import autoregressive_logits, teacher_forced_logits
from hma_tpu.train.trainer import _pad_actions
from hma_tpu.utils.logging import MetricLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate a discrete HMA model")
    p.add_argument("--checkpoint_dir", type=str, required=True)
    p.add_argument("--val_data_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="eval_out")
    p.add_argument("--domain", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--maskgit_steps", type=int, default=None,
                   help="default: 2 (discrete) / the model card's value "
                        "(--use_feature)")
    p.add_argument("--temperature", type=float, default=None,
                   help="default: 0.0 greedy (discrete) / 1.0 (--use_feature)")
    p.add_argument("--max_examples", type=int, default=200)
    p.add_argument("--autoregressive_time", action="store_true",
                   help="past num_prompt_frames, condition each frame on "
                        "the model's own samples instead of ground truth "
                        "(reference: evaluate.py:79-82,181-186)")
    p.add_argument("--num_prompt_frames", type=int, default=None,
                   help="prompt length for --autoregressive_time "
                        "(default: the model card's num_prompt_frames)")
    p.add_argument("--tokenizer_ckpt", type=str, default=None,
                   help="magvit2.ckpt for pixel metrics; token metrics only if omitted")
    p.add_argument("--raw_image_data", action="store_true",
                   help="val_data_dir holds raw uint8 frames; tokenize "
                        "them on the fly with --tokenizer_ckpt and use the "
                        "raw frames as the pixel ground truth (the "
                        "reference's default when --use_tokenized_images "
                        "is off, evaluate.py:287-305,333)")
    p.add_argument("--use_tokenized_images", action="store_true",
                   help="accepted for reference-script compatibility: "
                        "pre-tokenized val dirs are already the default here")
    p.add_argument("--save_outputs_dir", type=str, default=None,
                   help="dump predicted + ground-truth token windows as "
                        ".npy (reference: evaluate.py:70-77)")
    p.add_argument("--num_action_trials", type=int, default=5)
    p.add_argument("--perturbation_scale", type=float, default=0.1,
                   help="sigma of the dPSNR action noise (reference "
                        "default 0.1, evaluate.py:90-93)")
    p.add_argument("--perturbation_type", type=str, default="gaussian",
                   choices=["gaussian"],
                   help="dPSNR action perturbation (the reference "
                        "implements gaussian only, evaluate.py:87-93)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--sp", type=int, default=1)
    p.add_argument("--use_wandb", action="store_true")
    p.add_argument("--use_feature", action="store_true",
                   help="continuous family: delegate to evaluate_feature "
                        "(the reference's evaluate.py exposes the same "
                        "switch, evaluate.py:98-99)")
    return p.parse_known_args(argv)


def main(argv=None):
    args, rest = parse_args(argv)
    if args.use_feature:
        from hma_tpu.evaluate_feature import main as feature_main

        # every flag this parser knows must forward explicitly — it is
        # consumed here and never reaches `rest`
        fwd = [
            "--checkpoint_dir", args.checkpoint_dir,
            "--val_data_dir", args.val_data_dir,
            "--output_dir", args.output_dir,
            "--batch_size", str(args.batch_size),
            "--max_examples", str(args.max_examples),
            "--seed", str(args.seed),
            "--fsdp", str(args.fsdp), "--tp", str(args.tp),
            "--sp", str(args.sp),
            *(["--domain", args.domain] if args.domain else []),
            *(["--maskgit_steps", str(args.maskgit_steps)]
              if args.maskgit_steps is not None else []),
            *(["--temperature", str(args.temperature)]
              if args.temperature is not None else []),
            *(["--num_prompt_frames", str(args.num_prompt_frames)]
              if args.num_prompt_frames is not None else []),
            *(["--eval_mode", "autoregressive"]
              if args.autoregressive_time else []),
            *(["--use_wandb"] if args.use_wandb else []),
            *rest]
        return feature_main(fwd)
    assert not rest, f"unknown arguments: {rest}"
    dist.init_distributed()
    mesh = setup_eval_mesh(fsdp=args.fsdp, tp=args.tp, sp=args.sp,
                           batch_hint=args.batch_size)
    model, params, config = load_model(args.checkpoint_dir)
    params = shard_params(params, mesh)
    if args.raw_image_data:
        assert args.tokenizer_ckpt, "--raw_image_data requires --tokenizer_ckpt"
        from hma_tpu.data.datasets import RawImageDataset

        dataset = RawImageDataset(args.val_data_dir, window_size=config.T,
                                  use_actions=config.use_actions,
                                  domain=args.domain)
    else:
        dataset = RawTokenDataset(args.val_data_dir, window_size=config.T,
                                  use_actions=config.use_actions,
                                  name=args.domain or "")
    domain = args.domain or dataset.name
    domain_id = jnp.asarray(
        config.action_domains.index(domain)
        if config.action_domains and domain in config.action_domains else 0,
        jnp.int32)

    decode = encode = None
    if args.tokenizer_ckpt:
        from hma_tpu.rollout.decode import make_token_decoder
        from hma_tpu.tokenizer.convert import load_magvit2

        tok_params, tok_cfg = load_magvit2(args.tokenizer_ckpt)
        decode = make_token_decoder(tok_params, tok_cfg)
        if args.raw_image_data:
            from hma_tpu.data.encode_openx import make_magvit_encoder

            encode = make_magvit_encoder(tok_params, tok_cfg)

    logger = MetricLogger(args.output_dir, project="video_val",
                          config=vars(args),
                          use_wandb=args.use_wandb and dist.is_primary())

    steps = args.maskgit_steps if args.maskgit_steps is not None else 2
    temperature = args.temperature if args.temperature is not None else 0.0

    def _tf(p, tok, act, dom, key):
        if args.autoregressive_time:
            n_prompt = (args.num_prompt_frames
                        if args.num_prompt_frames is not None
                        else config.num_prompt_frames)
            samples, logits = autoregressive_logits(
                model, p, tok, n_prompt, act, dom, key,
                maskgit_steps=steps, temperature=temperature)
        else:
            samples, logits = teacher_forced_logits(
                model, p, tok, act, dom, key, maskgit_steps=steps,
                temperature=temperature)
        # reduced inside jit: global-batch means, replicated on every host
        tf = teacher_forced_metrics(logits, tok[:, 1:], config.factored_vocab_size)
        return samples, tf

    tf_jit = jax.jit(_tf)

    @jax.jit
    def tf_jit_rand(p, tok, act, dom, key, k_a):
        # Perturb actions INSIDE jit: eager ops on the globally-sharded
        # action array are not addressable in multi-process runs.
        act = act + args.perturbation_scale * jax.random.normal(
            k_a, act.shape, act.dtype)
        return _tf(p, tok, act, dom, key)

    with mesh:
        token_metrics, host_metrics = _eval_loop(
            args, mesh, model, params, config, dataset, domain_id,
            tf_jit, decode, tf_jit_rand=tf_jit_rand, encode=encode)

    out = {k: m.mean() for k, m in token_metrics.items() if m.count > 0}
    # host-side (pixel) metrics are per-process means over equal shards
    out.update(dist.aggregate_host_metrics(
        {k: m.mean() for k, m in host_metrics.items() if m.count > 0}))
    out["num_examples"] = token_metrics["loss"].count
    # key prefix distinguishes eval modes (reference: evaluate.py:403)
    prefix = "autoregressive" if args.autoregressive_time else "teacher_force"
    if dist.is_primary():
        logger.log({f"val/{domain}_{prefix}_{k}": v for k, v in out.items()})
    logger.close()
    print(json.dumps(out))
    return out


def _eval_loop(args, mesh, model, params, config, dataset, domain_id,
               tf_jit, decode, tf_jit_rand=None, encode=None):
    token_metrics = {k: AvgMetric() for k in
                     ["loss", "perplexity", "acc", "gen_time"]}
    host_metrics = {k: AvgMetric() for k in
                    ["dec_time", "psnr", "ssim", "delta_psnr",
                     "psnr_copy_prev", "psnr_vs_copy"]}
    key = jax.random.PRNGKey(args.seed)

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
    while n_done < total:
        B = min(B_full, total - n_done)
        # this process's contiguous slice of the global batch
        my_idx = dist.local_slice(np.arange(n_done, n_done + B))
        items = [dataset[int(i)] for i in my_idx]
        raw_frames = None
        if "images" in items[0]:
            # raw-image val dir: tokenize on the fly; raw frames become
            # the pixel ground truth (reference: evaluate.py:287-305,333)
            raw_frames = np.stack([it["images"] for it in items])  # (b,T,h,w,3)
            b = len(items)
            tok = encode(np.clip(raw_frames, 0, 255)
                         .reshape(-1, *raw_frames.shape[2:]).astype(np.uint8))
            local = {"tokens": tok.reshape(b, config.T, -1).astype(np.int32)}
        else:
            local = {"tokens": np.stack([it["input_ids"] for it in items])
                     .reshape(len(items), config.T, -1).astype(np.int32)}
        if "action_ids" in items[0]:
            local["actions"] = _pad_actions(
                np.stack([it["action_ids"] for it in items]).astype(np.float32),
                config.max_d_action)
        gbatch = put_batch(local, mesh)
        tokens = gbatch["tokens"]
        actions = gbatch.get("actions")

        key, k_b = jax.random.split(key)
        t0 = time.time()
        samples, tf = tf_jit(params, tokens, actions, domain_id, k_b)
        tf = {k: float(v) for k, v in tf.items()}
        gen_time = (time.time() - t0) / (config.T - 1)
        for k in ("loss", "perplexity", "acc"):
            token_metrics[k].update(tf[k], B)
        token_metrics["gen_time"].update(gen_time, B)

        if args.save_outputs_dir:
            # per-process shard dump (reference: evaluate.py:70-77)
            from pathlib import Path

            d = Path(args.save_outputs_dir)
            d.mkdir(parents=True, exist_ok=True)
            r = jax.process_index()
            np.save(d / f"pred_{n_done}_r{r}.npy", local_rows(samples))
            np.save(d / f"gt_{n_done}_r{r}.npy", local_rows(tokens))

        if decode is not None:
            # decode on host, each process over its own shard
            samples_l = local_rows(samples)
            nloc = len(samples_l)
            t0 = time.time()
            pred_px = decode(samples_l.reshape(-1, config.h, config.w))
            dec_time = (time.time() - t0) / max(nloc, 1)
            if raw_frames is not None:
                gt_px = np.clip(raw_frames[:, 1:], 0, 255).astype(np.uint8) \
                    .reshape(-1, *raw_frames.shape[2:])
                assert gt_px.shape[1:3] == pred_px.shape[1:3], (
                    "raw-image resolution must match the tokenizer's decode "
                    f"resolution: {gt_px.shape} vs {pred_px.shape}")
            else:
                gt_l = local_rows(tokens)[:, 1:]
                gt_px = decode(gt_l.reshape(-1, config.h, config.w))
            host_metrics["dec_time"].update(dec_time, nloc)
            gt_psnr = float(np.mean(batch_psnr(pred_px, gt_px)))
            host_metrics["psnr"].update(gt_psnr, nloc)
            host_metrics["ssim"].update(
                float(np.mean(batch_ssim(pred_px, gt_px))), nloc)

            # no-dynamics baseline: predict frame t as frame t-1 (the
            # strongest trivial world model). A learned model must beat
            # this margin for the dynamics claim to mean anything.
            if raw_frames is not None:
                copy_px = np.clip(raw_frames[:, :-1], 0, 255).astype(
                    np.uint8).reshape(-1, *raw_frames.shape[2:])
            else:
                copy_px = decode(
                    local_rows(tokens)[:, :-1].reshape(-1, config.h, config.w))
            copy_psnr = float(np.mean(batch_psnr(copy_px, gt_px)))
            host_metrics["psnr_copy_prev"].update(copy_psnr, nloc)
            host_metrics["psnr_vs_copy"].update(gt_psnr - copy_psnr, nloc)

            if actions is not None and args.num_action_trials > 0:
                rand_psnrs = []
                for _ in range(args.num_action_trials):
                    key, k_t, k_a = jax.random.split(key, 3)
                    s_r, _ = tf_jit_rand(params, tokens, actions, domain_id,
                                         k_t, k_a)
                    px_r = decode(local_rows(s_r).reshape(-1, config.h, config.w))
                    rand_psnrs.append(np.mean(batch_psnr(px_r, gt_px)))
                host_metrics["delta_psnr"].update(
                    float(gt_psnr - np.mean(rand_psnrs)), nloc)

        n_done += B
    return token_metrics, host_metrics


if __name__ == "__main__":
    main()
