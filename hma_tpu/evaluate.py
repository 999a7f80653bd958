"""Discrete-model evaluation CLI: `python -m hma_tpu.evaluate ...`

Rebuild of the reference evaluator (hma/evaluate.py): teacher-forced
per-frame MaskGIT prediction over the val set, reporting CE
loss/perplexity/masked accuracy, per-frame generation/decode wall time,
and — when a MagVit2 tokenizer checkpoint is supplied — pixel metrics
(PSNR/SSIM) plus the ΔPSNR controllability probe (ground-truth-action
PSNR minus the mean over `--num_action_trials` random-action rollouts,
reference: evaluate.py:352-376).

Deliberately not replicated: the reference deletes old checkpoints from
inside the evaluator (evaluate.py:130-137).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from hma_tpu.data.datasets import RawTokenDataset
from hma_tpu.generate import load_model
from hma_tpu.metrics.image import batch_psnr, batch_ssim
from hma_tpu.metrics.token import AvgMetric, teacher_forced_metrics
from hma_tpu.rollout.maskgit import teacher_forced_logits
from hma_tpu.train.trainer import _pad_actions
from hma_tpu.utils.logging import MetricLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate a discrete HMA model")
    p.add_argument("--checkpoint_dir", type=str, required=True)
    p.add_argument("--val_data_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="eval_out")
    p.add_argument("--domain", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--maskgit_steps", type=int, default=2)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--max_examples", type=int, default=200)
    p.add_argument("--tokenizer_ckpt", type=str, default=None,
                   help="magvit2.ckpt for pixel metrics; token metrics only if omitted")
    p.add_argument("--num_action_trials", type=int, default=5)
    p.add_argument("--perturbation_scale", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    model, params, config = load_model(args.checkpoint_dir)
    dataset = RawTokenDataset(args.val_data_dir, window_size=config.T,
                              use_actions=config.use_actions,
                              name=args.domain or "")
    domain = args.domain or dataset.name
    domain_id = jnp.asarray(
        config.action_domains.index(domain)
        if config.action_domains and domain in config.action_domains else 0,
        jnp.int32)

    decode = None
    if args.tokenizer_ckpt:
        from hma_tpu.rollout.decode import make_token_decoder
        from hma_tpu.tokenizer.convert import load_magvit2_checkpoint

        decode = make_token_decoder(load_magvit2_checkpoint(args.tokenizer_ckpt))

    logger = MetricLogger(args.output_dir, project="video_val",
                          config=vars(args), use_wandb=False)

    tf_jit = jax.jit(lambda p, tok, act, dom, key: teacher_forced_logits(
        model, p, tok, act, dom, key, maskgit_steps=args.maskgit_steps,
        temperature=args.temperature))

    metrics = {k: AvgMetric() for k in
               ["loss", "perplexity", "acc", "gen_time", "dec_time",
                "psnr", "ssim", "delta_psnr"]}
    key = jax.random.PRNGKey(args.seed)
    n_done = 0
    while n_done < min(args.max_examples, len(dataset)):
        B = min(args.batch_size, min(args.max_examples, len(dataset)) - n_done)
        items = [dataset[n_done + i] for i in range(B)]
        tokens = jnp.asarray(np.stack([it["input_ids"] for it in items])
                             .reshape(B, config.T, -1).astype(np.int32))
        actions = None
        if "action_ids" in items[0]:
            actions = jnp.asarray(_pad_actions(
                np.stack([it["action_ids"] for it in items]).astype(np.float32),
                config.max_d_action))

        key, k_b = jax.random.split(key)
        t0 = time.time()
        samples, logits = tf_jit(params, tokens, actions, domain_id, k_b)
        samples = np.asarray(samples)
        gen_time = (time.time() - t0) / (config.T - 1)
        tf = teacher_forced_metrics(logits, tokens[:, 1:], config.factored_vocab_size)
        for k in ("loss", "perplexity", "acc"):
            metrics[k].update(float(tf[k]), B)
        metrics["gen_time"].update(gen_time, B)

        if decode is not None:
            gt_frames = np.stack([np.asarray(tokens[:, 1:]).reshape(-1, config.h, config.w)])[0]
            t0 = time.time()
            pred_px = decode(samples.reshape(-1, config.h, config.w))
            dec_time = (time.time() - t0) / max(len(samples), 1)
            gt_px = decode(gt_frames)
            metrics["dec_time"].update(dec_time, B)
            metrics["psnr"].update(float(np.mean(batch_psnr(pred_px, gt_px))), B)
            metrics["ssim"].update(float(np.mean(batch_ssim(pred_px, gt_px))), B)

            if actions is not None and args.num_action_trials > 0:
                gt_psnr = np.mean(batch_psnr(pred_px, gt_px))
                rand_psnrs = []
                for trial in range(args.num_action_trials):
                    key, k_t, k_a = jax.random.split(key, 3)
                    rand_actions = actions + args.perturbation_scale * \
                        jax.random.normal(k_a, actions.shape)
                    s_r, _ = tf_jit(params, tokens, rand_actions, domain_id, k_t)
                    px_r = decode(np.asarray(s_r).reshape(-1, config.h, config.w))
                    rand_psnrs.append(np.mean(batch_psnr(px_r, gt_px)))
                metrics["delta_psnr"].update(float(gt_psnr - np.mean(rand_psnrs)), B)

        n_done += B

    out = {k: m.mean() for k, m in metrics.items() if m.count > 0}
    out["num_examples"] = n_done
    logger.log({f"val/{domain}_{k}": v for k, v in out.items()})
    logger.close()
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
