"""MagVit2 tokenizer GAN training CLI: `python -m hma_tpu.train_tokenizer`.

Trains the VQ tokenizer on a raw-image dataset directory (the
`RawImageDataset` on-disk layout, uint8 (N, H, W, 3)). Rebuild of the
reference's Lightning training entry (external/magvit2/models/lfqgan.py
training_step) as a plain jitted loop with orbax checkpoints.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from hma_tpu.data.datasets import RawImageDataset
from hma_tpu.tokenizer.magvit2 import VQConfig
from hma_tpu.tokenizer.train_vq import init_vq_train_state, make_vq_train_step
from hma_tpu.utils.checkpoint import save_checkpoint
from hma_tpu.utils.logging import MetricLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train the MagVit2 VQ tokenizer")
    p.add_argument("--train_data_dir", type=str, required=True,
                   help="RawImageDataset directory (uint8 frames)")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--vq_config", type=str, default=None,
                   help="VQConfig json; defaults to the reference card")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--warmup_steps", type=int, default=1000)
    p.add_argument("--max_train_steps", type=int, default=100000)
    p.add_argument("--checkpointing_steps", type=int, default=2000)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--lpips_weights", type=str, default=None,
                   help="torch LPIPS(vgg) state dict for the perceptual loss")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    config = (VQConfig.from_pretrained(args.vq_config) if args.vq_config
              else VQConfig())

    lpips_fn = None
    if args.lpips_weights:
        import torch

        from hma_tpu.metrics.lpips import LPIPS, load_lpips_torch_weights

        sd = torch.load(args.lpips_weights, map_location="cpu")
        model = LPIPS(net="vgg")
        lp_params = load_lpips_torch_weights(model, {k: v.numpy() for k, v in sd.items()})
        _lp = LPIPS(net="vgg")
        lpips_fn = lambda a, b: _lp.apply(lp_params, a, b)

    dataset = RawImageDataset(args.train_data_dir, window_size=1,
                              compute_stride_from_freq_table=False,
                              filter_interrupts=False)
    # architecture sidecar so load_magvit2() can reconstruct the model
    # from the output dir alone (convert.load_magvit2_native)
    import os

    os.makedirs(args.output_dir, exist_ok=True)
    config.save_pretrained(os.path.join(args.output_dir, "vq_config.json"))
    vq, disc, tx_g, tx_d, state = init_vq_train_state(
        config, jax.random.PRNGKey(args.seed), image_size=args.image_size,
        lr=args.learning_rate, warmup_steps=args.warmup_steps)
    step_fn = jax.jit(make_vq_train_step(vq, disc, tx_g, tx_d, config,
                                         lpips_fn=lpips_fn))

    logger = MetricLogger(args.output_dir, project="tokenizer", config=vars(args))
    rng = np.random.default_rng(args.seed)
    t_last = time.time()
    for step_i in range(1, args.max_train_steps + 1):
        idx = rng.integers(0, len(dataset), args.batch_size)
        frames = np.stack([dataset[int(i)]["images"][0] for i in idx])
        images = jnp.asarray(frames, jnp.float32) / 127.5 - 1.0
        state, logs = step_fn(state, images)
        if step_i % args.log_every == 0:
            m = {k: float(v) for k, v in logs.items()}
            m["steps_per_sec"] = args.log_every / max(time.time() - t_last, 1e-9)
            t_last = time.time()
            logger.log({f"tok/{k}": v for k, v in m.items()}, step=step_i)
        if step_i % args.checkpointing_steps == 0:
            save_checkpoint(args.output_dir, f"step_{step_i}",
                            {"gen": state.gen_params, "ema": state.ema_params},
                            keep_last=3)
    save_checkpoint(args.output_dir, "final_checkpt",
                    {"gen": state.gen_params, "ema": state.ema_params})
    logger.close()


if __name__ == "__main__":
    main()
