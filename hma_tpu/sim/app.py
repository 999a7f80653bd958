"""Gradio arrow-key world-model demo (reference: sim/app.py).

Loads a trained world model + its pixel codec, builds a GenieSimulator,
and maps direction buttons to 2-D delta actions (reference:
sim/app.py:50-63). Both backbones are supported: discrete STMaskGIT +
MagVit2 decode, and continuous STMAR + SVD-VAE decode — the reference's
shipped demo checkpoint is an STMAR langtable model (sim/app.py:10-34).
Gradio is optional in this image; the simulator itself is exercised by
sim/main.py and tests without it.
"""

from __future__ import annotations

import argparse

import numpy as np

# direction -> 2-D delta action (reference: sim/app.py:50-63)
DIRECTION_ACTIONS = {
    "up": np.asarray([-0.05, 0.0], np.float32),
    "down": np.asarray([0.05, 0.0], np.float32),
    "left": np.asarray([0.0, -0.05], np.float32),
    "right": np.asarray([0.0, 0.05], np.float32),
    "noop": np.asarray([0.0, 0.0], np.float32),
}


def _is_continuous(checkpoint_dir: str) -> bool:
    from pathlib import Path

    from hma_tpu.config import DiffusionGenieConfig
    from hma_tpu.utils.checkpoint import latest_checkpoint, load_config_json

    ckpt = checkpoint_dir
    if not (Path(ckpt) / "config.json").exists():
        newest = latest_checkpoint(checkpoint_dir)
        if newest:
            ckpt = newest
    return isinstance(load_config_json(ckpt), DiffusionGenieConfig)


def _make_latent_decoder(vae_checkpoint: str):
    """SVD temporal VAE pixel decode for the STMAR backbone
    (reference: sim/simulator.py:233-372 decodes through the SVD VAE)."""
    import jax.numpy as jnp

    from hma_tpu.data.datasets import SVD_SCALE
    from hma_tpu.rollout.decode import load_svd_decoder

    decode = load_svd_decoder(vae_checkpoint)

    def decode_latents(lat_nhwc: np.ndarray) -> np.ndarray:
        # GenieSimulator contract: (N, h, w, C) x SVD_SCALE -> (N, H, W, 3)
        # uint8. Clamp the RAW (unscaled) latents to +/-25, like the
        # reference (hma/visualize.py:157).
        z = jnp.asarray(np.clip(np.asarray(lat_nhwc) / SVD_SCALE,
                                -25.0, 25.0), jnp.float32)[None]
        img = np.asarray(decode(z))[0]  # (N, H, W, 3) in [-1, 1]
        return np.clip((img + 1) * 127.5, 0, 255).astype(np.uint8)

    return decode_latents


def build_simulator(checkpoint_dir: str, tokenizer_ckpt: str,
                    domain: str = "language_table", prompt_horizon: int = 3,
                    backbone: str = "auto"):
    """backbone: "auto" (detect from the checkpoint config), "stmaskgit",
    or "stmar". For stmar, tokenizer_ckpt is the diffusers SVD-VAE torch
    state_dict; for stmaskgit, the MagVit2 checkpoint."""
    from hma_tpu.sim.simulator import GenieSimulator

    if backbone == "auto":
        backbone = "stmar" if _is_continuous(checkpoint_dir) else "stmaskgit"

    if backbone == "stmar":
        from hma_tpu.evaluate_feature import load_mar_model

        model, params, config = load_mar_model(checkpoint_dir)
        decode_kw = {"decode_latents": (_make_latent_decoder(tokenizer_ckpt)
                                        if tokenizer_ckpt else None)}
    else:
        from hma_tpu.generate import load_model
        from hma_tpu.rollout.decode import make_token_decoder
        from hma_tpu.tokenizer.convert import load_magvit2

        model, params, config = load_model(checkpoint_dir)
        decode_kw = {"decode_tokens":
                     make_token_decoder(*load_magvit2(tokenizer_ckpt))}
    domain_id = (config.action_domains.index(domain)
                 if config.action_domains and domain in config.action_domains else 0)
    return GenieSimulator(model, params, domain_id=domain_id,
                          prompt_horizon=prompt_horizon, **decode_kw)


def launch_app(sim, share: bool = False):
    import gradio as gr

    def handle(direction):
        frame = sim.step(DIRECTION_ACTIONS[direction])
        return frame

    with gr.Blocks(title="HMA-TPU interactive world model") as demo:
        img = gr.Image(label="world")
        with gr.Row():
            for d in ["up", "down", "left", "right", "noop"]:
                gr.Button(d).click(lambda d=d: handle(d), outputs=img)
    demo.launch(share=share)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_dir", type=str, required=True)
    p.add_argument("--tokenizer_ckpt", type=str, default="data/magvit2.ckpt")
    p.add_argument("--domain", type=str, default="language_table")
    p.add_argument("--prompt_horizon", type=int, default=3)
    p.add_argument("--backbone", type=str, default="auto",
                   choices=["auto", "stmaskgit", "stmar"])
    p.add_argument("--share", action="store_true")
    args = p.parse_args(argv)
    sim = build_simulator(args.checkpoint_dir, args.tokenizer_ckpt,
                          args.domain, args.prompt_horizon, args.backbone)
    launch_app(sim, args.share)


if __name__ == "__main__":
    main()
