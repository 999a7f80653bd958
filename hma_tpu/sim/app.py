"""Gradio arrow-key world-model demo (reference: sim/app.py).

Loads a trained STMaskGIT checkpoint + MagVit2 tokenizer, builds a
GenieSimulator, and maps direction buttons to 2-D delta actions
(reference: sim/app.py:50-63). Gradio is optional in this image; the
simulator itself is exercised by sim/main.py and tests without it.
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


def build_simulator(checkpoint_dir: str, tokenizer_ckpt: str,
                    domain: str = "language_table", prompt_horizon: int = 3):
    from hma_tpu.generate import load_model
    from hma_tpu.rollout.decode import make_token_decoder
    from hma_tpu.sim.simulator import GenieSimulator
    from hma_tpu.tokenizer.convert import load_magvit2_checkpoint

    model, params, config = load_model(checkpoint_dir)
    decode = make_token_decoder(load_magvit2_checkpoint(tokenizer_ckpt))
    domain_id = (config.action_domains.index(domain)
                 if config.action_domains and domain in config.action_domains else 0)
    return GenieSimulator(model, params, domain_id=domain_id,
                          prompt_horizon=prompt_horizon,
                          decode_tokens=decode)


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
    p.add_argument("--share", action="store_true")
    args = p.parse_args(argv)
    sim = build_simulator(args.checkpoint_dir, args.tokenizer_ckpt,
                          args.domain, args.prompt_horizon)
    launch_app(sim, args.share)


if __name__ == "__main__":
    main()
