"""Visualization CLI: decode generated token streams to GIFs and comics.

Rebuild of hma/visualize.py: reads a `video.bin` + `metadata.json`
produced by hma_tpu.generate (layout [prompt | pred | gt] per example),
decodes via the MagVit2 tokenizer — or, for latent streams written by
`generate --use_feature` (metadata carries `latent_channels`), via the
SVD temporal VAE, mirroring the reference's dual-codec
decode_latents_wrapper (reference: visualize.py:124-169) — and writes an
animated GIF plus a comic-strip PNG per example with Prompt / Generated /
Ground-truth captions (reference: visualize.py:89-110, 172-196, 271-293).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np
from PIL import Image, ImageDraw


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Visualize generated token videos")
    p.add_argument("--token_dir", type=str, required=True,
                   help="directory with video.bin + metadata.json from generate.py")
    p.add_argument("--output_dir", type=str, default=None)
    p.add_argument("--tokenizer_ckpt", type=str, default="data/magvit2.ckpt")
    p.add_argument("--fps", type=int, default=2)
    p.add_argument("--max_examples", type=int, default=8)
    p.add_argument("--offset", type=int, default=0,
                   help="first example index to render (reference: "
                        "visualize.py:51)")
    p.add_argument("--disable_comic", action="store_true",
                   help="skip the comic-strip PNGs (reference: :67)")
    p.add_argument("--stride", type=int, default=1)
    return p.parse_args(argv)


def caption_image(img: Image.Image, text: str) -> Image.Image:
    """Banner caption above the frame (reference: visualize.py:172-196)."""
    w, h = img.size
    banner = Image.new("RGB", (w, 16), (0, 0, 0))
    d = ImageDraw.Draw(banner)
    d.text((2, 2), text, fill=(255, 255, 255))
    out = Image.new("RGB", (w, h + 16))
    out.paste(banner, (0, 0))
    out.paste(img, (0, 16))
    return out


def export_to_gif(frames: list[Image.Image], path: str, fps: int = 2) -> None:
    frames[0].save(path, save_all=True, append_images=frames[1:],
                   duration=int(1000 / fps), loop=0)


def comic_strip(rows: list[list[Image.Image]], labels: list[str]) -> Image.Image:
    """Rows of frames side by side, one captioned row per sequence."""
    w, h = rows[0][0].size
    ncol = max(len(r) for r in rows)
    out = Image.new("RGB", (ncol * w, len(rows) * (h + 16)), (20, 20, 20))
    for ri, (row, label) in enumerate(zip(rows, labels)):
        for ci, img in enumerate(row):
            cap = caption_image(img, label if ci == 0 else "")
            out.paste(cap, (ci * w, ri * (h + 16)))
    return out


def make_latent_frame_decoder(vae_checkpoint: str):
    """(N, h, w, C) raw SVD-VAE latents -> (N, H, W, 3) uint8 frames
    (reference decode path: visualize.py:152-169; clamp ±25 as in :157)."""
    import jax.numpy as jnp

    from hma_tpu.rollout.decode import load_svd_decoder

    dec = load_svd_decoder(vae_checkpoint)

    def decode(lat_nhwc: np.ndarray) -> np.ndarray:
        z = jnp.asarray(np.clip(lat_nhwc, -25.0, 25.0),
                        jnp.float32)[None]  # (1, N, h, w, C) as a clip
        img = np.asarray(dec(z))[0]  # (N, H, W, 3) in [-1, 1]
        return np.clip((img + 1) * 127.5, 0, 255).astype(np.uint8)

    return decode


def main(argv=None):
    args = parse_args(argv)
    token_dir = Path(args.token_dir)
    out_dir = Path(args.output_dir or token_dir / "vis")
    out_dir.mkdir(parents=True, exist_ok=True)

    meta = json.loads((token_dir / "metadata.json").read_text())
    h, w = meta["h"], meta["w"]
    if "latent_channels" in meta:
        # latent stream from `generate --use_feature`: raw float16
        # (N, C, h, w); --tokenizer_ckpt is the SVD-VAE torch state dict
        C = meta["latent_channels"]
        video = np.fromfile(token_dir / "video.bin", dtype=np.float16) \
            .reshape(-1, C, h, w).transpose(0, 2, 3, 1)
        decode = make_latent_frame_decoder(args.tokenizer_ckpt)
    else:
        video = np.fromfile(token_dir / "video.bin",
                            dtype=np.dtype(meta.get("token_dtype", "uint32"))
                            ).reshape(-1, h, w)

        from hma_tpu.rollout.decode import make_token_decoder
        from hma_tpu.tokenizer.convert import load_magvit2

        decode = make_token_decoder(*load_magvit2(args.tokenizer_ckpt))

    n_prompt = meta["num_prompt_frames"]
    window = meta["window_size"]
    gen = window - n_prompt
    per_ex = n_prompt + 2 * gen  # prompt | pred | gt
    n_ex = min(len(video) // per_ex, args.offset + args.max_examples)

    for i in range(args.offset, n_ex):
        chunk = video[i * per_ex:(i + 1) * per_ex]
        px = decode(chunk)
        imgs = [Image.fromarray(f) for f in px]
        prompt = imgs[:n_prompt]
        pred = imgs[n_prompt:n_prompt + gen]
        gt = imgs[n_prompt + gen:]
        export_to_gif([caption_image(f, "Prompt") for f in prompt]
                      + [caption_image(f, "Generated") for f in pred],
                      str(out_dir / f"example_{i}.gif"), args.fps)
        if not args.disable_comic:
            comic = comic_strip([prompt + pred, prompt + gt],
                                ["Prompt|Generated", "Prompt|Ground-truth"])
            comic.save(out_dir / f"example_{i}_comic.png")
    print(f"wrote {max(n_ex - args.offset, 0)} examples to {out_dir}")


if __name__ == "__main__":
    main()
