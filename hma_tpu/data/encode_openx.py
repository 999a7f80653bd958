"""Shard-parallel offline tokenization of OpenX RLDS datasets.

Rebuild of the reference encode pipeline
(datasets/encode_openx_dataset.py): episodes stream from TFDS (host CPU),
frames are resized/center-cropped, batched, and encoded on TPU by the
jitted MagVit2 VQ encoder (discrete tokens) or an SVD-VAE (continuous
latents); shards write the standard on-disk layout
(video.bin / segment_ids.bin / actions/actions.bin / metadata.json).

Differences from the reference:
  - encoding is batched through one jitted function instead of
    frame-at-a-time model calls (encode_openx_dataset.py:301-332);
  - shard orchestration is `--shard_ind/--num_shards` exactly as before,
    but any number of shards can run against the single TPU host —
    parallelism no longer needs one GPU per process;
  - TFDS is optional in this image: any iterable of episode dicts
    {"steps": [{"image": ..., "action": ...}, ...]} can be passed to
    `encode_episodes`, and tests use synthetic generators.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
from typing import Callable, Iterable, Optional

import numpy as np

from hma_tpu.data.freq_table import (
    DATA_FREQ_TABLE,
    MAX_VAL_EXAMPLES,
    MIN_VAL_EXAMPLES,
    VAL_RATIO,
)
from hma_tpu.tokenizer.image_ops import normalize_image_np, resize_image

# Observation-key preference order when episodes carry multiple cameras
# (reference: select_image, encode_openx_dataset.py:111-127).
IMAGE_KEY_CANDIDATES = (
    "image", "rgb", "agentview_rgb", "rgb_static", "front_rgb",
    "agentview_image", "image_1", "wrist_image", "hand_image",
)


def select_image(observation: dict) -> np.ndarray:
    for key in IMAGE_KEY_CANDIDATES:
        if key in observation:
            return np.asarray(observation[key])
    raise KeyError(f"no known image key in {sorted(observation)}")


def get_shard_inds(total: int, num_shards: int, shard_ind: int) -> tuple[int, int]:
    """[start, end) episode indices for this shard
    (reference: encode_openx_dataset.py:202-212)."""
    per = total / num_shards
    return round(per * shard_ind), round(per * (shard_ind + 1))


def val_split_size(total_episodes: int) -> int:
    """First VAL_RATIO of episodes, clipped to [20, 200]
    (reference: encode_openx_dataset.py:46-48)."""
    return int(np.clip(int(total_episodes * VAL_RATIO),
                       MIN_VAL_EXAMPLES, MAX_VAL_EXAMPLES))


def make_magvit_encoder(tokenizer_params: dict, config=None,
                        batch_size: int = 64, dtype=None):
    """Jitted batched image -> token-grid encoder."""
    import jax
    import jax.numpy as jnp

    from hma_tpu.tokenizer.magvit2 import VQConfig, VQModel

    model = VQModel(config or VQConfig(), dtype=dtype or jnp.bfloat16)

    @jax.jit
    def encode(imgs):  # (B, H, W, 3) float [-1, 1]
        return model.apply(tokenizer_params, imgs, method=VQModel.encode).indices

    def encode_batch(frames_uint8: np.ndarray) -> np.ndarray:
        out = []
        n = len(frames_uint8)
        for i in range(0, n, batch_size):
            chunk = frames_uint8[i:i + batch_size]
            pad = batch_size - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.zeros_like(chunk[:1]).repeat(pad, 0)])
            x = normalize_image_np(chunk)
            idx = np.asarray(encode(jnp.asarray(x)))
            out.append(idx[:batch_size - pad])
        return np.concatenate(out).astype(np.uint32)

    # LFQ vocab = 2^z_channels; encode_episodes records it in metadata
    encode_batch.vocab_size = 2 ** (config or VQConfig()).z_channels
    return encode_batch


def make_svd_encoder(vae_params: Optional[dict] = None, batch_size: int = 32,
                     image_size: int = 256):
    """Jitted batched image -> (C, h, w) float16 latent encoder (SVD-VAE
    mean x SVD_SCALE; reference: get_vae_image_embeddings,
    datasets/utils.py:150-197)."""
    import jax
    import jax.numpy as jnp

    from hma_tpu.data.datasets import SVD_SCALE
    from hma_tpu.tokenizer.svd_vae import SVDTemporalVAE

    model = SVDTemporalVAE()
    if vae_params is None:
        vae_params = model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, image_size, image_size, 3)),
                                num_frames=1)

    @jax.jit
    def encode(imgs):
        z = model.apply(vae_params, imgs, method=SVDTemporalVAE.encode)
        return (z * SVD_SCALE).transpose(0, 3, 1, 2)  # (B, C, h, w)

    def encode_batch(frames_uint8: np.ndarray) -> np.ndarray:
        out = []
        for i in range(0, len(frames_uint8), batch_size):
            chunk = frames_uint8[i:i + batch_size]
            pad = batch_size - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.zeros_like(chunk[:1]).repeat(pad, 0)])
            x = normalize_image_np(chunk)
            z = np.asarray(encode(x))
            out.append(z[:batch_size - pad])
        return np.concatenate(out).astype(np.float16)

    return encode_batch


def encode_episodes(episodes: Iterable[dict], out_dir: str, name: str, *,
                    encode_batch: Optional[Callable] = None,
                    keep_res: bool = False,
                    episode_timeout_s: float = 2 * 24 * 3600,
                    image_size: int = 256) -> dict:
    """Encode an iterable of episodes into one shard directory.

    episodes: iterable of {"steps": iterable of {"image"/obs dict,
    "action": (da,)}}. Returns the metadata dict written.
    (reference main loop: encode_openx_dataset.py:290-388)
    """
    frames, actions, segment_ids = [], [], []
    t_start = time.time()
    n_episodes = 0
    for ep_idx, episode in enumerate(episodes):
        if time.time() - t_start > episode_timeout_s:
            break
        try:
            steps = episode["steps"] if isinstance(episode, dict) else episode
            for step in steps:
                obs = step.get("observation", step)
                img = select_image(obs) if isinstance(obs, dict) else np.asarray(obs)
                img = resize_image(img, target=image_size, keep_res=keep_res)
                frames.append(img)
                actions.append(np.asarray(step.get("action", np.zeros(1)),
                                          np.float32).reshape(-1))
                segment_ids.append(ep_idx)
            n_episodes += 1
        except Exception as e:  # per-episode tolerance (reference :325-327)
            print(f"episode {ep_idx} failed: {e!r}")

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    if not frames:
        with open(out / "error.json", "w") as f:
            json.dump({"error": "empty shard"}, f)
        return {}

    frames = np.stack(frames)
    da = max(a.shape[0] for a in actions)
    action_arr = np.zeros((len(actions), da), np.float32)
    for i, a in enumerate(actions):
        action_arr[i, :len(a)] = a

    if encode_batch is not None:
        video = encode_batch(frames)
        if video.ndim == 4:  # (N, C, h, w) continuous latents
            extra = {"token_dtype": str(video.dtype),
                     "latent_channels": int(video.shape[1])}
        else:                # (N, h, w) discrete tokens
            extra = {"vocab_size": getattr(encode_batch, "vocab_size", 2**18),
                     "token_dtype": "uint32"}
    else:
        video = frames  # raw uint8 images
        extra = {"token_dtype": "uint8"}

    if video.ndim == 4 and "latent_channels" in extra:
        h, w = video.shape[2], video.shape[3]
    else:
        h, w = video.shape[1], video.shape[2]
    video.tofile(out / "video.bin")
    np.asarray(segment_ids, np.int32).tofile(out / "segment_ids.bin")
    (out / "actions").mkdir(exist_ok=True)
    action_arr.tofile(out / "actions" / "actions.bin")
    meta = {
        "num_images": int(video.shape[0]),
        "h": int(h), "w": int(w), "s": int(h * w),
        "name": name,
        "action_dim": int(da),
        "num_episodes": n_episodes,
        "hz": DATA_FREQ_TABLE.get(name, 1),
        **extra,
    }
    with open(out / "metadata.json", "w") as f:
        json.dump(meta, f)
    return meta


def tfds_episode_stream(dataset_name: str, split: str, shard_ind: int,
                        num_shards: int,
                        gcs_root: str = "gs://gresearch/robotics"):
    """Stream episodes from a TFDS RLDS builder (requires tensorflow_datasets;
    reference: get_dataset_builder, encode_openx_dataset.py:184-199)."""
    import tensorflow_datasets as tfds  # optional dependency

    builder = tfds.builder_from_directory(f"{gcs_root}/{dataset_name}/0.1.0")
    total = builder.info.splits[split].num_examples
    start, end = get_shard_inds(total, num_shards, shard_ind)
    ds = builder.as_dataset(split=f"{split}[{start}:{end}]")
    for ep in tfds.as_numpy(ds):
        yield ep


def main(argv=None):
    p = argparse.ArgumentParser(description="Encode an OpenX dataset shard")
    p.add_argument("--dataset_name", type=str, required=True)
    p.add_argument("--data_split", type=str, default="train")
    p.add_argument("--shard_ind", type=int, default=0)
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--encoder_type", type=str, default="magvit",
                   choices=["magvit", "temporalvae", "raw"])
    p.add_argument("--encoder_name_or_path", type=str, default="data/magvit2.ckpt")
    p.add_argument("--out_root", type=str, default="data")
    p.add_argument("--keep_res", action="store_true")
    p.add_argument("--batch_size", type=int, default=64)
    args = p.parse_args(argv)

    encode_batch = None
    suffix = "raw"
    if args.encoder_type == "magvit":
        from hma_tpu.tokenizer.convert import load_magvit2

        encode_batch = make_magvit_encoder(
            *load_magvit2(args.encoder_name_or_path),
            batch_size=args.batch_size)
        suffix = "magvit"
    elif args.encoder_type == "temporalvae":
        # weights via load_svd_vae_torch_weights when available; random
        # init otherwise (useful for pipeline testing only)
        encode_batch = make_svd_encoder(batch_size=args.batch_size)
        suffix = "vae"

    out_dir = (f"{args.out_root}/{args.dataset_name}_{suffix}"
               f"_shard{args.shard_ind}_of_{args.num_shards}_{args.data_split}")
    episodes = tfds_episode_stream(args.dataset_name, args.data_split,
                                   args.shard_ind, args.num_shards)
    meta = encode_episodes(episodes, out_dir, args.dataset_name,
                           encode_batch=encode_batch, keep_res=args.keep_res)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
