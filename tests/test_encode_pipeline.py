"""Offline encode pipeline tests: encode shards -> merge -> load -> train-ready."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from hma_tpu.data.datasets import RawTokenDataset
from hma_tpu.data.encode_openx import (
    encode_episodes,
    get_shard_inds,
    select_image,
    val_split_size,
)
from hma_tpu.data.merge_shards import merge_shards


def synth_episodes(n_eps, steps_per_ep, rng, da=3):
    for _ in range(n_eps):
        yield {"steps": [
            {"observation": {"image": rng.integers(0, 255, (64, 48, 3)).astype(np.uint8)},
             "action": rng.normal(size=da).astype(np.float32)}
            for _ in range(steps_per_ep)]}


def test_shard_index_math():
    assert get_shard_inds(100, 4, 0) == (0, 25)
    assert get_shard_inds(100, 4, 3) == (75, 100)
    assert get_shard_inds(10, 3, 1) == (3, 7)
    assert val_split_size(100) == 20
    assert val_split_size(10000) == 200
    assert val_split_size(1000) == 50


def test_select_image_priority():
    img = np.zeros((4, 4, 3))
    assert select_image({"wrist_image": img + 1, "image": img}) is not None
    np.testing.assert_array_equal(select_image({"rgb": img + 2}), img + 2)


def fake_token_encoder(frames):
    """Deterministic stand-in tokenizer: hash pixels into a 16x16 grid."""
    n = len(frames)
    small = frames[:, ::16, ::16, 0].astype(np.uint32)  # (n, 16, 16)
    return (small * 1027) % (2**18)


def test_encode_merge_load_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    shard_dirs = []
    for i in range(3):
        d = tmp_path / f"shard{i}"
        meta = encode_episodes(synth_episodes(3, 12, rng), str(d), "language_table",
                               encode_batch=fake_token_encoder)
        assert meta["num_images"] == 36
        assert meta["h"] == meta["w"] == 16
        shard_dirs.append(str(d))
    # empty shard tolerated
    empty = tmp_path / "shard_missing"
    encode_episodes(iter([]), str(empty), "language_table",
                    encode_batch=fake_token_encoder)
    assert (empty / "error.json").exists()
    shard_dirs.append(str(empty))
    shard_dirs.append(str(tmp_path / "never_created"))

    merged = tmp_path / "merged"
    meta = merge_shards(shard_dirs, str(merged))
    assert meta["num_images"] == 108

    seg = np.fromfile(merged / "segment_ids.bin", dtype=np.int32)
    assert (np.diff(seg) >= 0).all()         # monotone after re-offset
    assert len(np.unique(seg)) == 9          # 3 shards x 3 episodes

    ds = RawTokenDataset(str(merged), window_size=4, use_actions=True,
                         compute_stride_from_freq_table=False)
    assert len(ds) > 0
    item = ds[0]
    assert item["input_ids"].shape == (4 * 16 * 16,)
    assert item["action_ids"].shape == (4, 3)


def test_encode_with_real_vq_encoder(tmp_path):
    """Encode through an actual (random-weight) VQModel and decode back:
    tokens must round-trip the quantized latent signs."""
    from hma_tpu.data.encode_openx import make_magvit_encoder
    from hma_tpu.tokenizer.magvit2 import VQConfig, VQModel

    cfg = VQConfig(base_channels=32, ch_mult=(1, 2), num_res_blocks=1)
    model = VQModel(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))

    import hma_tpu.data.encode_openx as eo

    # patch the encoder factory's model size for the test by calling
    # VQModel directly
    import jax as _jax

    @_jax.jit
    def enc(imgs):
        return model.apply(params, imgs, method=VQModel.encode).indices

    def encode_batch(frames):
        x = frames.astype(np.float32) / 127.5 - 1.0
        return np.asarray(enc(jnp.asarray(x))).astype(np.uint32)

    rng = np.random.default_rng(1)
    meta = encode_episodes(synth_episodes(2, 4, rng), str(tmp_path / "vq"),
                           "language_table", encode_batch=encode_batch,
                           image_size=32)
    assert meta["num_images"] == 8
    video = np.fromfile(tmp_path / "vq" / "video.bin", np.uint32).reshape(8, 16, 16)
    assert video.max() < 2**18


def test_merge_shards_continuous_latents(tmp_path):
    """Merging float16 (N, C, h, w) VAE-latent shards must preserve the
    channel layout exactly (regression: the shape pick treated latent
    shards as (N, h, w) and silently merged a channel-interleaved prefix)."""
    import json

    rng = np.random.default_rng(2)
    C, h = 4, 8
    shard_dirs, parts = [], []
    for i in range(2):
        d = tmp_path / f"lshard{i}"
        d.mkdir()
        n = 12
        lat = rng.normal(size=(n, C, h, h)).astype(np.float16)
        lat.tofile(d / "video.bin")
        np.repeat(np.arange(n // 4), 4).astype(np.int32).tofile(
            d / "segment_ids.bin")
        (d / "actions").mkdir()
        rng.normal(size=(n, 2)).astype(np.float32).tofile(
            d / "actions" / "actions.bin")
        (d / "metadata.json").write_text(json.dumps({
            "name": "language_table", "num_images": n, "h": h, "w": h,
            "latent_channels": C, "token_dtype": "float16",
            "num_episodes": 3}))
        shard_dirs.append(str(d))
        parts.append(lat)

    merged = tmp_path / "lmerged"
    meta = merge_shards(shard_dirs, str(merged))
    assert meta["num_images"] == 24 and meta["latent_channels"] == C
    got = np.fromfile(merged / "video.bin", np.float16).reshape(24, C, h, h)
    np.testing.assert_array_equal(got, np.concatenate(parts))
    seg = np.fromfile(merged / "segment_ids.bin", np.int32)
    assert len(np.unique(seg)) == 6
