"""Collator mask-statistics and dataset round-trip tests
(reference formulas: hma/data.py:42-157)."""

import numpy as np
import pytest

from hma_tpu.config import GenieConfig
from hma_tpu.data.collators import maskgit_collate, maskgit_collate_feature
from hma_tpu.data.datasets import RawTokenDataset, write_token_dataset
from hma_tpu.data.sampler import MultiTaskBatchSampler


def make_config(**kw):
    d = dict(num_layers=1, num_heads=1, d_model=8, T=6, S=16,
             image_vocab_size=2**18, num_factored_vocabs=2,
             num_prompt_frames=2, use_actions=False)
    d.update(kw)
    return GenieConfig(**d)


def make_batch(B, T, h, w, rng, vocab=2**18):
    return [{
        "input_ids": rng.integers(0, vocab, size=(T * h * w,)).astype(np.int64),
        "h": h, "w": w, "domain": "language_table",
    } for _ in range(B)]


def test_collator_masks_and_labels():
    cfg = make_config()
    rng = np.random.default_rng(0)
    batch = make_batch(4, cfg.T, 4, 4, rng)
    out = maskgit_collate(batch, cfg, rng)
    assert out["input_ids"].shape == (4, cfg.T * 16)
    assert out["labels"].shape == (4, cfg.T * 16)
    # labels are the uncorrupted originals
    orig = np.stack([ex["input_ids"] for ex in batch])
    np.testing.assert_array_equal(out["labels"], orig.astype(np.int32))
    # frame 0 is never masked
    x = out["input_ids"].reshape(4, cfg.T, 16)
    assert (x[:, 0] != cfg.image_vocab_size).all()
    # some tokens must be masked
    assert (x[:, 1:] == cfg.image_vocab_size).any()


def test_collator_mask_rate_statistics():
    """Mean masked fraction over frames 1.. ~ E[cos(u*pi/2)] = 2/pi when
    the MLM branch runs (non_mlm off, corruption off)."""
    cfg = make_config(non_mlm_ratio=0.0, dataloader_apply_corruption=False, T=8)
    rng = np.random.default_rng(1)
    fracs = []
    for _ in range(200):
        batch = make_batch(2, cfg.T, 4, 4, rng)
        out = maskgit_collate(batch, cfg, rng)
        x = out["input_ids"].reshape(2, cfg.T, 16)
        fracs.append((x[:, 1:] == cfg.image_vocab_size).mean())
    assert abs(np.mean(fracs) - 2 / np.pi) < 0.05


def test_collator_non_mlm_prompt_untouched():
    cfg = make_config(non_mlm_ratio=1.0, dataloader_apply_corruption=False)
    rng = np.random.default_rng(2)
    for _ in range(20):
        batch = make_batch(2, cfg.T, 4, 4, rng)
        orig = np.stack([ex["input_ids"] for ex in batch]).reshape(2, cfg.T, 16)
        out = maskgit_collate(batch, cfg, rng)
        x = out["input_ids"].reshape(2, cfg.T, 16)
        # frames < num_prompt_frames are never masked or corrupted
        np.testing.assert_array_equal(x[:, :cfg.num_prompt_frames],
                                      orig[:, :cfg.num_prompt_frames])


def test_feature_collator_indicator():
    cfg = make_config(dataloader_mask_ratio_min=0.1)
    rng = np.random.default_rng(3)
    B, h, w, C = 3, 4, 4, 4
    batch = [{
        "input_ids": rng.normal(size=(cfg.T * h * w, C)).astype(np.float32),
        "h": h, "w": w, "domain": "language_table",
    } for _ in range(B)]
    out = maskgit_collate_feature(batch, cfg, rng)
    ind = out["masked_tokens_indicator"]
    assert ind.shape == (B, cfg.T, h, w)
    assert ind[:, 0].sum() == 0 and ind.sum() > 0
    # inputs are never modified in the continuous path
    np.testing.assert_array_equal(out["input_ids"], out["labels"])


def test_raw_token_dataset_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    N, h, w = 40, 4, 4
    video = rng.integers(0, 2**18, size=(N, h, w)).astype(np.uint32)
    segs = np.repeat(np.arange(4), 10).astype(np.int32)
    actions = rng.normal(size=(N, 2)).astype(np.float32)
    write_token_dataset(tmp_path / "ds", video, segs, actions,
                        {"name": "language_table"})

    ds = RawTokenDataset(tmp_path / "ds", window_size=4, use_actions=True,
                         compute_stride_from_freq_table=False)
    assert len(ds) > 0
    item = ds[0]
    assert item["input_ids"].shape == (4 * h * w,)
    np.testing.assert_array_equal(
        item["input_ids"].reshape(4, h, w), video[0:4].astype(np.int64))
    assert item["action_ids"].shape == (4, 2)
    # windows never straddle segment boundaries
    for idx in range(len(ds)):
        s = ds.valid_start_inds[idx]
        assert segs[s] == segs[s + ds.video_len]


def test_multitask_sampler():
    sampler = MultiTaskBatchSampler([100, 400], batch_size=8, temperature=3.0)
    dist = sampler.generate_tasks_distribution()
    assert dist.sum() == pytest.approx(1.0)
    assert dist[1] > dist[0]  # larger dataset more likely...
    assert dist[1] < 0.8      # ...but flattened vs proportional (0.8)
    batches = list(sampler)
    assert len(batches) == len(sampler)
    for b in batches:
        assert len(b) == 8
        # batch comes entirely from one dataset's index range
        assert (b < 100).all() or ((b >= 100) & (b < 500)).all()


def test_collator_mixed_action_batch():
    """drop_action_ratio drops actions per ITEM; a mixed batch must drop
    actions batch-wide instead of crashing on a ragged stack (the
    reference's features[0] check + torch.stack would raise,
    hma/data.py:90-91)."""
    cfg = make_config(use_actions=True)
    rng = np.random.default_rng(3)
    batch = make_batch(4, cfg.T, 4, 4, rng)
    for ex in batch[:3]:  # item 3 dropped its actions
        ex["action_ids"] = rng.normal(size=(cfg.T, 2)).astype(np.float32)
    out = maskgit_collate(batch, cfg, rng)
    assert "action_ids" not in out
    for ex in batch:  # all items kept -> actions included
        ex["action_ids"] = rng.normal(size=(cfg.T, 2)).astype(np.float32)
    out = maskgit_collate(batch, cfg, rng)
    assert out["action_ids"].shape == (4, cfg.T, 2)
