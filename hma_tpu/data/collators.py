"""MaskGIT batch collators as pure numpy functions with explicit RNG.

Semantics mirror the reference collators (hma/data.py:28-157):
  - Copilot4D-style uniform token corruption at a random global rate;
  - with prob `non_mlm_ratio`, a "non-MLM" branch that leaves a random
    prompt prefix unmasked and corrupts later frames with compounding
    rates; otherwise standard MLM from frame 1;
  - per-(example, frame) cosine-scheduled masking to `mask_token_id`
    (discrete) or to a boolean `masked_tokens_indicator` (continuous).

Pure functions + an explicit np.random.Generator make mask statistics
unit-testable (the reference's Python `random` calls are untestable
global state).
"""

from __future__ import annotations


import numpy as np

from hma_tpu.config import GenieConfig


def _cosine(u: np.ndarray) -> np.ndarray:
    return np.cos(u * np.pi / 2)


def maskgit_collate(batch: list[dict], config: GenieConfig,
                    rng: np.random.Generator) -> dict:
    """Discrete-token collator (reference: get_maskgit_collator, hma/data.py:28).

    batch: list of dataset items with "input_ids" (T*h*w,) int64.
    Returns numpy dict with input_ids/labels (B, T*h*w) int32 + metadata.
    """
    h, w = batch[0]["h"], batch[0]["w"]
    B, T = len(batch), config.T
    nv, fv = config.num_factored_vocabs, config.factored_vocab_size
    mask_token_id = config.image_vocab_size

    x = np.stack([ex["input_ids"] for ex in batch]).reshape(B, T, h, w)
    labels = x.copy()
    powers = fv ** np.arange(nv)
    x_THWC = (x[..., None] // powers) % fv  # factorize

    random_values = rng.integers(0, fv, size=x_THWC.shape)
    if config.dataloader_apply_corruption:
        u01 = rng.uniform()
        r = rng.uniform(size=x_THWC.shape)
        corrupt = r < config.max_corrupt_rate * u01
        x_THWC = np.where(corrupt, random_values, x_THWC)

    if rng.uniform() < config.non_mlm_ratio:
        # leave frames [0, first_masked_frame) unmasked; corrupt later
        # frames with compounding rates (reference: hma/data.py:51-64)
        lo = min(config.num_prompt_frames, config.T - 1)
        first_masked_frame = int(rng.integers(lo, config.T))
        correct_rate = rng.uniform(config.dataloader_mask_ratio_min, 1.0)
        for i in range(first_masked_frame, T):
            correct_rate *= rng.uniform(0.9, 1.0)
            r = rng.uniform(size=(B, h, w, nv))
            bad = r > correct_rate
            x_THWC[:, i] = np.where(bad, random_values[:, i], x_THWC[:, i])
    else:
        first_masked_frame = 1

    x_THW = np.sum(x_THWC * powers, axis=-1)  # unfactorize
    if config.dataloader_apply_mask:
        mask = np.zeros((B, T - first_masked_frame, h, w), dtype=bool)
        while not mask.any():  # reference loops until at least one token masked
            mask_prob_T = _cosine(rng.uniform(size=(B, T - first_masked_frame, 1, 1)))
            r = rng.uniform(size=(B, T - first_masked_frame, h, w))
            mask = r < mask_prob_T
        tail = x_THW[:, first_masked_frame:]
        x_THW[:, first_masked_frame:] = np.where(mask, mask_token_id, tail)

    out = {
        "input_ids": x_THW.reshape(B, T * h * w).astype(np.int32),
        "labels": labels.reshape(B, T * h * w).astype(np.int32),
        "domain": [ex["domain"] for ex in batch],
        "h": [h] * B,
        "w": [w] * B,
    }
    # all-or-nothing: drop_action_ratio drops actions per ITEM, so a mixed
    # batch is possible; the reference checks only features[0] and its
    # torch.stack crashes on such batches (hma/data.py:90-91 — a latent
    # reference defect we do not replicate). Batched jit needs a
    # batch-level decision anyway: any dropped item drops the batch.
    if all("action_ids" in ex for ex in batch):
        out["action_ids"] = np.stack([ex["action_ids"] for ex in batch]).astype(np.float32)
    return out


def maskgit_collate_feature(batch: list[dict], config: GenieConfig,
                            rng: np.random.Generator) -> dict:
    """Continuous-latent collator (reference: get_maskgit_collator_feature,
    hma/data.py:103). Emits `masked_tokens_indicator` instead of in-place
    masking."""
    h, w = batch[0]["h"], batch[0]["w"]
    B, T = len(batch), config.T
    x = np.stack([ex["input_ids"] for ex in batch])  # (B, T*h*w, C)
    C = x.shape[-1]
    x_THWC = x.reshape(B, T, h, w, C)
    labels = x_THWC.copy()

    mask_token_indicator = np.zeros((B, T, h, w), dtype=np.int32)
    if config.dataloader_apply_mask:
        if rng.uniform() < config.non_mlm_ratio:
            lo = min(config.num_prompt_frames, config.T - 1)
            first_masked_frame = int(rng.integers(lo, config.T))
        else:
            first_masked_frame = 1
        mask = np.zeros((B, T - first_masked_frame, h, w), dtype=bool)
        while not mask.any():
            rand = rng.uniform(size=(B, T - first_masked_frame, 1, 1))
            rand = rand * (1 - config.dataloader_mask_ratio_min) + config.dataloader_mask_ratio_min
            mask_prob_T = _cosine(rand)
            r = rng.uniform(size=(B, T - first_masked_frame, h, w))
            mask = r < mask_prob_T
        mask_token_indicator = np.concatenate(
            [np.zeros((B, first_masked_frame, h, w), dtype=np.int32),
             mask.astype(np.int32)], axis=1)

    out = {
        "input_ids": x_THWC.reshape(B, T * h * w, C).astype(np.float32),
        "labels": labels.reshape(B, T * h * w, C).astype(np.float32),
        "masked_tokens_indicator": mask_token_indicator,
        "domain": [ex["domain"] for ex in batch],
        "h": [h] * B,
        "w": [w] * B,
    }
    # all-or-nothing: drop_action_ratio drops actions per ITEM, so a mixed
    # batch is possible; the reference checks only features[0] and its
    # torch.stack crashes on such batches (hma/data.py:90-91 — a latent
    # reference defect we do not replicate). Batched jit needs a
    # batch-level decision anyway: any dropped item drops the batch.
    if all("action_ids" in ex for ex in batch):
        out["action_ids"] = np.stack([ex["action_ids"] for ex in batch]).astype(np.float32)
    return out
