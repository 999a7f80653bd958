"""Metric correctness + evaluate CLI smoke test."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from hma_tpu.metrics.image import psnr, ssim
from hma_tpu.metrics.token import teacher_forced_metrics


def test_psnr_known_values():
    a = np.zeros((8, 8, 3), np.float32)
    b = np.full((8, 8, 3), 16.0, np.float32)  # mse = 256
    # psnr = 10*log10(255^2/256) = 24.05
    assert float(psnr(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(24.0484, abs=1e-3)
    assert float(psnr(jnp.asarray(a), jnp.asarray(a))) > 100


def test_ssim_properties():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, size=(32, 32, 3)).astype(np.float32)
    assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
    noisy = img + rng.normal(0, 50, img.shape).astype(np.float32)
    s = float(ssim(img, noisy))
    assert 0 < s < 0.9


def _ssim_bruteforce(a, b, data_range=255.0, win=7, k1=0.01, k2=0.03):
    """Independent oracle: the exact algorithm skimage documents for
    structural_similarity(channel_axis=-1) — per-channel sliding 7x7
    uniform windows over the valid region, sample (ddof=1) covariance —
    computed by brute-force window loops instead of convolutions.
    (skimage itself is not in this image; validated against it offline.)"""
    H, W, C = a.shape
    NP = win * win
    C1, C2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    vals = []
    for c in range(C):
        for i in range(H - win + 1):
            for j in range(W - win + 1):
                x = a[i:i + win, j:j + win, c].astype(np.float64).ravel()
                y = b[i:i + win, j:j + win, c].astype(np.float64).ravel()
                ux, uy = x.mean(), y.mean()
                vx, vy = x.var(ddof=1), y.var(ddof=1)
                vxy = ((x - ux) * (y - uy)).sum() / (NP - 1)
                vals.append(((2 * ux * uy + C1) * (2 * vxy + C2))
                            / ((ux ** 2 + uy ** 2 + C1) * (vx + vy + C2)))
    return float(np.mean(vals))


def test_ssim_matches_bruteforce_oracle():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 20, a.shape), 0, 255).astype(np.float32)
    ref = _ssim_bruteforce(a, b)
    assert float(ssim(a, b)) == pytest.approx(ref, abs=1e-3)
    # identical images: oracle and implementation both at exactly 1
    assert _ssim_bruteforce(a, a) == pytest.approx(1.0, abs=1e-9)


def test_teacher_forced_metrics_perfect_logits():
    rng = np.random.default_rng(0)
    targets = rng.integers(0, 2**18, size=(2, 3, 16)).astype(np.int32)
    fv, nv = 512, 2
    f = np.stack([(targets // fv**k) % fv for k in range(nv)], axis=-1)
    logits = np.full((2, 3, 16, nv, fv), -10.0, np.float32)
    for b in range(2):
        for t in range(3):
            for s in range(16):
                for k in range(nv):
                    logits[b, t, s, k, f[b, t, s, k]] = 10.0
    m = teacher_forced_metrics(jnp.asarray(logits), jnp.asarray(targets), fv)
    assert float(m["acc"]) == 1.0
    assert float(m["loss"]) < 1e-3


def test_evaluate_cli_token_metrics(tmp_path):
    """Full evaluate.py run against a fresh tiny checkpoint."""
    import yaml

    from hma_tpu.config import GenieConfig
    from hma_tpu.data.datasets import write_token_dataset
    from hma_tpu.train.trainer import TrainArgs, run_training
    from hma_tpu.evaluate import main as eval_main

    rng = np.random.default_rng(0)
    domain = "language_table"
    data = tmp_path / "data"
    for split, n in [("train", 60), ("val", 40)]:
        video = rng.integers(0, 2**18, size=(n, 4, 4)).astype(np.uint32)
        segs = np.repeat(np.arange(n // 10), 10).astype(np.int32)
        actions = rng.normal(size=(n, 2)).astype(np.float32)
        write_token_dataset(data / f"{domain}_magvit_max1000000_{split}",
                            video, segs, actions,
                            {"name": domain, "vocab_size": 2**18, "s": 16})
    cfg = GenieConfig(num_layers=1, num_heads=2, d_model=32, T=4, S=16,
                      image_vocab_size=2**18, num_factored_vocabs=2,
                      action_token_size=8, action_network="concat+modulate",
                      num_prompt_frames=2, use_actions=True)
    cfg.save_pretrained(str(tmp_path / "config.json"))
    with open(tmp_path / "split.yaml", "w") as f:
        yaml.safe_dump({"domains": domain}, f)

    run_training(TrainArgs(
        genie_config=str(tmp_path / "config.json"),
        output_dir=str(tmp_path / "run"), train_split=str(tmp_path / "split.yaml"),
        data_root=str(data), window_size=4, per_device_train_batch_size=1,
        max_train_steps=2, eval_every_n_steps=100, checkpointing_steps="100",
        num_warmup_steps=1, log_every=1))

    out = eval_main([
        "--checkpoint_dir", str(tmp_path / "run"),
        "--val_data_dir", str(data / f"{domain}_magvit_max1000000_val"),
        "--output_dir", str(tmp_path / "eval"),
        "--batch_size", "4", "--max_examples", "8", "--maskgit_steps", "2",
    ])
    assert np.isfinite(out["loss"]) and np.isfinite(out["perplexity"])
    assert out["num_examples"] == 8
    assert (tmp_path / "eval" / "metrics.jsonl").is_file()
