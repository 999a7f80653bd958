"""Multi-domain mixture training + continuous (STMAR) CLI end-to-end."""

import json

import numpy as np
import pytest
import yaml

from hma_tpu.config import DiffusionGenieConfig, GenieConfig
from hma_tpu.data.datasets import write_token_dataset


def write_latent_dataset(out_dir, n, h, w, c, rng, name, da=2):
    from pathlib import Path

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    video = rng.normal(size=(n, c, h, w)).astype(np.float16)
    video.tofile(out / "video.bin")
    np.repeat(np.arange(n // 10), 10).astype(np.int32).tofile(out / "segment_ids.bin")
    (out / "actions").mkdir(exist_ok=True)
    rng.normal(size=(n, da)).astype(np.float32).tofile(out / "actions" / "actions.bin")
    meta = {"num_images": n, "h": h, "w": w, "latent_channels": c, "s": h * w,
            "name": name, "token_dtype": "float16", "action_dim": da}
    with open(out / "metadata.json", "w") as f:
        json.dump(meta, f)


def test_multi_domain_training(tmp_path):
    """Two domains with different action dims train in one compiled step."""
    from hma_tpu.train.trainer import TrainArgs, run_training

    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    for domain, da in [("language_table", 2), ("kuka", 4)]:
        for split, n in [("train", 60), ("val", 30)]:
            video = rng.integers(0, 2**18, size=(n, 4, 4)).astype(np.uint32)
            segs = np.repeat(np.arange(n // 10), 10).astype(np.int32)
            actions = rng.normal(size=(n, da)).astype(np.float32)
            write_token_dataset(data / f"{domain}_magvit_max1000000_{split}",
                                video, segs, actions,
                                {"name": domain, "vocab_size": 2**18, "s": 16})
    cfg = GenieConfig(num_layers=1, num_heads=2, d_model=32, T=4, S=16,
                      image_vocab_size=2**18, num_factored_vocabs=2,
                      action_token_size=8, action_network="concat+modulate",
                      num_prompt_frames=2, use_actions=True)
    cfg.save_pretrained(str(tmp_path / "cfg.json"))
    with open(tmp_path / "split.yaml", "w") as f:
        yaml.safe_dump({"domains": "language_table, kuka"}, f)

    metrics = run_training(TrainArgs(
        genie_config=str(tmp_path / "cfg.json"), output_dir=str(tmp_path / "run"),
        train_split=str(tmp_path / "split.yaml"), data_root=str(data),
        window_size=4, per_device_train_batch_size=1, max_train_steps=6,
        eval_every_n_steps=3, max_eval_steps=2, checkpointing_steps="100",
        num_warmup_steps=1, log_every=1, grad_checkpointing=False))
    assert np.isfinite(metrics["loss"])
    # both domains were sampled (domain ids logged implicitly via loss only;
    # check the padded action table width covers the larger domain)
    lines = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    assert any("train/loss" in l for l in lines)


def test_continuous_training_and_eval_cli(tmp_path):
    from hma_tpu.evaluate_feature import main as eval_main
    from hma_tpu.train.trainer import TrainArgs, run_training

    rng = np.random.default_rng(1)
    data = tmp_path / "data"
    for split, n in [("train", 60), ("val", 30)]:
        write_latent_dataset(data / f"language_table_vae_max1000000_{split}",
                             n, 4, 4, 4, rng, "language_table")

    cfg = DiffusionGenieConfig(
        num_layers=1, num_heads=2, d_model=32, T=4, S=16,
        image_vocab_size=2**18, vae_embed_dim=4, patch_size=1,
        diffloss_d=1, diffloss_w=32, num_sampling_steps="5", maskgit_steps=3,
        action_token_size=8, action_network="concat+modulate",
        num_prompt_frames=2, use_actions=True, jointly_predict_actions=False)
    cfg.save_pretrained(str(tmp_path / "cfg.json"))
    with open(tmp_path / "split.yaml", "w") as f:
        yaml.safe_dump({"domains": "language_table"}, f)

    metrics = run_training(TrainArgs(
        genie_config=str(tmp_path / "cfg.json"), output_dir=str(tmp_path / "run"),
        train_split=str(tmp_path / "split.yaml"), data_root=str(data),
        model_type="continuous", window_size=4, per_device_train_batch_size=1,
        max_train_steps=4, eval_every_n_steps=2, max_eval_steps=1,
        checkpointing_steps="100", num_warmup_steps=1, log_every=1,
        grad_checkpointing=False))
    assert np.isfinite(metrics["loss"])

    out = eval_main([
        "--checkpoint_dir", str(tmp_path / "run"),
        "--val_data_dir", str(data / "language_table_vae_max1000000_val"),
        "--output_dir", str(tmp_path / "eval"),
        "--batch_size", "2", "--max_examples", "4",
        "--num_prompt_frames", "2", "--maskgit_steps", "3",
    ])
    assert np.isfinite(out["latent_mse"])
    assert out["num_examples"] == 4
