"""End-to-end CLI tests: train_multi on a synthetic dataset, checkpoint,
resume, then generate a rollout file."""

import json
import os
from pathlib import Path

import numpy as np
import pytest
import yaml

from hma_tpu.config import GenieConfig
from hma_tpu.data.datasets import write_token_dataset


@pytest.fixture(scope="module")
def synth_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("env")
    data = root / "data"
    rng = np.random.default_rng(0)
    domain = "language_table"
    N, h, w = 80, 4, 4
    vocab = 2**18
    for split, n in [("train", N), ("val", 40)]:
        video = rng.integers(0, vocab, size=(n, h, w)).astype(np.uint32)
        segs = np.repeat(np.arange(n // 10), 10).astype(np.int32)
        actions = rng.normal(size=(n, 2)).astype(np.float32)
        write_token_dataset(data / f"{domain}_magvit_max1000000_{split}",
                            video, segs, actions,
                            {"name": domain, "vocab_size": vocab, "s": h * w})

    cfg = GenieConfig(num_layers=2, num_heads=2, d_model=32, T=4, S=16,
                      image_vocab_size=vocab, num_factored_vocabs=2,
                      action_token_size=8, action_network="concat+modulate",
                      num_prompt_frames=2, use_actions=True)
    cfg_path = root / "config.json"
    cfg.save_pretrained(str(cfg_path))

    split_path = root / "datasplit.yaml"
    with open(split_path, "w") as f:
        yaml.safe_dump({"domains": domain}, f)
    return root, data, cfg_path, split_path, domain


def test_train_checkpoint_resume(synth_env):
    root, data, cfg_path, split_path, domain = synth_env
    from hma_tpu.train.trainer import TrainArgs, run_training

    out = root / "run1"
    args = TrainArgs(
        genie_config=str(cfg_path), output_dir=str(out),
        train_split=str(split_path), data_root=str(data),
        model_type="discrete", window_size=4,
        per_device_train_batch_size=4, learning_rate=3e-3,
        max_train_steps=12, eval_every_n_steps=6, max_eval_steps=2,
        checkpointing_steps="6", num_warmup_steps=2, log_every=2,
        overfit_first_batch=True)
    metrics = run_training(args)
    assert np.isfinite(metrics["loss"])
    assert (out / "step_6").is_dir()
    assert (out / "step_12").is_dir()
    assert (out / "final_checkpt" / "config.json").is_file()
    lines = [json.loads(l) for l in open(out / "metrics.jsonl")]
    losses = [l["train/loss"] for l in lines if "train/loss" in l]
    assert losses[-1] < losses[0]  # overfit-one-batch converges

    # resume continues from the checkpointed step
    args2 = TrainArgs(**{**vars(args), "max_train_steps": 14,
                         "resume_from_checkpoint": "latest"})
    run_training(args2)
    assert (out / "final_checkpt").is_dir()


def test_generate_cli(synth_env):
    root, data, cfg_path, split_path, domain = synth_env
    from hma_tpu.generate import main as generate_main

    out = root / "run1"
    gen_out = root / "genout"
    generate_main([
        "--checkpoint_dir", str(out),
        "--val_data_dir", str(data / f"{domain}_magvit_max1000000_val"),
        "--output_dir", str(gen_out),
        "--batch_size", "2", "--num_prompt_frames", "2",
        "--maskgit_steps", "2",
    ])
    meta = json.loads((gen_out / "metadata.json").read_text())
    video = np.fromfile(gen_out / "video.bin", dtype=np.uint32).reshape(
        -1, meta["h"], meta["w"])
    # layout: per example prompt(2) + pred(2) + gt(2) = 6 frames, 2 examples
    assert video.shape[0] == 12
    assert video.max() < meta["vocab_size"]

    # --window_size shrinks the rollout window below the card's T
    gen_out3 = root / "genout_w3"
    generate_main([
        "--checkpoint_dir", str(out),
        "--val_data_dir", str(data / f"{domain}_magvit_max1000000_val"),
        "--output_dir", str(gen_out3),
        "--batch_size", "2", "--num_prompt_frames", "2",
        "--maskgit_steps", "2", "--window_size", "3",
    ])
    meta3 = json.loads((gen_out3 / "metadata.json").read_text())
    assert meta3["window_size"] == 3
    video3 = np.fromfile(gen_out3 / "video.bin", dtype=np.uint32)
    # prompt(2) + pred(1) + gt(1) = 4 frames per example, 2 examples
    assert video3.size == 2 * 4 * meta3["h"] * meta3["w"]


def test_resume_equals_straight_run_bf16_moments(synth_env, tmp_path):
    """Interrupt/resume must be a no-op: 6 steps + resume to 12 ends in
    the SAME state as 12 straight steps — including the bf16
    stochastic-rounded Adam moments (train/lowp.py), whose dtype and
    values must survive the Orbax save/restore round trip. Guards the
    production 1B-card numeric stack's restore path: a silent
    bf16→fp32 upcast on restore (or a re-round of restored moments)
    would diverge here. Device-side per-step RNG is step-indexed
    (trainer.py PRNGKey(step_i)) and overfit_first_batch pins the host
    batch, so the comparison is exact, not statistical."""
    import orbax.checkpoint as ocp

    root, data, cfg_path, split_path, domain = synth_env
    from hma_tpu.train.trainer import TrainArgs, run_training

    def train(out, resume=None):
        args = TrainArgs(
            genie_config=str(cfg_path), output_dir=str(out),
            train_split=str(split_path), data_root=str(data),
            model_type="discrete", window_size=4,
            per_device_train_batch_size=4, learning_rate=3e-3,
            max_train_steps=12, eval_every_n_steps=100, max_eval_steps=1,
            checkpointing_steps="6", num_warmup_steps=2, log_every=100,
            overfit_first_batch=True, adam_moment_dtype="bfloat16",
            resume_from_checkpoint=resume)
        run_training(args)

    straight, resumed = tmp_path / "straight", tmp_path / "resumed"
    train(straight)
    # "interrupt" = straight's own step_6 snapshot; resuming from it in a
    # fresh dir must replay steps 6-11 identically (same LR horizon, same
    # step-derived collate rng, same sampler position).
    train(resumed, resume=str(straight / "step_6"))

    ckptr = ocp.StandardCheckpointer()
    a = ckptr.restore((straight / "step_12" / "state").absolute())
    b = ckptr.restore((resumed / "step_12" / "state").absolute())
    flat_a, tree_a = __import__("jax").tree_util.tree_flatten_with_path(a)
    flat_b, _ = __import__("jax").tree_util.tree_flatten_with_path(b)
    assert len(flat_a) == len(flat_b)
    saw_bf16_moment = False
    for (path_a, xa), (_, xb) in zip(flat_a, flat_b):
        assert xa.dtype == xb.dtype, path_a
        saw_bf16_moment |= str(xa.dtype) == "bfloat16"
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb),
                                      err_msg=str(path_a))
    assert saw_bf16_moment  # the restored state really holds bf16 moments


def test_checkpoint_ordering_mixed_modes(tmp_path):
    """step_N and epoch_N counters are not comparable; ordering must use
    recency (regression: epoch_2 sorted before step_1000, so pruning
    deleted the newest checkpoint and resume picked the oldest)."""
    import os
    import time

    from hma_tpu.utils.checkpoint import latest_checkpoint, prune_checkpoints

    older = tmp_path / "step_1000"
    newer = tmp_path / "epoch_2"
    older.mkdir()
    time.sleep(0.02)
    newer.mkdir()
    assert latest_checkpoint(str(tmp_path)).endswith("epoch_2")
    prune_checkpoints(str(tmp_path), keep_last=1)
    assert newer.is_dir() and not older.is_dir()


def test_native_loader_resume_equals_straight_run(synth_env, tmp_path):
    """Native-path (C++ loader) resume must be bit-exact: 6 steps + resume
    to 12 ends in the SAME state as 12 straight steps. The loader now
    delivers batch i as a pure function of (seed, i) in index order
    (cpp OrderedPrefetcher), and the trainer replays the task-selection
    stream to hand each loader its consumed-batch offset — so a resumed
    run draws exactly the data the straight run drew. No
    overfit_first_batch: this exercises the real streaming data path."""
    import shutil as _shutil

    if _shutil.which("g++") is None:
        pytest.skip("no C++ compiler")
    import orbax.checkpoint as ocp

    root, data, cfg_path, split_path, domain = synth_env
    from hma_tpu.train.trainer import TrainArgs, run_training

    def train(out, steps, resume=None):
        args = TrainArgs(
            genie_config=str(cfg_path), output_dir=str(out),
            train_split=str(split_path), data_root=str(data),
            model_type="discrete", window_size=4,
            per_device_train_batch_size=4, learning_rate=3e-3,
            max_train_steps=steps, eval_every_n_steps=1000,
            max_eval_steps=1, checkpointing_steps="6",
            num_warmup_steps=2, log_every=100, use_native_loader=True,
            resume_from_checkpoint=resume)
        run_training(args)

    straight, resumed = tmp_path / "nl_straight", tmp_path / "nl_resumed"
    train(straight, 12)
    train(resumed, 12, resume=str(straight / "step_6"))

    ckptr = ocp.StandardCheckpointer()
    a = ckptr.restore((straight / "step_12" / "state").absolute())
    b = ckptr.restore((resumed / "step_12" / "state").absolute())
    import jax as _jax
    flat_a = _jax.tree_util.tree_flatten_with_path(a)[0]
    flat_b = _jax.tree_util.tree_flatten_with_path(b)[0]
    assert len(flat_a) == len(flat_b)
    for (path_a, xa), (_, xb) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb),
                                      err_msg=str(path_a))


def test_frozen_nan_run_aborts(synth_env, tmp_path):
    """A run whose every backward is non-finite must fail loudly instead
    of silently burning its step budget with the NaN-guard skipping
    100% of updates (observed: the d512 STMAR temporal-attention
    runaway, experiments/artifacts/mar_nan_forensic_r5.json). lr=1e12
    detonates the params on step 1; every later step is skipped."""
    root, data, cfg_path, split_path, domain = synth_env
    from hma_tpu.train.trainer import TrainArgs, run_training

    args = TrainArgs(
        genie_config=str(cfg_path), output_dir=str(tmp_path / "nanrun"),
        train_split=str(split_path), data_root=str(data),
        model_type="discrete", window_size=4,
        per_device_train_batch_size=4, learning_rate=1e12,
        weight_decay=0.0,  # one 1e12-scale update detonates the params
        max_train_steps=60, eval_every_n_steps=1000, max_eval_steps=1,
        checkpointing_steps="1000", num_warmup_steps=0, log_every=1,
        max_nan_skip_steps=10, overfit_first_batch=True)
    with pytest.raises(RuntimeError, match="non-finite gradients"):
        run_training(args)
