"""End-to-end pixel-fidelity machinery on reference-torch checkpoint fixtures.

BASELINE.md's fidelity targets (token-exact decode, PSNR/dPSNR on
kaist/langtable) need the released magvit2.ckpt, which is not bundled in
this image. These tests pre-verify the *entire* machinery on a
checkpoint fixture generated with the actual reference torch modules
(random weights, lightning `{"state_dict": ...}` layout as saved by
external/magvit2's trainer):

  torch ckpt file -> `load_magvit2` import -> `make_token_decoder`
  -> bit-compatible pixels vs the reference torch decode pipeline
  (LFQ.get_codebook_entry(...).flip(1) -> Decoder, as in
  datasets/utils.py:118-132), and

  reference-torch-ENCODED token dataset -> train -> evaluate.py
  (--tokenizer_ckpt pixel metrics: PSNR/SSIM/dPSNR,
  hma/evaluate.py:314-401) -> generate.py -> visualize.py (GIF + comic).

With the real magvit2.ckpt the same code path runs unchanged — the
checkpoint is a drop-in (its architecture is the default VQConfig, so no
sidecar json is even needed).

Skipped when the reference tree or torch is unavailable.
"""

import json
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from hma_tpu.tokenizer.magvit2 import VQConfig

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree unavailable")


def _torch_modules():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from external.magvit2.config import VQConfig as TorchVQConfig
    from external.magvit2.modules.diffusionmodules.improved_model import (
        Decoder as TorchDecoder,
        Encoder as TorchEncoder,
    )
    from external.magvit2.modules.vqvae.lookup_free_quantize import (
        LFQ as TorchLFQ,
    )
    return torch, TorchVQConfig, TorchEncoder, TorchDecoder, TorchLFQ


@pytest.fixture(scope="module")
def fixture_ckpt(tmp_path_factory):
    """Reference-torch tokenizer checkpoint file + its torch oracle."""
    torch, TorchVQConfig, TorchEncoder, TorchDecoder, TorchLFQ = _torch_modules()
    root = tmp_path_factory.mktemp("tok")

    tcfg = TorchVQConfig(base_channels=32, ch_mult=(1, 2), num_res_blocks=1)
    torch.manual_seed(0)
    tenc, tdec, tlfq = TorchEncoder(tcfg), TorchDecoder(tcfg), TorchLFQ(tcfg)
    tenc.eval(), tdec.eval(), tlfq.eval()

    sd = {f"encoder.{k}": v for k, v in tenc.state_dict().items()}
    sd |= {f"decoder.{k}": v for k, v in tdec.state_dict().items()}
    ckpt = root / "magvit2_fixture.ckpt"
    torch.save({"state_dict": sd}, str(ckpt))
    # non-default architecture -> ship the sidecar config
    VQConfig(base_channels=32, ch_mult=(1, 2),
             num_res_blocks=1).save_pretrained(str(ckpt) + ".json")
    return torch, ckpt, tenc, tdec, tlfq


def _torch_decode_tokens(torch, tdec, tlfq, tokens):
    """The reference decode pipeline: indices -> codebook entries (with
    the .flip(1) quirk) -> Decoder -> uint8 (datasets/utils.py:118-132)."""
    n, h, w = tokens.shape
    with torch.no_grad():
        quant = tlfq.get_codebook_entry(
            torch.from_numpy(tokens.reshape(n, h * w).astype(np.int64)),
            bhwc=(n, h, w, 18)).flip(1)
        img = tdec(quant).permute(0, 2, 3, 1).numpy()
    return np.clip((img + 1.0) * 127.5, 0, 255).astype(np.uint8)


def _torch_encode_frames(torch, tenc, tlfq, frames_uint8):
    """Reference encode: uint8 -> [-1,1] -> Encoder -> LFQ(flip=True)."""
    x = frames_uint8.astype(np.float32) / 127.5 - 1.0
    with torch.no_grad():
        z = tenc(torch.from_numpy(x).permute(0, 3, 1, 2))
        _, _, idx = tlfq(z, return_loss=False, flip=True)
    n = len(frames_uint8)
    side = frames_uint8.shape[1] // 2  # ch_mult (1,2) halves resolution
    return idx.reshape(n, side, side).numpy().astype(np.uint32)


def test_checkpoint_file_token_exact_decode(fixture_ckpt):
    """Importing the torch checkpoint *file* and decoding a token grid
    must match the reference torch pipeline pixel-for-pixel (the
    'token-exact decode' BASELINE row, run on a random-weight fixture)."""
    torch, ckpt, _, tdec, tlfq = fixture_ckpt
    from hma_tpu.rollout.decode import make_token_decoder
    from hma_tpu.tokenizer.convert import load_magvit2

    params, vqcfg = load_magvit2(str(ckpt))
    assert vqcfg.base_channels == 32 and vqcfg.ch_mult == (1, 2)

    rng = np.random.default_rng(3)
    tokens = rng.integers(0, 2**18, size=(6, 4, 4)).astype(np.uint32)

    ours = make_token_decoder(params, vqcfg, batch_size=4,
                              dtype=jnp.float32)(tokens)
    oracle = _torch_decode_tokens(torch, tdec, tlfq, tokens)
    assert ours.shape == oracle.shape == (6, 8, 8, 3)
    diff = np.abs(ours.astype(np.int32) - oracle.astype(np.int32))
    # fp32 conv reassociation can flip a post-quantization pixel by 1
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.99


def test_eval_generate_visualize_with_fixture_ckpt(fixture_ckpt, tmp_path):
    """Full fidelity chain on torch-encoded data: evaluate.py's pixel
    metrics (PSNR/SSIM/dPSNR) and visualize.py's GIF/comic rendering all
    run off the imported checkpoint file."""
    torch, ckpt, tenc, _, tlfq = fixture_ckpt
    from hma_tpu.config import GenieConfig
    from hma_tpu.data.datasets import write_token_dataset
    from hma_tpu.evaluate import main as eval_main
    from hma_tpu.generate import main as generate_main
    from hma_tpu.train.trainer import TrainArgs, run_training
    from hma_tpu.visualize import main as visualize_main

    rng = np.random.default_rng(0)
    domain = "language_table"
    data = tmp_path / "data"
    for split, n in [("train", 60), ("val", 40)]:
        frames = rng.integers(0, 256, size=(n, 8, 8, 3)).astype(np.uint8)
        video = _torch_encode_frames(torch, tenc, tlfq, frames)
        segs = np.repeat(np.arange(n // 10), 10).astype(np.int32)
        actions = rng.normal(size=(n, 2)).astype(np.float32)
        write_token_dataset(data / f"{domain}_magvit_max1000000_{split}",
                            video, segs, actions,
                            {"name": domain, "vocab_size": 2**18, "s": 16})
        if split == "val":  # raw-image twin of the val split
            write_token_dataset(data / f"{domain}_image_max1000000_val",
                                frames, segs, actions,
                                {"name": domain, "h": 8, "w": 8})

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
        "--batch_size", "4", "--max_examples", "4", "--maskgit_steps", "2",
        "--tokenizer_ckpt", str(ckpt), "--num_action_trials", "2",
    ])
    for key in ("psnr", "ssim", "delta_psnr", "dec_time"):
        assert key in out and np.isfinite(out[key]), (key, out)
    # random-weight 2-step model: PSNR must still be a sane pixel number
    assert 0.0 < out["psnr"] < 60.0

    # raw-image val dir (on-the-fly tokenization, raw frames as pixel GT)
    # + autoregressive-time eval + prediction dumps, in one pass
    # (reference: evaluate.py:79-82,287-305,333 and :70-77)
    out_ar = eval_main([
        "--checkpoint_dir", str(tmp_path / "run"),
        "--val_data_dir", str(data / f"{domain}_image_max1000000_val"),
        "--output_dir", str(tmp_path / "eval_ar"),
        "--batch_size", "4", "--max_examples", "4", "--maskgit_steps", "2",
        "--tokenizer_ckpt", str(ckpt), "--num_action_trials", "1",
        "--raw_image_data", "--autoregressive_time",
        "--num_prompt_frames", "2",
        "--save_outputs_dir", str(tmp_path / "dumps"),
    ])
    for key in ("loss", "acc", "psnr", "delta_psnr"):
        assert key in out_ar and np.isfinite(out_ar[key]), (key, out_ar)
    dumps = list((tmp_path / "dumps").iterdir())
    assert any(p.name.startswith("pred_") for p in dumps), dumps
    pred0 = np.load(tmp_path / "dumps" / "pred_0_r0.npy")
    assert pred0.shape == (4, 3, 16)  # (B, T-1, S)

    gen_out = tmp_path / "genout"
    generate_main([
        "--checkpoint_dir", str(tmp_path / "run"),
        "--val_data_dir", str(data / f"{domain}_magvit_max1000000_val"),
        "--output_dir", str(gen_out),
        "--batch_size", "2", "--num_prompt_frames", "2",
        "--maskgit_steps", "2",
    ])
    visualize_main([
        "--token_dir", str(gen_out),
        "--output_dir", str(tmp_path / "vis"),
        "--tokenizer_ckpt", str(ckpt),
        "--max_examples", "2",
    ])
    vis = list((tmp_path / "vis").iterdir())
    assert any(p.suffix == ".gif" for p in vis), vis
    assert any(p.suffix == ".png" for p in vis), vis
