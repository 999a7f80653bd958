"""Tokenizer tests: LFQ bit conventions + torch->flax conv parity.

The parity test instantiates the *reference* torch modules (read-only
oracle at /root/reference) with random weights, imports them through the
converter, and requires matching outputs — the strongest possible check
that decode will be token-exact once the real magvit2.ckpt is supplied.
Skipped when the reference tree or torch is unavailable.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hma_tpu.tokenizer.lfq import (
    bits_to_indices,
    codes_to_latents,
    indices_to_bits,
    lfq_quantize,
)
from hma_tpu.tokenizer.magvit2 import Decoder, Encoder, VQConfig, VQModel, depth_to_space
from hma_tpu.tokenizer.convert import torch_state_dict_to_flax

REF = "/root/reference"


def small_cfg():
    return VQConfig(base_channels=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=18)


def test_lfq_roundtrip():
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(2, 4, 4, 18)), jnp.float32)
    res = lfq_quantize(z)
    assert res.indices.shape == (2, 4, 4)
    back = codes_to_latents(res.indices, 18, jnp.float32)
    np.testing.assert_array_equal(np.asarray(back), np.sign(np.asarray(z)))
    # little-endian: channel k is bit k
    one_hot = jnp.zeros((1, 1, 1, 18)).at[0, 0, 0, 3].set(1.0) - 0.5
    r = lfq_quantize(one_hot)
    assert int(r.indices[0, 0, 0]) == 2**3
    bits = indices_to_bits(jnp.asarray([5]), 18)
    np.testing.assert_array_equal(np.asarray(bits[0, :4]), [True, False, True, False])
    assert int(bits_to_indices(bits)[0]) == 5


def test_lfq_entropy_losses_finite():
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=(2, 8, 8, 18)) * 0.1, jnp.float32)
    res = lfq_quantize(z, compute_losses=True)
    assert np.isfinite(float(res.entropy_loss))
    assert float(res.commit_loss) > 0
    # straight-through: gradient of sum(quantized) wrt z is ones
    g = jax.grad(lambda z: jnp.sum(lfq_quantize(z).quantized))(z)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_depth_to_space_matches_reference_layout():
    # DCR: channel index = (i*bs + j)*cout + k maps to spatial (i, j)
    B, H, W, s, cout = 1, 2, 2, 2, 3
    x = np.arange(B * H * W * s * s * cout, dtype=np.float32).reshape(B, H, W, s * s * cout)
    out = np.asarray(depth_to_space(jnp.asarray(x), s))
    assert out.shape == (B, H * s, W * s, cout)
    # torch oracle if available
    torch = pytest.importorskip("torch")
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    c = s * s * cout
    v = xt.reshape(B, s, s, cout, H, W).permute(0, 3, 4, 1, 5, 2).reshape(B, cout, H * s, W * s)
    np.testing.assert_array_equal(out, v.permute(0, 2, 3, 1).numpy())


def test_vqmodel_shapes():
    cfg = small_cfg()
    model = VQModel(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    recon, res = model.apply(params, x)
    assert recon.shape == (1, 32, 32, 3)
    assert res.indices.shape == (1, 16, 16)  # /2 downsampling with ch_mult len 2
    dec = model.apply(params, res.indices, method=VQModel.decode_code)
    assert dec.shape == (1, 32, 32, 3)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree unavailable")
def test_encoder_decoder_parity_with_reference_torch():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from external.magvit2.config import VQConfig as TorchVQConfig
    from external.magvit2.modules.diffusionmodules.improved_model import (
        Decoder as TorchDecoder,
        Encoder as TorchEncoder,
    )

    tcfg = TorchVQConfig(base_channels=32, ch_mult=(1, 2), num_res_blocks=1)
    torch.manual_seed(0)
    tenc, tdec = TorchEncoder(tcfg), TorchDecoder(tcfg)
    tenc.eval(), tdec.eval()

    sd = {f"encoder.{k}": v.detach().numpy() for k, v in tenc.state_dict().items()}
    sd |= {f"decoder.{k}": v.detach().numpy() for k, v in tdec.state_dict().items()}
    params = torch_state_dict_to_flax(sd, use_ema=False)

    cfg = small_cfg()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        z_t = tenc(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    z_f = Encoder(cfg, dtype=jnp.float32).apply(
        {"params": params["params"]["encoder"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(z_f), z_t, atol=2e-4, rtol=2e-4)

    q = np.sign(z_t).astype(np.float32)
    with torch.no_grad():
        img_t = tdec(torch.from_numpy(q).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    img_f = Decoder(cfg, dtype=jnp.float32).apply(
        {"params": params["params"]["decoder"]}, jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(img_f), img_t, atol=2e-4, rtol=2e-4)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree unavailable")
def test_token_exact_roundtrip_vs_reference_lfq():
    """Our little-endian tokens must match the reference's flip=True encode
    and .flip(1) decode conventions bit-exactly."""
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from external.magvit2.config import VQConfig as TorchVQConfig
    from external.magvit2.modules.vqvae.lookup_free_quantize import LFQ as TorchLFQ

    tlfq = TorchLFQ(TorchVQConfig())
    tlfq.eval()
    rng = np.random.default_rng(2)
    z = rng.normal(size=(1, 18, 4, 4)).astype(np.float32)  # NCHW

    with torch.no_grad():
        _, _, idx_t = tlfq(torch.from_numpy(z), return_loss=False, flip=True)
    idx_t = idx_t.reshape(4, 4).numpy()

    res = lfq_quantize(jnp.asarray(np.transpose(z, (0, 2, 3, 1))))
    np.testing.assert_array_equal(np.asarray(res.indices[0]), idx_t)

    # decode convention: reference get_codebook_entry(...).flip(1) == ours
    with torch.no_grad():
        quant_t = tlfq.get_codebook_entry(
            torch.from_numpy(idx_t.reshape(1, 16).astype(np.int64)),
            bhwc=(1, 4, 4, 18)).flip(1).numpy()  # (B, C, H, W)
    ours = codes_to_latents(jnp.asarray(idx_t[None]), 18, jnp.float32)  # (B, H, W, C)
    np.testing.assert_array_equal(np.transpose(np.asarray(ours), (0, 3, 1, 2)), quant_t)
