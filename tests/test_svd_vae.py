"""SVD temporal VAE: shape tests + torch-parity for the weight importer.

The parity test builds a torch oracle of diffusers'
AutoencoderKLTemporalDecoder (diffusers itself is not in this image;
the oracle mirrors its published architecture and produces a state_dict
with the exact diffusers key layout the reference checkpoint has —
reference: datasets/utils.py:7,22), converts it through
`load_svd_vae_torch_weights`, and checks encode/decode agree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hma_tpu.tokenizer.svd_vae import (
    SVDEncoder,
    SVDTemporalVAE,
    TemporalDecoder,
    load_svd_vae_torch_weights,
)


def test_encoder_shapes():
    enc = SVDEncoder(block_out=(32, 32, 64, 64))
    x = jnp.zeros((2, 64, 64, 3))
    params = enc.init(jax.random.PRNGKey(0), x)
    z = enc.apply(params, x)
    assert z.shape == (2, 8, 8, 4)  # /8 spatial, 4 latent channels


def test_temporal_decoder_shapes():
    dec = TemporalDecoder(block_out=(16, 16, 32, 32))
    z = jnp.zeros((1, 3, 8, 8, 4))
    params = dec.init(jax.random.PRNGKey(0), z)
    img = dec.apply(params, z)
    assert img.shape == (1, 3, 64, 64, 3)


def test_vae_roundtrip_runs():
    model = SVDTemporalVAE(block_out=(16, 16, 32, 32))
    x = jnp.zeros((2, 32, 32, 3))  # 2 frames as batch
    params = model.init(jax.random.PRNGKey(0), x, num_frames=2)
    out = model.apply(params, x, num_frames=2)
    assert out.shape == (1, 2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# torch oracle of diffusers AutoencoderKLTemporalDecoder (key-layout exact)
# ---------------------------------------------------------------------------


def _build_torch_oracle(block_out, latent_channels=4):
    import torch
    from torch import nn

    def gn(c):
        return nn.GroupNorm(min(32, c), c, eps=1e-6)

    class ResnetBlock2D(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.norm1 = gn(cin)
            self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
            self.norm2 = gn(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
            self.conv_shortcut = (nn.Conv2d(cin, cout, 1)
                                  if cin != cout else None)

        def forward(self, x):
            h = self.conv1(nn.functional.silu(self.norm1(x)))
            h = self.conv2(nn.functional.silu(self.norm2(h)))
            sc = self.conv_shortcut(x) if self.conv_shortcut else x
            return sc + h

    class Attention(nn.Module):
        """Single-head VAE attention (residual, 1/sqrt(C) scale)."""

        def __init__(self, c):
            super().__init__()
            self.group_norm = gn(c)
            self.to_q = nn.Linear(c, c)
            self.to_k = nn.Linear(c, c)
            self.to_v = nn.Linear(c, c)
            self.to_out = nn.ModuleList([nn.Linear(c, c)])

        def forward(self, x):  # (B, C, H, W)
            B, C, H, W = x.shape
            h = self.group_norm(x).reshape(B, C, H * W).transpose(1, 2)
            q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
            attn = torch.softmax(q @ k.transpose(1, 2) / C**0.5, dim=-1)
            out = self.to_out[0](attn @ v)
            return x + out.transpose(1, 2).reshape(B, C, H, W)

    class Downsample2D(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)

        def forward(self, x):
            return self.conv(nn.functional.pad(x, (0, 1, 0, 1)))

    class DownEncoderBlock2D(nn.Module):
        def __init__(self, cin, cout, downsample):
            super().__init__()
            self.resnets = nn.ModuleList(
                [ResnetBlock2D(cin, cout), ResnetBlock2D(cout, cout)])
            if downsample:
                self.downsamplers = nn.ModuleList([Downsample2D(cout)])
            else:
                self.downsamplers = None

        def forward(self, x):
            for r in self.resnets:
                x = r(x)
            if self.downsamplers:
                x = self.downsamplers[0](x)
            return x

    class MidBlock2D(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.resnets = nn.ModuleList([ResnetBlock2D(c, c),
                                          ResnetBlock2D(c, c)])
            self.attentions = nn.ModuleList([Attention(c)])

        def forward(self, x):
            x = self.resnets[0](x)
            x = self.attentions[0](x)
            return self.resnets[1](x)

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_in = nn.Conv2d(3, block_out[0], 3, padding=1)
            blocks = []
            cin = block_out[0]
            for i, cout in enumerate(block_out):
                blocks.append(DownEncoderBlock2D(
                    cin, cout, downsample=i < len(block_out) - 1))
                cin = cout
            self.down_blocks = nn.ModuleList(blocks)
            self.mid_block = MidBlock2D(block_out[-1])
            self.conv_norm_out = gn(block_out[-1])
            self.conv_out = nn.Conv2d(block_out[-1], 2 * latent_channels, 3,
                                      padding=1)

        def forward(self, x):
            x = self.conv_in(x)
            for b in self.down_blocks:
                x = b(x)
            x = self.mid_block(x)
            return self.conv_out(nn.functional.silu(self.conv_norm_out(x)))

    class TemporalResnetBlock(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.norm1 = gn(cin)
            self.conv1 = nn.Conv3d(cin, cout, (3, 1, 1), padding=(1, 0, 0))
            self.norm2 = gn(cout)
            self.conv2 = nn.Conv3d(cout, cout, (3, 1, 1), padding=(1, 0, 0))

        def forward(self, x):  # (B, C, T, H, W)
            h = self.conv1(nn.functional.silu(self.norm1(x)))
            h = self.conv2(nn.functional.silu(self.norm2(h)))
            return x + h

    class AlphaBlender(nn.Module):
        def __init__(self):
            super().__init__()
            self.mix_factor = nn.Parameter(torch.tensor([0.5]))

        def forward(self, spatial, temporal):
            a = torch.sigmoid(self.mix_factor)[0]
            return a * spatial + (1 - a) * temporal

    class SpatioTemporalResBlock(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.spatial_res_block = ResnetBlock2D(cin, cout)
            self.temporal_res_block = TemporalResnetBlock(cout, cout)
            self.time_mixer = AlphaBlender()

        def forward(self, x, T):  # (B*T, C, H, W)
            s = self.spatial_res_block(x)
            BT, C, H, W = s.shape
            s5 = s.reshape(BT // T, T, C, H, W).permute(0, 2, 1, 3, 4)
            t5 = self.temporal_res_block(s5)
            out = self.time_mixer(s5, t5)
            return out.permute(0, 2, 1, 3, 4).reshape(BT, C, H, W)

    class MidBlockTemporalDecoder(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.resnets = nn.ModuleList([SpatioTemporalResBlock(c, c),
                                          SpatioTemporalResBlock(c, c)])
            self.attentions = nn.ModuleList([Attention(c)])

        def forward(self, x, T):
            x = self.resnets[0](x, T)
            x = self.attentions[0](x)
            return self.resnets[1](x, T)

    class Upsample2D(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = nn.Conv2d(c, c, 3, padding=1)

        def forward(self, x):
            return self.conv(nn.functional.interpolate(x, scale_factor=2.0,
                                                       mode="nearest"))

    class UpBlockTemporalDecoder(nn.Module):
        def __init__(self, cin, cout, upsample):
            super().__init__()
            self.resnets = nn.ModuleList(
                [SpatioTemporalResBlock(cin, cout),
                 SpatioTemporalResBlock(cout, cout),
                 SpatioTemporalResBlock(cout, cout)])
            self.upsamplers = (nn.ModuleList([Upsample2D(cout)])
                               if upsample else None)

        def forward(self, x, T):
            for r in self.resnets:
                x = r(x, T)
            if self.upsamplers:
                x = self.upsamplers[0](x)
            return x

    class TemporalDecoderT(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_in = nn.Conv2d(latent_channels, block_out[-1], 3,
                                     padding=1)
            self.mid_block = MidBlockTemporalDecoder(block_out[-1])
            rev = list(reversed(block_out))
            blocks = []
            cin = block_out[-1]
            for i, cout in enumerate(rev):
                blocks.append(UpBlockTemporalDecoder(
                    cin, cout, upsample=i < len(rev) - 1))
                cin = cout
            self.up_blocks = nn.ModuleList(blocks)
            self.conv_norm_out = gn(block_out[0])
            self.conv_out = nn.Conv2d(block_out[0], 3, 3, padding=1)
            self.time_conv_out = nn.Conv3d(3, 3, (3, 1, 1), padding=(1, 0, 0))

        def forward(self, z, T):  # z: (B*T, 4, h, w)
            x = self.conv_in(z)
            x = self.mid_block(x, T)
            for b in self.up_blocks:
                x = b(x, T)
            x = self.conv_out(nn.functional.silu(self.conv_norm_out(x)))
            BT, C, H, W = x.shape
            x5 = x.reshape(BT // T, T, C, H, W).permute(0, 2, 1, 3, 4)
            return self.time_conv_out(x5)  # (B, 3, T, H, W)

    class Oracle(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Encoder()
            self.quant_conv = nn.Conv2d(2 * latent_channels,
                                        2 * latent_channels, 1)
            self.decoder = TemporalDecoderT()

    return Oracle()


def test_svd_vae_torch_weight_import_parity():
    torch = pytest.importorskip("torch")
    block_out = (32, 32)
    torch.manual_seed(0)
    oracle = _build_torch_oracle(block_out).eval()
    sd = oracle.state_dict()

    params = load_svd_vae_torch_weights(sd, block_out=block_out)
    model = SVDTemporalVAE(block_out=block_out)

    rng = np.random.default_rng(0)
    B, T, H = 1, 3, 16
    x = rng.normal(size=(B * T, H, H, 3)).astype(np.float32)

    # encode parity
    with torch.no_grad():
        zq_t = oracle.quant_conv(oracle.encoder(
            torch.from_numpy(x).permute(0, 3, 1, 2)))
        mean_t = zq_t[:, :4].permute(0, 2, 3, 1).numpy()
    mean_f = np.asarray(model.apply(params, jnp.asarray(x),
                                    method=SVDTemporalVAE.encode))
    np.testing.assert_allclose(mean_f, mean_t, rtol=2e-4, atol=2e-4)

    # decode parity
    z = rng.normal(size=(B, T, H // 2, H // 2, 4)).astype(np.float32)
    with torch.no_grad():
        img_t = oracle.decoder(
            torch.from_numpy(z.reshape(B * T, H // 2, H // 2, 4))
            .permute(0, 3, 1, 2), T)
        img_t = img_t.permute(0, 2, 3, 4, 1).numpy()  # (B, T, H, W, 3)
    img_f = np.asarray(model.apply(params, jnp.asarray(z),
                                   method=SVDTemporalVAE.decode))
    np.testing.assert_allclose(img_f, img_t, rtol=2e-4, atol=2e-4)


def test_svd_vae_import_strict_flags_leftovers():
    torch = pytest.importorskip("torch")
    block_out = (32, 32)
    torch.manual_seed(0)
    sd = _build_torch_oracle(block_out).state_dict()
    sd["decoder.bogus.weight"] = torch.zeros(1)
    with pytest.raises(KeyError):
        load_svd_vae_torch_weights(sd, block_out=block_out)


# ---------------------------------------------------------------------------
# Independent key-layout fixture: the parameter inventory of diffusers'
# AutoencoderKLTemporalDecoder, hand-derived from the diffusers source
# (models/autoencoders/autoencoder_kl_temporal_decoder.py + the shared
# vae.py Encoder, diffusers ~0.27 — the class the reference loads at
# datasets/utils.py:7,22). This is written from the *diffusers* layout
# rules, not from this repo's importer or the torch oracle above, so a
# shared misreading between oracle and port (the failure mode the oracle
# test cannot catch) has to also survive this inventory to pass.
# ---------------------------------------------------------------------------


def _diffusers_svd_vae_key_manifest(block_out, latent=4):
    """{torch key: shape} for AutoencoderKLTemporalDecoder.

    Layout rules encoded here: Encoder = DownEncoderBlock2D x len(block_out)
    with layers_per_block=2 resnets (conv_shortcut 1x1 only where channels
    change), downsamplers on all but the last block, UNetMidBlock2D with
    2 resnets around 1 attention (to_out is a ModuleList -> 'to_out.0'),
    double_z conv_out + 1x1 quant_conv, and NO post_quant_conv on this
    class. TemporalDecoder = MidBlockTemporalDecoder (2 SpatioTemporal
    resnets + attention) and UpBlockTemporalDecoder x len(block_out) over
    reversed(block_out) with layers_per_block+1 = 3 SpatioTemporalResBlocks
    each; every SpatioTemporalResBlock = spatial ResnetBlock2D + temporal
    TemporalResnetBlock ((3,1,1) Conv3d) + AlphaBlender 'time_mixer.mix_factor'
    of shape (1,); upsamplers on all but the last block; trailing
    conv_norm_out / conv_out / (3,1,1) time_conv_out. VAE blocks pass
    temb_channels=None so ResnetBlock2D has no time_emb_proj keys.
    """
    keys = {}

    def conv2d(p, cout, cin, k=3):
        keys[p + ".weight"] = (cout, cin, k, k)
        keys[p + ".bias"] = (cout,)

    def conv3d(p, cout, cin, k=(3, 1, 1)):
        keys[p + ".weight"] = (cout, cin, *k)
        keys[p + ".bias"] = (cout,)

    def norm(p, c):
        keys[p + ".weight"] = (c,)
        keys[p + ".bias"] = (c,)

    def linear(p, cout, cin):
        keys[p + ".weight"] = (cout, cin)
        keys[p + ".bias"] = (cout,)

    def res2d(p, cin, cout):
        norm(p + ".norm1", cin)
        conv2d(p + ".conv1", cout, cin)
        norm(p + ".norm2", cout)
        conv2d(p + ".conv2", cout, cout)
        if cin != cout:
            conv2d(p + ".conv_shortcut", cout, cin, k=1)

    def res3d(p, cin, cout):
        norm(p + ".norm1", cin)
        conv3d(p + ".conv1", cout, cin)
        norm(p + ".norm2", cout)
        conv3d(p + ".conv2", cout, cout)
        if cin != cout:
            conv3d(p + ".conv_shortcut", cout, cin, k=(1, 1, 1))

    def st_res(p, cin, cout):
        res2d(p + ".spatial_res_block", cin, cout)
        # the temporal block runs on the *spatial block's output*
        # (SpatioTemporalResBlock passes in_channels=out_channels), so it
        # is always cout->cout and never has a conv_shortcut
        res3d(p + ".temporal_res_block", cout, cout)
        keys[p + ".time_mixer.mix_factor"] = (1,)

    def attn(p, c):
        norm(p + ".group_norm", c)
        linear(p + ".to_q", c, c)
        linear(p + ".to_k", c, c)
        linear(p + ".to_v", c, c)
        linear(p + ".to_out.0", c, c)

    conv2d("encoder.conv_in", block_out[0], 3)
    cin = block_out[0]
    for i, cout in enumerate(block_out):
        res2d(f"encoder.down_blocks.{i}.resnets.0", cin, cout)
        res2d(f"encoder.down_blocks.{i}.resnets.1", cout, cout)
        if i < len(block_out) - 1:
            conv2d(f"encoder.down_blocks.{i}.downsamplers.0.conv", cout, cout)
        cin = cout
    c = block_out[-1]
    res2d("encoder.mid_block.resnets.0", c, c)
    attn("encoder.mid_block.attentions.0", c)
    res2d("encoder.mid_block.resnets.1", c, c)
    norm("encoder.conv_norm_out", c)
    conv2d("encoder.conv_out", 2 * latent, c)
    conv2d("quant_conv", 2 * latent, 2 * latent, k=1)

    conv2d("decoder.conv_in", block_out[-1], latent)
    st_res("decoder.mid_block.resnets.0", c, c)
    attn("decoder.mid_block.attentions.0", c)
    st_res("decoder.mid_block.resnets.1", c, c)
    prev = c
    for i, cout in enumerate(reversed(block_out)):
        for j in range(3):
            st_res(f"decoder.up_blocks.{i}.resnets.{j}",
                   prev if j == 0 else cout, cout)
        if i < len(block_out) - 1:
            conv2d(f"decoder.up_blocks.{i}.upsamplers.0.conv", cout, cout)
        prev = cout
    norm("decoder.conv_norm_out", block_out[0])
    conv2d("decoder.conv_out", 3, block_out[0])
    conv3d("decoder.time_conv_out", 3, 3)
    return keys


def test_diffusers_key_manifest_imports_exactly():
    """The importer must consume the hand-derived diffusers key inventory
    exactly (strict: any unconsumed key raises, any missing key raises)
    and produce precisely the parameter tree SVDTemporalVAE initializes —
    same channel-doubling pattern as the released (128, 256, 512, 512)
    checkpoint, so shortcut placement is exercised."""
    block_out = (32, 64, 128, 128)
    manifest = _diffusers_svd_vae_key_manifest(block_out)
    sd = {k: np.zeros(s, np.float32) for k, s in manifest.items()}
    params = load_svd_vae_torch_weights(sd, block_out=block_out, strict=True)

    model = SVDTemporalVAE(block_out=block_out)
    ref = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 32, 3), jnp.float32))
    got = jax.tree.map(lambda a: tuple(np.shape(a)), params)
    want = jax.tree.map(lambda a: tuple(a.shape), ref)
    assert got == want


def test_diffusers_key_manifest_matches_oracle_state_dict():
    """Cross-check the two independent renderings of the diffusers layout:
    the hand-built torch oracle's state_dict keys/shapes must equal the
    hand-derived manifest. Disagreement means at least one of them has
    drifted from diffusers."""
    torch = pytest.importorskip("torch")
    block_out = (32, 64)
    torch.manual_seed(0)
    sd = _build_torch_oracle(block_out).state_dict()
    manifest = _diffusers_svd_vae_key_manifest(block_out)
    assert set(sd) == set(manifest)
    for k, shape in manifest.items():
        assert tuple(sd[k].shape) == shape, (k, tuple(sd[k].shape), shape)
