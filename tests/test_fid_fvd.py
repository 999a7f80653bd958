"""FID/FVD math + backbone structure tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hma_tpu.metrics.fid import (
    InceptionV3FID,
    activation_statistics,
    fid_from_features,
    frechet_distance,
    load_inception_torch_weights,
)
from hma_tpu.metrics.fvd import InceptionI3D, calculate_fvd


def test_frechet_distance_identities():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(500, 8))
    mu, sigma = activation_statistics(feats)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-6)
    # known closed form: shifted identical gaussians -> ||dmu||^2
    d = frechet_distance(mu + 2.0, sigma, mu, sigma)
    assert d == pytest.approx(4.0 * len(mu), rel=1e-6)


def test_fid_from_features_discriminates():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(400, 16))
    b_close = a + rng.normal(scale=0.01, size=a.shape)
    b_far = rng.normal(loc=3.0, size=(400, 16))
    assert fid_from_features(a, b_close) < fid_from_features(a, b_far)


def test_inception_fid_shapes():
    model = InceptionV3FID()
    x = jnp.zeros((1, 299, 299, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x)
    assert feats.shape == (1, 2048)


def test_inception_converter_roundtrip():
    torch = pytest.importorskip("torch")
    sd = {
        "Conv2d_1a_3x3.conv.weight": torch.zeros(32, 3, 3, 3),
        "Conv2d_1a_3x3.bn.weight": torch.ones(32),
        "Conv2d_1a_3x3.bn.bias": torch.zeros(32),
        "Conv2d_1a_3x3.bn.running_mean": torch.zeros(32),
        "Conv2d_1a_3x3.bn.running_var": torch.ones(32),
    }
    p = load_inception_torch_weights({k: v.numpy() for k, v in sd.items()})
    assert p["params"]["Conv2d_1a_3x3"]["conv"]["kernel"].shape == (3, 3, 3, 32)
    assert p["batch_stats"]["Conv2d_1a_3x3"]["bn"]["mean"].shape == (32,)


def test_i3d_shapes_and_fvd():
    model = InceptionI3D()
    v = jnp.zeros((1, 10, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), v)
    feats = model.apply(params, v)
    assert feats.shape == (1, 1024)

    # FVD with a cheap embedding fn: identical sets -> ~0, different >> 0
    rng = np.random.default_rng(2)
    vids_a = rng.integers(0, 255, (24, 10, 8, 8, 3)).astype(np.uint8)
    vids_b = np.clip(vids_a.astype(int) + 120, 0, 255).astype(np.uint8)

    def embed(v):
        return v.reshape(len(v), -1).astype(np.float32).mean(axis=1, keepdims=True) \
            + v.reshape(len(v), -1)[:, :8].astype(np.float32)

    same = calculate_fvd(vids_a, vids_a.copy(), embed_fn=embed)
    diff = calculate_fvd(vids_a, vids_b, embed_fn=embed)
    assert same == pytest.approx(0.0, abs=1e-4)
    assert diff > same


def test_i3d_styleganv_backend():
    """The styleganv I3D variant: 400-d Kinetics logits endpoint +
    shorter-side resize / center crop (reference:
    fvd/styleganv/fvd.py:9-18,37-64)."""
    from hma_tpu.metrics.fvd import make_i3d_embed_fn

    model = InceptionI3D(num_classes=400)
    v = jnp.zeros((1, 10, 224, 224, 3))
    params = model.init(jax.random.PRNGKey(0), v)
    feats = model.apply(params, v)
    assert feats.shape == (1, 400)

    # non-square input exercises the shorter-side resize + center crop
    embed = make_i3d_embed_fn(params=params, backend="styleganv")
    rng = np.random.default_rng(3)
    vids = rng.integers(0, 255, (2, 10, 64, 96, 3)).astype(np.uint8)
    out = embed(vids)
    assert out.shape == (2, 400) and np.isfinite(out).all()

    fvd = calculate_fvd(vids, vids.copy(), embed_fn=embed)
    assert np.isfinite(fvd) and fvd == pytest.approx(0.0, abs=1e-3)


def test_i3d_logits_head_weight_import():
    """The logits Unit3D (conv3d with bias, no bn) converts from torch."""
    torch = pytest.importorskip("torch")
    from hma_tpu.metrics.fvd import load_i3d_torch_weights

    sd = {"logits.conv3d.weight": torch.randn(400, 1024, 1, 1, 1).numpy(),
          "logits.conv3d.bias": torch.randn(400).numpy()}
    p = load_i3d_torch_weights(sd)
    assert p["params"]["logits"]["conv3d"]["kernel"].shape == (1, 1, 1, 1024, 400)
    assert p["params"]["logits"]["conv3d"]["bias"].shape == (400,)
