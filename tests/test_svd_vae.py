"""SVD temporal VAE shape tests (weights are imported, not trained here)."""

import jax
import jax.numpy as jnp
import numpy as np

from hma_tpu.tokenizer.svd_vae import SVDEncoder, SVDTemporalVAE, TemporalDecoder


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
    vae = SVDTemporalVAE.__new__(SVDTemporalVAE)  # avoid big default widths
    import hma_tpu.tokenizer.svd_vae as sv

    class SmallVAE(sv.SVDTemporalVAE):
        def setup(self):
            self.encoder = sv.SVDEncoder(block_out=(16, 16, 32, 32), name="encoder")
            self.decoder = sv.TemporalDecoder(block_out=(16, 16, 32, 32), name="decoder")

    model = SmallVAE()
    x = jnp.zeros((2, 32, 32, 3))  # 2 frames as batch
    params = model.init(jax.random.PRNGKey(0), x, num_frames=2)
    out = model.apply(params, x, num_frames=2)
    assert out.shape == (1, 2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
