"""GenieSimulator interactive-loop tests."""

import jax
import jax.numpy as jnp
import numpy as np

from hma_tpu.config import GenieConfig
from hma_tpu.models.st_mask_git import STMaskGIT
from hma_tpu.sim.main import InteractiveDigitalWorld
from hma_tpu.sim.simulator import GenieSimulator, ReplaySimulator


def make_sim(decode=None):
    cfg = GenieConfig(num_layers=1, num_heads=2, d_model=32, T=4, S=16,
                      image_vocab_size=2**18, num_factored_vocabs=2,
                      action_token_size=8, action_network="concat+modulate",
                      num_prompt_frames=2, use_actions=True,
                      action_domains=["a"], d_actions=[2],
                      action_stats=[[[0.0, 0.0], [1.0, 1.0]]])
    model = STMaskGIT(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.image_vocab_size, (1, cfg.T, cfg.S)), jnp.int32)
    actions = jnp.asarray(rng.normal(size=(1, cfg.T, cfg.max_d_action)), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        tokens, tokens, actions, jnp.asarray(0))
    return GenieSimulator(model, params, prompt_horizon=3,
                          maskgit_steps=2, decode_tokens=decode), cfg


def test_sim_step_and_roll():
    sim, cfg = make_sim()
    rng = np.random.default_rng(1)
    frames = rng.integers(0, cfg.image_vocab_size, (3, 4, 4)).astype(np.int32)
    sim.set_initial_state(frames)
    f0 = sim.reset()
    np.testing.assert_array_equal(f0, frames[-1])

    out1 = sim.step(np.asarray([0.05, 0.0]))
    assert out1.shape == (4, 4)
    assert int(out1.max()) < cfg.image_vocab_size
    # cache rolled: last cache frame is the generated one
    np.testing.assert_array_equal(sim._token_cache[-1], out1)
    np.testing.assert_array_equal(sim._token_cache[0], frames[1])

    out2 = sim.step(np.asarray([0.0, -0.05]))
    assert not np.array_equal(out1, out2) or True  # model may repeat, just run
    stats = sim.measure_step_time()
    assert stats["n"] == 2 and stats["p50_ms"] > 0


def test_interactive_world_driver(tmp_path):
    sim, cfg = make_sim()
    rng = np.random.default_rng(2)
    sim.set_initial_state(
        rng.integers(0, cfg.image_vocab_size, (3, 4, 4)).astype(np.int32))
    world = InteractiveDigitalWorld(sim, save_dir=str(tmp_path / "vid"))
    stats = world.run(3)
    assert stats["n"] == 3
    saved = np.load(tmp_path / "vid" / "frames.npy")
    assert saved.shape == (4, 4, 4)


def make_mar_sim(decode_latents=None, **kw):
    from hma_tpu.config import DiffusionGenieConfig
    from hma_tpu.models.st_mar import STMAR

    cfg = DiffusionGenieConfig(
        num_layers=2, num_heads=2, d_model=32, T=4, S=16,
        image_vocab_size=2**18, num_factored_vocabs=2,
        vae_embed_dim=4, patch_size=1, diffloss_d=1, diffloss_w=32,
        num_sampling_steps="5", maskgit_steps=2,
        action_token_size=8, action_network="concat+modulate",
        use_actions=True, action_domains=["a"], d_actions=[2],
        action_stats=[[[0.0, 0.0], [1.0, 1.0]]])
    model = STMAR(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(1, cfg.T, cfg.h, cfg.h, 4)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(1, cfg.T, cfg.h, cfg.h)) < 0.5, jnp.int32)
    actions = jnp.asarray(rng.normal(size=(1, cfg.T, cfg.max_d_action)), jnp.float32)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1),
         "action_drop": jax.random.PRNGKey(2)},
        lat, lat, actions, jnp.asarray(0), mask)
    return GenieSimulator(model, params, prompt_horizon=3, maskgit_steps=2,
                          decode_latents=decode_latents, **kw), cfg


def test_sim_stmar_backbone_step_and_roll():
    """Continuous (STMAR) backbone, like the reference's shipped langtable
    demo (reference: sim/simulator.py:135-170, sim/app.py:25-34)."""
    sim, cfg = make_mar_sim()
    assert sim.backbone == "stmar"
    rng = np.random.default_rng(1)
    frames = rng.normal(size=(3, cfg.h, cfg.h, 4)).astype(np.float32)
    sim.set_initial_state(frames)
    f0 = sim.reset()
    np.testing.assert_array_equal(f0, frames[-1])

    out1 = sim.step(np.asarray([0.05, 0.0]))
    assert out1.shape == (cfg.h, cfg.h, 4)
    assert np.isfinite(out1).all()
    np.testing.assert_array_equal(sim._token_cache[-1], out1)
    np.testing.assert_array_equal(sim._token_cache[0], frames[1])

    out2 = sim.step(np.asarray([0.0, -0.05]))
    assert np.isfinite(out2).all()
    stats = sim.measure_step_time()
    assert stats["n"] == 2 and stats["p50_ms"] > 0


class _ConstPhysics(ReplaySimulator):
    """Physics stub returning a fixed uint8 image every step."""

    def __init__(self, img):
        super().__init__(np.stack([img] * 100))


def _fake_decode_tokens(tokens):
    """(N, h, w) int -> (N, h, w, 3) uint8 deterministic pseudo-pixels."""
    t = np.asarray(tokens) % 251
    return np.stack([t, (t * 3) % 256, (t * 7) % 256], axis=-1).astype(np.uint8)


def test_sim_interactive_delta_psnr():
    """Interactive ΔPSNR controllability probe
    (reference: sim/simulator.py:309-357)."""
    sim, cfg = make_sim(decode=_fake_decode_tokens)
    gt_img = _fake_decode_tokens(np.zeros((1, 4, 4), np.int32))[0]
    sim.physics = _ConstPhysics(gt_img)
    sim.compute_delta_psnr = True
    sim.average_delta_psnr_over = 2
    rng = np.random.default_rng(1)
    sim.set_initial_state(
        rng.integers(0, cfg.image_vocab_size, (3, 4, 4)).astype(np.int32))
    out = sim.step(np.asarray([0.05, 0.0]))
    assert out.shape == (4, 4, 3) and out.dtype == np.uint8
    stats = sim.measure_step_time()
    assert "psnr_vs_physics" in stats and np.isfinite(stats["psnr_vs_physics"])
    assert "delta_psnr" in stats and np.isfinite(stats["delta_psnr"])


def test_replay_simulator():
    frames = np.arange(5 * 2 * 2).reshape(5, 2, 2)
    sim = ReplaySimulator(frames)
    np.testing.assert_array_equal(sim.reset(), frames[0])
    np.testing.assert_array_equal(sim.step(), frames[0])
    np.testing.assert_array_equal(sim.step(), frames[1])


def test_app_latent_decoder_contract(monkeypatch, tmp_path):
    """sim/app._make_latent_decoder must honor the GenieSimulator decoder
    contract: (N, h, w, C) x SVD_SCALE -> (N, H, W, 3) uint8 (regression:
    it used to add two batch dims and return a single unbatched image,
    crashing the STMAR demo's first frame)."""
    import numpy as np

    import hma_tpu.sim.app as app_mod
    import hma_tpu.tokenizer.svd_vae as svd_mod

    class StubVAE:
        def decode(self):  # placeholder so `method=StubVAE.decode` resolves
            pass

        def apply(self, params, z, method=None):
            B, N, h, w, C = z.shape  # the real decoder unpacks 5-D
            import jax.numpy as jnp

            return jnp.zeros((B, N, h * 8, w * 8, 3), jnp.float32)

    monkeypatch.setattr(svd_mod, "SVDTemporalVAE", StubVAE)
    monkeypatch.setattr(svd_mod, "load_svd_vae_torch_weights", lambda sd: {})
    import torch

    monkeypatch.setattr(torch, "load", lambda *a, **k: {})
    dec = app_mod._make_latent_decoder(str(tmp_path / "fake.pt"))
    out = dec(np.random.default_rng(0).normal(size=(3, 4, 4, 4)).astype(np.float32))
    assert out.shape == (3, 32, 32, 3) and out.dtype == np.uint8
