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


def test_replay_simulator():
    frames = np.arange(5 * 2 * 2).reshape(5, 2, 2)
    sim = ReplaySimulator(frames)
    np.testing.assert_array_equal(sim.reset(), frames[0])
    np.testing.assert_array_equal(sim.step(), frames[0])
    np.testing.assert_array_equal(sim.step(), frames[1])
