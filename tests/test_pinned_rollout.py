"""Golden-token regression fixture.

Greedy MaskGIT decoding with fixed params/seed must be bit-stable across
refactors (the SURVEY §4 "golden parity" strategy, applied to our own
sampling semantics since the reference's pretrained tokens need its
checkpoint). The fixture regenerates with REGEN=1.
"""

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from hma_tpu.config import GenieConfig
from hma_tpu.models.st_mask_git import STMaskGIT
from hma_tpu.rollout.maskgit import generate_tokens

GOLDEN = Path(__file__).parent / "golden" / "rollout_tokens.npy"


def setup():
    cfg = GenieConfig(num_layers=2, num_heads=2, d_model=32, T=4, S=16,
                      image_vocab_size=2**18, num_factored_vocabs=2,
                      action_token_size=8, action_network="concat+modulate",
                      num_prompt_frames=2, use_actions=True,
                      action_domains=["a"], d_actions=[4],
                      action_stats=[[[0.0, 0.0], [1.0, 1.0]]])
    model = STMaskGIT(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1234)
    tokens = jnp.asarray(rng.integers(0, cfg.image_vocab_size, (2, cfg.T, cfg.S)), jnp.int32)
    actions = jnp.asarray(rng.normal(size=(2, cfg.T, cfg.max_d_action)), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(42)},
                        tokens, tokens, actions, jnp.asarray(0))
    return cfg, model, params, tokens, actions


def test_greedy_rollout_is_bit_stable():
    cfg, model, params, tokens, actions = setup()
    out = np.asarray(generate_tokens(
        model, params, tokens, 2, actions, jnp.asarray(0),
        jax.random.PRNGKey(7), maskgit_steps=2, temperature=0.0,
        unmask_mode="greedy"))
    if os.environ.get("REGEN") == "1" or not GOLDEN.exists():
        GOLDEN.parent.mkdir(exist_ok=True)
        np.save(GOLDEN, out)
    golden = np.load(GOLDEN)
    np.testing.assert_array_equal(out, golden)
