"""Deterministic seeding across python/numpy/jax (reference analog:
transformers.set_seed / utils.set_seed calls, SURVEY §5.2)."""

import random

import numpy as np


def set_seed(seed: int):
    """Seed python and numpy globals; returns a jax PRNGKey for the rest."""
    import jax

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
