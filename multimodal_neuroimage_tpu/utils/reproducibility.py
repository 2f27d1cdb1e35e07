"""Reproducibility helpers.

The reference seeds torch/numpy globally and enables cudnn.benchmark
(reference utils.py:134-142). JAX is functionally seeded — every stochastic
op takes an explicit PRNGKey — so "reproducibility" here means deriving all
keys from one root seed and keeping host-side rngs counter-based.
"""

from __future__ import annotations

import numpy as np

REFERENCE_SEED = 55555555  # reference main.py:53


def host_rng(seed: int, *stream: int) -> np.random.Generator:
    """Counter-based host rng: same (seed, stream...) -> same stream on every
    host, which is what keeps multi-host batch permutations in lockstep
    (data/loader.py epoch shuffling)."""
    return np.random.default_rng((seed, *stream))


def root_key(seed: int = REFERENCE_SEED):
    import jax
    return jax.random.PRNGKey(seed)
