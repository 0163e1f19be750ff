"""Seeding and environment info (reference detectron2/utils/env.py:21-38)."""

from __future__ import annotations

import datetime
import logging
import os
import random
import sys

import numpy as np


def seed_all_rng(seed: int | None = None) -> int:
    """Seed python/numpy RNGs. Returns the seed used.

    JAX model randomness is handled separately through explicit PRNG keys
    derived from this seed; this seeds the host-side (data pipeline) RNGs.
    """
    if seed is None or seed < 0:
        seed = (
            os.getpid()
            + int(datetime.datetime.now().strftime("%S%f"))
            + int.from_bytes(os.urandom(2), "big")
        )
        logging.getLogger(__name__).info(f"Using a generated random seed {seed}")
    seed = int(seed) % (2**31)
    np.random.seed(seed)
    random.seed(seed)
    return seed


def collect_env_info() -> str:
    import jax

    lines = [
        f"python: {sys.version.split()[0]}",
        f"jax: {jax.__version__}",
        f"devices: {jax.devices()}",
        f"process: {jax.process_index()}/{jax.process_count()}",
        f"default backend: {jax.default_backend()}",
    ]
    try:
        import flax, optax  # noqa: E401

        lines.append(f"flax: {flax.__version__}  optax: {optax.__version__}")
    except ImportError:
        pass
    return "\n".join(lines)
