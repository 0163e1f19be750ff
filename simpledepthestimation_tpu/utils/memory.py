"""Recursive host/device data movers + OOM retry.

Analogs of reference detectron2/utils/memory.py:13-114: ``to_numpy`` walks
nested containers fetching device arrays; ``to_device`` places host arrays
(with optional sharding); ``retry_if_oom`` retries a function once after an
out-of-memory failure with the donated buffers dropped (the CUDA
empty-cache analog is letting XLA free donated buffers between attempts).
"""

from __future__ import annotations

import logging
from functools import wraps
from typing import Any

import numpy as np

import jax

logger = logging.getLogger(__name__)


def to_numpy(data: Any) -> Any:
    if isinstance(data, dict):
        return {k: to_numpy(v) for k, v in data.items()}
    if isinstance(data, (list, tuple)):
        return type(data)(to_numpy(v) for v in data)
    if isinstance(data, jax.Array):
        return np.asarray(data)
    return data


def to_device(data: Any, sharding=None) -> Any:
    def place(x):
        if hasattr(x, "shape"):
            return jax.device_put(x, sharding) if sharding is not None else jax.device_put(x)
        return x

    if isinstance(data, dict):
        return {k: to_device(v, sharding) for k, v in data.items()}
    if isinstance(data, (list, tuple)):
        return type(data)(to_device(v, sharding) for v in data)
    return place(data)


def retry_if_oom(func):
    """Retry once on XLA resource exhaustion (reference retry_if_cuda_oom)."""

    @wraps(func)
    def wrapped(*args, **kwargs):
        try:
            return func(*args, **kwargs)
        except Exception as e:  # XlaRuntimeError: RESOURCE_EXHAUSTED
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            logger.warning(f"OOM in {func.__name__}; retrying once: {e}")
            jax.clear_caches()
            return func(*args, **kwargs)

    return wrapped
