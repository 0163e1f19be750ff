"""Windowed pooling helpers (NHWC), the building blocks of SSIM.

Implemented with ``lax.reduce_window`` so XLA fuses them with surrounding
elementwise math on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def avg_pool(
    x: jnp.ndarray, window: int, stride: int = 1, padding: str = "VALID"
) -> jnp.ndarray:
    """Average pool over H, W of an NHWC tensor."""
    summed = lax.reduce_window(
        x,
        jnp.zeros((), x.dtype),
        lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=padding,
    )
    if padding == "VALID":
        return summed / (window * window)
    ones = jnp.ones_like(x)
    counts = lax.reduce_window(
        ones,
        jnp.zeros((), x.dtype),
        lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=padding,
    )
    return summed / counts


def reflect_pad_hw(x: jnp.ndarray, pad: int = 1) -> jnp.ndarray:
    """ReflectionPad2d equivalent on NHWC."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def avg_pool_3x3_reflect(x: jnp.ndarray) -> jnp.ndarray:
    """ReflectionPad(1) + AvgPool(3, stride 1): the SSIM window
    (reference ssim_loss.py:32-38)."""
    return avg_pool(reflect_pad_hw(x, 1), 3, 1, "VALID")


def avg_pool_3x3_same(x: jnp.ndarray) -> jnp.ndarray:
    """AvgPool(3, stride 1, zero pad 1) — torch ``F.avg_pool2d(padding=1)``
    divides by the full window (count includes zero padding), so SAME-sum / 9."""
    summed = lax.reduce_window(
        x,
        jnp.zeros((), x.dtype),
        lax.add,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 1, 1, 1),
        padding="SAME",
    )
    return summed / 9.0


def max_pool(
    x: jnp.ndarray, window: int, stride: int = 1, padding: str = "SAME"
) -> jnp.ndarray:
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=padding,
    )
