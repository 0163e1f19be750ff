"""Windowed pooling helpers (NHWC), the building blocks of SSIM.

The 3×3 stride-1 average pools are written as a sum of 9 shifted slices —
a fully differentiable elementwise graph XLA fuses on the VPU (the generic
``lax.reduce_window`` path lacks a transpose rule under this JAX version's
linearization, and 3×3 windows don't need one).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _window_sum_3x3(x: jnp.ndarray) -> jnp.ndarray:
    """Sum over all 3×3 windows of a padded NHWC tensor (VALID): output is
    [B, H-2, W-2, C]."""
    H, W = x.shape[1], x.shape[2]
    out = None
    for dy in range(3):
        for dx in range(3):
            piece = x[:, dy : dy + H - 2, dx : dx + W - 2, :]
            out = piece if out is None else out + piece
    return out


def reflect_pad_hw(x: jnp.ndarray, pad: int = 1) -> jnp.ndarray:
    """ReflectionPad2d equivalent on NHWC."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def avg_pool_3x3_reflect(x: jnp.ndarray) -> jnp.ndarray:
    """ReflectionPad(1) + AvgPool(3, stride 1): the SSIM window
    (reference ssim_loss.py:32-38)."""
    return _window_sum_3x3(reflect_pad_hw(x, 1)) / 9.0


def avg_pool_3x3_same(x: jnp.ndarray) -> jnp.ndarray:
    """AvgPool(3, stride 1, zero pad 1) — torch ``F.avg_pool2d(padding=1)``
    divides by the full window (count includes zero padding), so zero-pad
    then window-sum / 9."""
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return _window_sum_3x3(padded) / 9.0


def avg_pool(x: jnp.ndarray, window: int, stride: int = 1, padding: str = "VALID") -> jnp.ndarray:
    """General average pool over H, W of an NHWC tensor (forward-only paths)."""
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


def max_pool(x: jnp.ndarray, window: int, stride: int = 1, padding: str = "SAME") -> jnp.ndarray:
    if jnp.issubdtype(x.dtype, jnp.floating):
        init = -jnp.inf
    else:
        init = jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        init,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=padding,
    )
