"""Shared Flax building blocks (NHWC).

TPU-native equivalents of reference detectron2/layers/depth_decoder.py:9-59
(disp_to_depth, Conv3x3 with reflection padding, ELU ConvBlock, nearest
upsample) plus norm helpers.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def disp_to_depth(disp: jnp.ndarray, min_depth: float, max_depth: float):
    """Sigmoid-style disparity → depth in [min_depth, max_depth]
    (reference depth_decoder.py:9-18)."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    depth = 1.0 / scaled_disp
    return scaled_disp, depth


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest 2× upsample of NHWC (reference depth_decoder.py:55-58)."""
    B, H, W, C = x.shape
    return jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C)).reshape(
        B, H * 2, W * 2, C
    )


class Conv3x3(nn.Module):
    """3×3 conv with reflection padding (reference depth_decoder.py:41-52)."""

    out_channels: int
    use_refl: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mode = "reflect" if self.use_refl else "constant"
        # cast to the conv's compute dtype BEFORE padding: nn.Conv casts its
        # input anyway, so this is value-identical — but it halves the bytes
        # of the pad AND of its transpose (the backward slice-adds measured
        # f32 at ~2.4 ms × 12 decoder convs in the round-4 step trace,
        # docs/PERF.md round-4 decomposition)
        x = x.astype(self.dtype)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)
        return nn.Conv(
            self.out_channels, (3, 3), padding="VALID", dtype=self.dtype, name="conv"
        )(x)


class ConvBlock(nn.Module):
    """Conv3x3 + ELU (reference depth_decoder.py:21-35)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Conv3x3(self.out_channels, dtype=self.dtype, name="conv")(x)
        return nn.elu(x)


class ConvGNReLU(nn.Module):
    """Conv + GroupNorm(16) + ReLU stack used by the pose nets
    (reference pose_net/PoseNet.py:14-20)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 2
    group_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.group_norm:
            # fp32 norm for stability under bf16 compute; eps matches torch
            x = nn.GroupNorm(num_groups=16, epsilon=1e-5, dtype=jnp.float32, name="gn")(x)
        return nn.relu(x)


class RandLayerNorm(nn.Module):
    """Per-channel layer norm with multiplicatively-noised statistics
    (reference detectron2/layers/layer_norm.py:7-33).

    During training, mean and variance are each scaled by
    ``1 + fmod(N(0, stddev), 2·stddev)`` with *detached* statistics
    (reference layer_norm.py:28-29); ``stddev`` arrives as a traced scalar
    (the MotionLearning noise ramp), not module state. Statistics use the
    unbiased variance and eps 1e-3, matching the reference defaults.
    """

    epsilon: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        stddev: jnp.ndarray | float = 0.0,
        rng: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))

        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True, ddof=1)
        mean = jax.lax.stop_gradient(mean)
        var = jax.lax.stop_gradient(var)

        if train and rng is not None:
            noise_m = jax.random.normal(jax.random.fold_in(rng, 0), mean.shape, x.dtype)
            noise_v = jax.random.normal(jax.random.fold_in(rng, 1), var.shape, x.dtype)
            # fmod(0, 0) is NaN and the MotionLearning ramp starts at
            # stddev 0 (traced, so no python branch) — guard the divisor
            two_sig = jnp.maximum(stddev * 2.0, jnp.finfo(x.dtype).tiny)
            mean = mean * (1.0 + jnp.fmod(noise_m * stddev, two_sig))
            var = var * (1.0 + jnp.fmod(noise_v * stddev, two_sig))

        inv = jax.lax.rsqrt(var + self.epsilon)
        return (x - mean) * inv * scale + bias
