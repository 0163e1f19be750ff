"""Monodepth2-style U-Net depth decoder (NHWC Flax).

Behavioral equivalent of reference detectron2/layers/depth_decoder.py:62-110:
5 up-stages (upconv0 → nearest 2× → skip concat → upconv1), softplus
disparity heads at 4 scales.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv3x3, ConvBlock, upsample_nearest_2x


class DepthDecoder(nn.Module):
    num_ch_enc: Tuple[int, ...]
    scales: Tuple[int, ...] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_features: Sequence[jnp.ndarray]) -> Dict[int, jnp.ndarray]:
        num_ch_dec = (16, 32, 64, 128, 256)
        outputs: Dict[int, jnp.ndarray] = {}

        x = input_features[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(num_ch_dec[i], dtype=self.dtype, name=f"upconv_{i}_0")(x)
            x = upsample_nearest_2x(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, input_features[i - 1]], axis=-1)
            x = ConvBlock(num_ch_dec[i], dtype=self.dtype, name=f"upconv_{i}_1")(x)
            if i in self.scales:
                disp = Conv3x3(
                    self.num_output_channels, dtype=self.dtype, name=f"dispconv_{i}"
                )(x)
                outputs[i] = nn.softplus(disp)

        return outputs
