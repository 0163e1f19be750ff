"""Flax ResNet encoder producing the 5-scale feature pyramid.

Behavioral equivalent of reference detectron2/layers/resnet_encoder.py:61-99
(a torchvision ResNet-18/34/50 trunk tapped at conv1, layer1..layer4), built
NHWC for TPU. Same channel schedule: [64, 64, 128, 256, 512] (×4 from layer1
up for Bottleneck nets). Under the SPMD jit train step BatchNorm statistics
are global-batch (GSPMD writes the program globally and XLA inserts the
cross-device reduction) — i.e. sync-BN semantics, a superset of the
reference's per-replica DDP BN (broadcast_buffers=False); see
models/norm_layers.py and the 8-device stat test in tests/test_parallel.py.

ImageNet-pretrained initialization is loaded from a converted checkpoint via
``simpledepthestimation_tpu.models.pretrained`` when the version carries the
``pt`` suffix.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}
BOTTLENECK = {18: False, 34: False, 50: True, 101: True}


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=jnp.float32, name=name
        )
        identity = x
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride), padding=1,
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        out = norm("bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2"
        )(out)
        out = norm("bn2")(out)

        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = norm("downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=jnp.float32, name=name
        )
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(norm("bn1")(out))
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride), padding=1,
            use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = nn.relu(norm("bn2")(out))
        out = nn.Conv(
            self.planes * self.expansion, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(out)
        out = norm("bn3")(out)

        out_ch = self.planes * self.expansion
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(
                out_ch, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = norm("downsample_bn")(identity)
        return nn.relu(out + identity)


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """MaxPool2d(kernel=3, stride=2, padding=1) equivalent."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")


class ResNetEncoder(nn.Module):
    """5-feature-map ResNet trunk.

    Returns [relu(conv1), layer1, layer2, layer3, layer4] at strides
    2/4/8/16/32, channels num_ch_enc (reference resnet_encoder.py:88-99).
    """

    num_layers: int = 18
    num_input_images: int = 1
    dtype: Any = jnp.float32

    @property
    def num_ch_enc(self) -> Tuple[int, ...]:
        base = (64, 64, 128, 256, 512)
        if BOTTLENECK[self.num_layers]:
            return (64, 256, 512, 1024, 2048)
        return base

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Sequence[jnp.ndarray]:
        block_cls = Bottleneck if BOTTLENECK[self.num_layers] else BasicBlock
        blocks = BLOCKS[self.num_layers]

        features = []
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=3, use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=jnp.float32, name="bn1"
        )(x)
        x = nn.relu(x)
        features.append(x)

        x = max_pool_3x3_s2(x)
        for layer_idx, (planes, n_blocks) in enumerate(zip((64, 128, 256, 512), blocks)):
            stride = 1 if layer_idx == 0 else 2
            for b in range(n_blocks):
                x = block_cls(
                    planes,
                    stride=stride if b == 0 else 1,
                    dtype=self.dtype,
                    name=f"layer{layer_idx + 1}_{b}",
                )(x, train=train)
            features.append(x)

        return features
