"""Encoder zoo for BTS: ResNeXt, DenseNet, MobileNetV2 trunks (NHWC Flax).

Parity with the reference's torchvision encoder zoo
(reference detectron2/modeling/depth_net/BTSNet.py:278-333): each returns
the 5 skip feature maps BTS taps. ResNet-50/101 live in resnet.py; this
module adds:

- resnext50_32x4d / resnext101_32x8d: ResNet bottlenecks with grouped 3×3
  convs (``feature_group_count`` — maps directly onto the MXU).
- densenet121 / densenet161: dense blocks + transitions, tapped at
  relu0 (H/2) / pool0 (H/4) / transition1 (H/8, after its avgpool) /
  transition2 (H/16) / norm5 (H/32).
- mobilenet_v2: inverted residual blocks, tapped at module indices
  1/3/6/10/18 (16/24/32/64/1280 channels — the reference's feat_inds
  2/4/7/11/19 with its 1-based loop counter).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .resnet import max_pool_3x3_s2


def _bn(train: bool, name: str):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, dtype=jnp.float32, name=name
    )


# ---------------------------------------------------------------------------
# ResNeXt
# ---------------------------------------------------------------------------


class ResNeXtBottleneck(nn.Module):
    planes: int  # base width already scaled
    stride: int = 1
    groups: int = 32
    expansion_out: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(_bn(train, "bn1")(out))
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride), padding=1,
            feature_group_count=self.groups, use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = nn.relu(_bn(train, "bn2")(out))
        out = nn.Conv(
            self.expansion_out, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(out)
        out = _bn(train, "bn3")(out)
        if self.stride != 1 or x.shape[-1] != self.expansion_out:
            identity = nn.Conv(
                self.expansion_out, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = _bn(train, "downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNeXtEncoder(nn.Module):
    """resnext50_32x4d: blocks (3,4,6,3), groups 32, width/group 4;
    resnext101_32x8d: blocks (3,4,23,3), width/group 8."""

    blocks: Tuple[int, ...] = (3, 4, 6, 3)
    groups: int = 32
    width_per_group: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        features = []
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=3, use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        x = nn.relu(_bn(train, "bn1")(x))
        features.append(x)
        x = max_pool_3x3_s2(x)
        for li, n_blocks in enumerate(self.blocks):
            planes = 64 * 2**li
            width = int(planes * self.width_per_group / 64) * self.groups
            stride = 1 if li == 0 else 2
            for b in range(n_blocks):
                x = ResNeXtBottleneck(
                    planes=width,
                    stride=stride if b == 0 else 1,
                    groups=self.groups,
                    expansion_out=planes * 4,
                    dtype=self.dtype,
                    name=f"layer{li + 1}_{b}",
                )(x, train=train)
            features.append(x)
        return features


# ---------------------------------------------------------------------------
# DenseNet
# ---------------------------------------------------------------------------


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(_bn(train, "norm1")(x))
        out = nn.Conv(
            self.bn_size * self.growth_rate, (1, 1), use_bias=False,
            dtype=self.dtype, name="conv1",
        )(out)
        out = nn.relu(_bn(train, "norm2")(out))
        out = nn.Conv(
            self.growth_rate, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2"
        )(out)
        return jnp.concatenate([x, out], -1)


class DenseNetEncoder(nn.Module):
    """densenet121: blocks (6,12,24,16), growth 32, init 64;
    densenet161: blocks (6,12,36,24), growth 48, init 96.

    Taps (reference BTSNet feat_names, whole-Transition-module outputs):
    relu0 (after first conv+bn+relu, H/2), pool0 (H/4), transition1 output
    after its avgpool (H/8), transition2 output (H/16), final norm5
    (H/32)."""

    block_config: Tuple[int, ...] = (6, 12, 24, 16)
    growth_rate: int = 32
    num_init_features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        features = []
        x = nn.Conv(
            self.num_init_features, (7, 7), strides=(2, 2), padding=3,
            use_bias=False, dtype=self.dtype, name="conv0",
        )(x)
        x = nn.relu(_bn(train, "norm0")(x))
        features.append(x)  # relu0

        x = max_pool_3x3_s2(x)
        features.append(x)  # pool0

        num_features = self.num_init_features
        for i, n_layers in enumerate(self.block_config):
            for j in range(n_layers):
                x = DenseLayer(
                    self.growth_rate, dtype=self.dtype, name=f"dense{i + 1}_{j}"
                )(x, train=train)
            num_features += n_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                # transition: norm+relu+1x1 conv+avgpool2; the reference taps
                # the whole torchvision Transition module's output, i.e.
                # AFTER the avgpool (BTSNet.py:281-292 feat_names
                # 'transition1'/'transition2' → H/8 and H/16 skips)
                x = nn.relu(_bn(train, f"trans{i + 1}_norm")(x))
                x = nn.Conv(
                    num_features // 2, (1, 1), use_bias=False,
                    dtype=self.dtype, name=f"trans{i + 1}_conv",
                )(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
                if i in (0, 1):
                    features.append(x)  # transition1 / transition2
                num_features //= 2
        x = _bn(train, "norm5")(x)
        features.append(x)
        return features


# ---------------------------------------------------------------------------
# MobileNetV2
# ---------------------------------------------------------------------------


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int = 1
    expand_ratio: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand_ratio
        use_res = self.stride == 1 and in_ch == self.out_channels
        out = x
        if self.expand_ratio != 1:
            out = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype, name="expand")(out)
            out = nn.relu6(_bn(train, "bn_e")(out))
        out = nn.Conv(
            hidden, (3, 3), strides=(self.stride, self.stride), padding=1,
            feature_group_count=hidden, use_bias=False, dtype=self.dtype, name="dw",
        )(out)
        out = nn.relu6(_bn(train, "bn_dw")(out))
        out = nn.Conv(
            self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="project"
        )(out)
        out = _bn(train, "bn_p")(out)
        return x + out if use_res else out


class MobileNetV2Encoder(nn.Module):
    """torchvision mobilenet_v2.features, tapped per reference
    BTSNet.py:318-328: its loop counter starts at 1 before the stem, so
    tap values 2/4/7/11/19 are module indices 1/3/6/10/18 — the ir1 (16ch),
    second 24ch, third 32ch, fourth 64ch blocks and the 1280ch head
    (feat_out_channels BTSNet.py:310)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        taps = {1, 3, 6, 10, 18}
        features = []
        idx = 0

        def tap(v):
            if idx in taps:
                features.append(v)

        # feature 0: conv stem
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        x = nn.relu6(_bn(train, "bn_stem")(x))
        idx = 0
        tap(x)

        cfgs = [
            # t, c, n, s
            (1, 16, 1, 1),
            (6, 24, 2, 2),
            (6, 32, 3, 2),
            (6, 64, 4, 2),
            (6, 96, 3, 1),
            (6, 160, 3, 2),
            (6, 320, 1, 1),
        ]
        for t, c, n, s in cfgs:
            for b in range(n):
                idx += 1
                x = InvertedResidual(
                    c, stride=s if b == 0 else 1, expand_ratio=t,
                    dtype=self.dtype, name=f"ir{idx}",
                )(x, train=train)
                tap(x)

        idx += 1
        x = nn.Conv(1280, (1, 1), use_bias=False, dtype=self.dtype, name="head")(x)
        x = nn.relu6(_bn(train, "bn_head")(x))
        tap(x)
        return features


BTS_ENCODERS = {
    "resnext50_bts": (
        lambda dtype, name: ResNeXtEncoder(blocks=(3, 4, 6, 3), groups=32, width_per_group=4, dtype=dtype, name=name),
        (64, 256, 512, 1024, 2048),
    ),
    "resnext101_bts": (
        lambda dtype, name: ResNeXtEncoder(blocks=(3, 4, 23, 3), groups=32, width_per_group=8, dtype=dtype, name=name),
        (64, 256, 512, 1024, 2048),
    ),
    "densenet121_bts": (
        lambda dtype, name: DenseNetEncoder(block_config=(6, 12, 24, 16), growth_rate=32, num_init_features=64, dtype=dtype, name=name),
        (64, 64, 128, 256, 1024),
    ),
    "densenet161_bts": (
        lambda dtype, name: DenseNetEncoder(block_config=(6, 12, 36, 24), growth_rate=48, num_init_features=96, dtype=dtype, name=name),
        (96, 96, 192, 384, 2208),
    ),
    "mobilenetv2_bts": (
        lambda dtype, name: MobileNetV2Encoder(dtype=dtype, name=name),
        (16, 24, 32, 64, 1280),
    ),
}
