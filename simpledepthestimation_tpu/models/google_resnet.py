"""GoogleResNet depth nets (depth+motion learning family).

Behavioral equivalents of reference detectron2/modeling/depth_net/
GoogleResNet.py:21-174 and GoogleResNetv2.py:173-215: ResNet-18/34/50-style
encoder with a selectable norm (BatchNorm or RandLayerNorm with noised
statistics), bilinear-upsample decoder producing a single-scale softplus
depth. The RandLayerNorm noise stddev is a traced scalar (the training-loop
ramp — reference projects/MotionLearning/train.py:105-109) threaded through
the call, with PRNG from the 'noise' rng collection.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .build import DEPTH_NET_REGISTRY, compute_dtype
from .layers import RandLayerNorm
from .resnet import BLOCKS, max_pool_3x3_s2
from ..geometry.camera import resize_img


class _Norm(nn.Module):
    """Dispatch between BatchNorm / RandLayerNorm / identity."""

    kind: Optional[str] = "BN"

    @nn.compact
    def __call__(self, x, train: bool = False, stddev=0.0):
        if self.kind == "BN":
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=jnp.float32, name="bn"
            )(x)
        if self.kind == "randLN":
            rng = self.make_rng("noise") if (train and self.has_rng("noise")) else None
            return RandLayerNorm(name="rln")(x, stddev=stddev, rng=rng, train=train)
        return x


class NormBasicBlock(nn.Module):
    """ResNet BasicBlock with pluggable norm (reference layers/resnet.py)."""

    planes: int
    stride: int = 1
    norm: Optional[str] = "BN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, stddev=0.0):
        identity = x
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride), padding=1,
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        out = _Norm(self.norm, name="n1")(out, train, stddev)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2"
        )(out)
        out = _Norm(self.norm, name="n2")(out, train, stddev)
        # ResNetTF downsample (reference layers/resnet.py:35-57): a bare
        # conv1x1 on channel mismatch (NO norm, unlike torchvision), maxpool
        # on a pure stride change
        if x.shape[-1] != self.planes:
            identity = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="down_conv",
            )(x)
        elif self.stride != 1:
            identity = nn.max_pool(
                x, (self.stride, self.stride), strides=(self.stride, self.stride)
            )
        return nn.relu(out + identity)


class NormBottleneck(nn.Module):
    planes: int
    stride: int = 1
    norm: Optional[str] = "BN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, stddev=0.0):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(_Norm(self.norm, name="n1")(out, train, stddev))
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride), padding=1,
            use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = nn.relu(_Norm(self.norm, name="n2")(out, train, stddev))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = _Norm(self.norm, name="n3")(out, train, stddev)
        # ResNetTF downsample: bare conv1x1 (no norm) / maxpool — see
        # NormBasicBlock
        if x.shape[-1] != self.planes * 4:
            identity = nn.Conv(
                self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="down_conv",
            )(x)
        elif self.stride != 1:
            identity = nn.max_pool(
                x, (self.stride, self.stride), strides=(self.stride, self.stride)
            )
        return nn.relu(out + identity)


class NormResNetEncoder(nn.Module):
    """5-feature trunk with pluggable norm (reference GoogleResNet.py:21-69)."""

    num_layers: int = 18
    norm: Optional[str] = "BN"
    dtype: Any = jnp.float32

    @property
    def num_ch_enc(self):
        if self.num_layers > 34:
            return (64, 256, 512, 1024, 2048)
        return (64, 64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False, stddev=0.0):
        block_cls = NormBottleneck if self.num_layers > 34 else NormBasicBlock
        blocks = BLOCKS[self.num_layers]

        features = []
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=3, use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        x = _Norm(self.norm, name="n1")(x, train, stddev)
        x = nn.relu(x)
        features.append(x)

        x = max_pool_3x3_s2(x)
        for li, (planes, n_blocks) in enumerate(zip((64, 128, 256, 512), blocks)):
            stride = 1 if li == 0 else 2
            for b in range(n_blocks):
                x = block_cls(
                    planes,
                    stride=stride if b == 0 else 1,
                    norm=self.norm,
                    dtype=self.dtype,
                    name=f"layer{li + 1}_{b}",
                )(x, train=train, stddev=stddev)
            features.append(x)
        return features


class UpsampleBlock(nn.Module):
    """bilinear 2× → conv+relu → skip concat → conv+relu
    (reference GoogleResNet.py:109-125)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        H, W = x.shape[1] * 2, x.shape[2] * 2
        out = resize_img(x, (H, W), mode="bilinear")
        out = nn.relu(
            nn.Conv(
                self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                kernel_init=nn.initializers.xavier_uniform(), name="upconv",
            )(out)
        )
        if skip is not None:
            out = jnp.concatenate([out, skip], -1)
        out = nn.relu(
            nn.Conv(
                self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                kernel_init=nn.initializers.xavier_uniform(), name="iconv",
            )(out)
        )
        return out


class GoogleDepthDecoder(nn.Module):
    """Single-scale softplus depth decoder (reference GoogleResNet.py:72-106)."""

    learn_scale: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features):
        num_ch_dec = (16, 32, 64, 128, 256)
        out = features[-1]
        for i in range(4, -1, -1):
            skip = features[i - 1] if i > 0 else None
            out = UpsampleBlock(num_ch_dec[i], dtype=self.dtype, name=f"block{i}")(out, skip)
        out = nn.Conv(
            1, (3, 3), padding=1, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(), name="out_conv",
        )(out)
        depth = nn.softplus(out.astype(jnp.float32))
        if self.learn_scale:
            scale = self.param("scale", nn.initializers.ones, (1,))
            depth = depth * scale
        return depth


@DEPTH_NET_REGISTRY.register()
class GoogleResNet(nn.Module):
    num_layers: int = 18
    pretrained: bool = False
    norm: Optional[str] = "BN"
    learn_scale: bool = False
    upsample_depth: bool = False
    dtype: Any = jnp.float32

    @classmethod
    def from_cfg(cls, cfg):
        version = str(cfg.MODEL.DEPTH_NET.ENCODER_NAME)
        num_layers = int(version[:2])
        return cls(
            num_layers=num_layers,
            pretrained=version[2:] == "pt",
            norm=cfg.MODEL.DEPTH_NET.get("NORM", "BN"),
            learn_scale=bool(cfg.MODEL.DEPTH_NET.get("LEARN_SCALE", False)),
            upsample_depth=bool(cfg.MODEL.DEPTH_NET.get("UPSAMPLE_DEPTH", False)),
            dtype=compute_dtype(cfg),
        )

    @nn.compact
    def __call__(
        self,
        image: jnp.ndarray,
        flip: Optional[jnp.ndarray] = None,
        train: bool = False,
        intrinsics: Optional[jnp.ndarray] = None,
        noise_stddev=0.0,
    ) -> List[jnp.ndarray]:
        from .depth_nets import flip_images

        if flip is not None:
            image = flip_images(image, flip)

        features = NormResNetEncoder(
            num_layers=self.num_layers, norm=self.norm, dtype=self.dtype, name="encoder"
        )(image, train=train, stddev=noise_stddev)
        depth = GoogleDepthDecoder(
            learn_scale=self.learn_scale, dtype=self.dtype, name="decoder"
        )(features)

        if flip is not None:
            depth = flip_images(depth, flip)
        if self.upsample_depth:
            depth = resize_img(depth, image.shape[1:3], mode="nearest")
        return [depth]


class MaxpoolShortcutBlock(nn.Module):
    """v2 basic block: maxpool-downsample shortcut instead of strided 1×1 conv
    (reference GoogleResNetv2.py encoder)."""

    planes: int
    stride: int = 1
    norm: Optional[str] = "BN"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, stddev=0.0):
        identity = x
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride), padding=1,
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        out = nn.relu(_Norm(self.norm, name="n1")(out, train, stddev))
        out = nn.Conv(
            self.planes, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2"
        )(out)
        out = _Norm(self.norm, name="n2")(out, train, stddev)
        if self.stride != 1:
            identity = nn.max_pool(
                identity, (self.stride, self.stride),
                strides=(self.stride, self.stride), padding="SAME",
            )
        if identity.shape[-1] != self.planes:
            pad = self.planes - identity.shape[-1]
            identity = jnp.pad(identity, ((0, 0), (0, 0), (0, 0), (0, pad)))
        return nn.relu(out + identity)


@DEPTH_NET_REGISTRY.register()
class GoogleResNetv2(nn.Module):
    """From-scratch ResNet-18-style encoder with maxpool shortcuts + the same
    single-scale decoder (reference GoogleResNetv2.py:173-215)."""

    norm: Optional[str] = "BN"
    learn_scale: bool = False
    upsample_depth: bool = False
    dtype: Any = jnp.float32

    @classmethod
    def from_cfg(cls, cfg):
        version = str(cfg.MODEL.DEPTH_NET.ENCODER_NAME)
        assert int(version[:2]) == 18, "GoogleResNetv2 supports 18 layers only"
        return cls(
            norm=cfg.MODEL.DEPTH_NET.get("NORM", "BN"),
            learn_scale=bool(cfg.MODEL.DEPTH_NET.get("LEARN_SCALE", False)),
            upsample_depth=bool(cfg.MODEL.DEPTH_NET.get("UPSAMPLE_DEPTH", False)),
            dtype=compute_dtype(cfg),
        )

    @nn.compact
    def __call__(
        self,
        image: jnp.ndarray,
        flip: Optional[jnp.ndarray] = None,
        train: bool = False,
        intrinsics: Optional[jnp.ndarray] = None,
        noise_stddev=0.0,
    ) -> List[jnp.ndarray]:
        from .depth_nets import flip_images

        if flip is not None:
            image = flip_images(image, flip)

        features = []
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=3, use_bias=False, dtype=self.dtype, name="conv1"
        )(image)
        x = nn.relu(_Norm(self.norm, name="n1")(x, train, noise_stddev))
        features.append(x)
        x = max_pool_3x3_s2(x)
        for li, planes in enumerate((64, 128, 256, 512)):
            stride = 1 if li == 0 else 2
            for b in range(2):
                x = MaxpoolShortcutBlock(
                    planes,
                    stride=stride if b == 0 else 1,
                    norm=self.norm,
                    dtype=self.dtype,
                    name=f"layer{li + 1}_{b}",
                )(x, train=train, stddev=noise_stddev)
            features.append(x)

        depth = GoogleDepthDecoder(
            learn_scale=self.learn_scale, dtype=self.dtype, name="decoder"
        )(features)

        if flip is not None:
            depth = flip_images(depth, flip)
        if self.upsample_depth:
            depth = resize_img(depth, image.shape[1:3], mode="nearest")
        return [depth]
