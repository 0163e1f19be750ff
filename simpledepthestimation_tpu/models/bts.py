"""BTS: supervised depth net with local planar guidance.

Behavioral equivalent of reference detectron2/modeling/depth_net/BTSNet.py:39-370
(NHWC Flax): ResNet feature pyramid → upconv/skip decoder with a dense ASPP
chain (dilations 3/6/12/18/24), ``reduction_1x1`` plane-parameter heads
(θ, φ, dist), local planar guidance at 8×/4×/2× (plane equations evaluated at
subpixel offsets), sigmoid depth × MAX_DEPTH with the KITTI focal scaling
``focal / 715.0873``.

The LPG subpixel evaluation is a broadcast + elementwise divide — XLA fuses
it into the surrounding elementwise graph; the ``repeat_interleave`` becomes
a broadcast-reshape (no materialized gather).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .build import DEPTH_NET_REGISTRY, compute_dtype
from .resnet import ResNetEncoder
from .layers import upsample_nearest_2x


def _bn(train: bool, name: str, eps: float = 1.1e-5):
    # torch momentum 0.01 → flax momentum 0.99
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.99, epsilon=eps,
        dtype=jnp.float32, name=name,
    )


class AtrousConv(nn.Module):
    """[BN] → ReLU → 1×1 conv (2×out) → BN → ReLU → 3×3 dilated conv
    (reference BTSNet.py:39-65)."""

    out_channels: int
    dilation: int
    apply_bn_first: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.apply_bn_first:
            x = _bn(train, "first_bn")(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.out_channels * 2, (1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        x = _bn(train, "bn2", eps=1e-5)(x)
        x = nn.relu(x)
        d = self.dilation
        return nn.Conv(
            self.out_channels, (3, 3), padding=[(d, d), (d, d)],
            kernel_dilation=(d, d), use_bias=False, dtype=self.dtype, name="conv2",
        )(x)


class UpConv(nn.Module):
    """nearest 2× → 3×3 conv → ELU (reference BTSNet.py:68-81)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = upsample_nearest_2x(x)
        x = nn.Conv(
            self.out_channels, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv",
        )(x)
        return nn.elu(x)


class Reduction1x1(nn.Module):
    """Halving 1×1 conv chain → plane params (θ, φ, dist) or final sigmoid
    (reference BTSNet.py:84-123)."""

    num_out_filters: int
    max_depth: float
    is_final: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        num_out = self.num_out_filters
        i = 0
        while num_out >= 4:
            if num_out < 8:
                if self.is_final:
                    x = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype, name="final")(x)
                    return nn.sigmoid(x.astype(jnp.float32))
                x = nn.Conv(
                    3, (1, 1), use_bias=False, dtype=self.dtype, name="plane_params"
                )(x)
                break
            x = nn.Conv(
                num_out, (1, 1), use_bias=False, dtype=self.dtype, name=f"inter_{i}"
            )(x)
            x = nn.elu(x)
            num_out //= 2
            i += 1

        x = x.astype(jnp.float32)
        theta = nn.sigmoid(x[..., 0]) * math.pi / 3
        phi = nn.sigmoid(x[..., 1]) * math.pi * 2
        dist = nn.sigmoid(x[..., 2]) * self.max_depth
        n1 = jnp.sin(theta) * jnp.cos(phi)
        n2 = jnp.sin(theta) * jnp.sin(phi)
        n3 = jnp.cos(theta)
        return jnp.stack([n1, n2, n3, dist], axis=-1)


def local_planar_guidance(plane_eq: jnp.ndarray, upratio: int) -> jnp.ndarray:
    """Evaluate upsampled plane equations at subpixel offsets
    (reference BTSNet.py:126-148).

    plane_eq: [B, h, w, 4] → depth [B, h·r, w·r].
    """
    B, h, w, _ = plane_eq.shape
    r = upratio
    # repeat-interleave ×r on H and W via broadcast
    pe = jnp.broadcast_to(plane_eq[:, :, None, :, None, :], (B, h, r, w, r, 4))
    pe = pe.reshape(B, h * r, w * r, 4)
    n1, n2, n3, n4 = pe[..., 0], pe[..., 1], pe[..., 2], pe[..., 3]

    offs = (jnp.arange(r, dtype=jnp.float32) - (r - 1) * 0.5) / r
    u = jnp.tile(offs, w)[None, None, :]  # [1, 1, w·r] — x-subpixel
    v = jnp.tile(offs, h)[None, :, None]  # [1, h·r, 1] — y-subpixel

    return n4 / (n1 * u + n2 * v + n3)


class BtsDecoder(nn.Module):
    """The BTS decoder (reference BTSNet.py:151-273)."""

    feat_channels: Sequence[int]
    max_depth: float
    num_features: int = 512
    dataset: str = "kitti"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, focal, train: bool = False):
        nf = self.num_features
        dt = self.dtype
        skip0, skip1, skip2, skip3 = features[0], features[1], features[2], features[3]
        dense = nn.relu(features[4])

        upconv5 = UpConv(nf, dtype=dt, name="upconv5")(dense)  # H/16
        upconv5 = _bn(train, "bn5")(upconv5)
        concat5 = jnp.concatenate([upconv5, skip3], -1)
        iconv5 = nn.elu(
            nn.Conv(nf, (3, 3), padding=1, use_bias=False, dtype=dt, name="conv5")(concat5)
        )

        upconv4 = UpConv(nf // 2, dtype=dt, name="upconv4")(iconv5)  # H/8
        upconv4 = _bn(train, "bn4")(upconv4)
        concat4 = jnp.concatenate([upconv4, skip2], -1)
        iconv4 = nn.elu(
            nn.Conv(nf // 2, (3, 3), padding=1, use_bias=False, dtype=dt, name="conv4")(concat4)
        )
        iconv4 = _bn(train, "bn4_2")(iconv4)

        daspp_3 = AtrousConv(nf // 4, 3, apply_bn_first=False, dtype=dt, name="daspp_3")(
            iconv4, train
        )
        concat4_2 = jnp.concatenate([concat4, daspp_3], -1)
        daspp_6 = AtrousConv(nf // 4, 6, dtype=dt, name="daspp_6")(concat4_2, train)
        concat4_3 = jnp.concatenate([concat4_2, daspp_6], -1)
        daspp_12 = AtrousConv(nf // 4, 12, dtype=dt, name="daspp_12")(concat4_3, train)
        concat4_4 = jnp.concatenate([concat4_3, daspp_12], -1)
        daspp_18 = AtrousConv(nf // 4, 18, dtype=dt, name="daspp_18")(concat4_4, train)
        concat4_5 = jnp.concatenate([concat4_4, daspp_18], -1)
        daspp_24 = AtrousConv(nf // 4, 24, dtype=dt, name="daspp_24")(concat4_5, train)
        concat_daspp = jnp.concatenate(
            [iconv4, daspp_3, daspp_6, daspp_12, daspp_18, daspp_24], -1
        )
        daspp_feat = nn.elu(
            nn.Conv(nf // 4, (3, 3), padding=1, use_bias=False, dtype=dt, name="daspp_conv")(
                concat_daspp
            )
        )

        def plane_and_lpg(feat, num_out, r, name):
            reduc = Reduction1x1(num_out, self.max_depth, dtype=dt, name=f"reduc{name}")(feat)
            normal = reduc[..., :3]
            normal = normal / jnp.maximum(
                jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12
            )
            plane_eq = jnp.concatenate([normal, reduc[..., 3:]], -1)
            depth = local_planar_guidance(plane_eq, r)
            return depth[..., None] / self.max_depth  # [B, H, W, 1] scaled

        depth_8x8_scaled = plane_and_lpg(daspp_feat, nf // 4, 8, "8x8")
        depth_8x8_ds = depth_8x8_scaled[:, ::4, ::4]  # nearest 0.25 downsample

        upconv3 = UpConv(nf // 4, dtype=dt, name="upconv3")(daspp_feat)  # H/4
        upconv3 = _bn(train, "bn3")(upconv3)
        concat3 = jnp.concatenate([upconv3, skip1, depth_8x8_ds.astype(dt)], -1)
        iconv3 = nn.elu(
            nn.Conv(nf // 4, (3, 3), padding=1, use_bias=False, dtype=dt, name="conv3")(concat3)
        )

        depth_4x4_scaled = plane_and_lpg(iconv3, nf // 8, 4, "4x4")
        depth_4x4_ds = depth_4x4_scaled[:, ::2, ::2]

        upconv2 = UpConv(nf // 8, dtype=dt, name="upconv2")(iconv3)  # H/2
        upconv2 = _bn(train, "bn2")(upconv2)
        concat2 = jnp.concatenate([upconv2, skip0, depth_4x4_ds.astype(dt)], -1)
        iconv2 = nn.elu(
            nn.Conv(nf // 8, (3, 3), padding=1, use_bias=False, dtype=dt, name="conv2")(concat2)
        )

        depth_2x2_scaled = plane_and_lpg(iconv2, nf // 16, 2, "2x2")

        upconv1 = UpConv(nf // 16, dtype=dt, name="upconv1")(iconv2)
        reduc1x1 = Reduction1x1(
            nf // 32, self.max_depth, is_final=True, dtype=dt, name="reduc1x1"
        )(upconv1)
        concat1 = jnp.concatenate(
            [
                upconv1,
                reduc1x1.astype(dt),
                depth_2x2_scaled.astype(dt),
                depth_4x4_scaled.astype(dt),
                depth_8x8_scaled.astype(dt),
            ],
            -1,
        )
        iconv1 = nn.elu(
            nn.Conv(nf // 16, (3, 3), padding=1, use_bias=False, dtype=dt, name="conv1")(concat1)
        )
        final = nn.sigmoid(
            nn.Conv(1, (3, 3), padding=1, use_bias=False, dtype=dt, name="get_depth")(
                iconv1
            ).astype(jnp.float32)
        )
        final_depth = self.max_depth * final
        if self.dataset == "kitti":
            final_depth = final_depth * focal.reshape(-1, 1, 1, 1) / 715.0873

        return depth_8x8_scaled, depth_4x4_scaled, depth_2x2_scaled, reduc1x1, final_depth


ENCODER_CHANNELS = {
    "resnet50_bts": (50, (64, 256, 512, 1024, 2048)),
    "resnet101_bts": (101, (64, 256, 512, 1024, 2048)),
}


def _build_encoder(name: str, dtype):
    """Encoder zoo dispatch (reference BTSNet.py:278-333): resnet via
    ResNetEncoder; resnext/densenet/mobilenet via models.encoders."""
    if name in ENCODER_CHANNELS:
        num_layers, channels = ENCODER_CHANNELS[name]
        return ResNetEncoder(num_layers=num_layers, dtype=dtype, name="encoder"), channels
    from .encoders import BTS_ENCODERS

    if name in BTS_ENCODERS:
        ctor, channels = BTS_ENCODERS[name]
        return ctor(dtype, "encoder"), channels
    raise NotImplementedError(
        f"BTS encoder {name} not available "
        f"(supported: {sorted(list(ENCODER_CHANNELS) + list(BTS_ENCODERS))})"
    )


@DEPTH_NET_REGISTRY.register()
class BtsModel(nn.Module):
    encoder_name: str = "resnet50_bts"
    max_depth: float = 80.0
    bts_size: int = 512
    dataset: str = "kitti"
    bn_no_track: bool = False
    dtype: Any = jnp.float32

    @classmethod
    def from_cfg(cls, cfg):
        return cls(
            encoder_name=str(cfg.MODEL.DEPTH_NET.ENCODER_NAME),
            max_depth=float(cfg.MODEL.MAX_DEPTH),
            bts_size=int(cfg.MODEL.DEPTH_NET.get("BTS_SIZE", 512)),
            dataset=str(cfg.MODEL.get("DATASET", "kitti")),
            bn_no_track=bool(cfg.MODEL.DEPTH_NET.get("BN_NO_TRACK", False)),
            dtype=compute_dtype(cfg),
        )

    @nn.compact
    def __call__(
        self,
        image: jnp.ndarray,
        flip: Optional[jnp.ndarray] = None,
        train: bool = False,
        intrinsics: Optional[jnp.ndarray] = None,
    ) -> List[jnp.ndarray]:
        from .depth_nets import flip_images

        encoder, feat_channels = _build_encoder(self.encoder_name, self.dtype)

        if flip is not None:
            image = flip_images(image, flip)

        if intrinsics is not None:
            focal = intrinsics[:, 0, 0]
        else:
            focal = jnp.full((image.shape[0],), 715.0873, jnp.float32)

        # BN_NO_TRACK (reference BTSNet.py:374-386, bn_init_as_tf): freeze
        # batch-norm statistics — always use the stored running stats
        bn_train = train and not self.bn_no_track
        features = encoder(image, train=bn_train)
        outputs = BtsDecoder(
            feat_channels=feat_channels,
            max_depth=self.max_depth,
            num_features=self.bts_size,
            dataset=self.dataset,
            dtype=self.dtype,
            name="decoder",
        )(features, focal, train=bn_train)

        final_depth = outputs[4]
        if flip is not None:
            final_depth = flip_images(final_depth, flip)
        return [final_depth]
