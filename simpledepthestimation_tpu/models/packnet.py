"""PackNet-01: self-supervised depth net with 3D packing/unpacking blocks.

Behavioral equivalent of reference detectron2/modeling/depth_net/PackNet01.py:17-209
and detectron2/layers/layers01.py:11-297, re-designed NHWC for TPU:

- ``packing`` is a space-to-depth reshape/transpose (layout chosen to be a
  pure reshape chain XLA folds into the next conv).
- The 3D conv over the packed dimension runs as ``lax.conv_general_dilated``
  with NDHWC layout — the packed-channel axis becomes the 3D depth axis.
- GroupNorm runs in fp32 under bf16 compute.

Versions: 'A' (skip concatenation) and 'B' (skip addition), selected by
cfg.MODEL.DEPTH_NET.VERSION ('1A' / '1B').
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .build import DEPTH_NET_REGISTRY, compute_dtype
from .layers import disp_to_depth, upsample_nearest_2x
from ..geometry.camera import resize_img


def space_to_depth(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """[B,H,W,C] → [B,H/r,W/r,C·r²] (inverse of :func:`depth_to_space`)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // r, r, W // r, r, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, H/r, W/r, C, r, r
    return x.reshape(B, H // r, W // r, C * r * r)


def depth_to_space(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """[B,H,W,C·r²] → [B,rH,rW,C] (PixelShuffle)."""
    B, H, W, Cr2 = x.shape
    C = Cr2 // (r * r)
    x = x.reshape(B, H, W, C, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, r, W, r, C
    return x.reshape(B, H * r, W * r, C)


class Conv2D(nn.Module):
    """Conv + GroupNorm(16) + ELU (reference layers01.py:11-39)."""

    out_channels: int
    kernel_size: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.kernel_size // 2
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="conv",
        )(x)
        # torch GroupNorm eps default (flax defaults to 1e-6)
        x = nn.GroupNorm(num_groups=16, epsilon=1e-5, dtype=jnp.float32, name="gn")(x)
        return nn.elu(x)


class ResidualConv(nn.Module):
    """Two Conv2D + 1×1 shortcut, GN + ELU on the sum (layers01.py:42-76)."""

    out_channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = Conv2D(self.out_channels, 3, self.stride, dtype=self.dtype, name="conv1")(x)
        out = Conv2D(self.out_channels, 3, 1, dtype=self.dtype, name="conv2")(out)
        shortcut = nn.Conv(
            self.out_channels,
            (1, 1),
            strides=(self.stride, self.stride),
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="conv3",
        )(x)
        summed = nn.GroupNorm(num_groups=16, epsilon=1e-5, dtype=jnp.float32, name="gn")(
            out + shortcut
        )
        return nn.elu(summed)


class ResidualBlock(nn.Module):
    out_channels: int
    num_blocks: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = ResidualConv(self.out_channels, self.stride, dtype=self.dtype, name="res0")(x)
        for i in range(1, self.num_blocks):
            x = ResidualConv(self.out_channels, 1, dtype=self.dtype, name=f"res{i}")(x)
        return x


class InvDepth(nn.Module):
    """3×3 conv → sigmoid / min_depth (layers01.py:103-127)."""

    min_depth: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            1, (3, 3), padding=1, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(), name="conv",
        )(x)
        return nn.sigmoid(x.astype(jnp.float32)) / self.min_depth


# 3D-conv-over-packed-dim backend. The op is a torch ``Conv3d(1, d, 3)``:
# ONE input channel, d=8 output channels — as a literal NDHWC conv its MXU
# contraction is 27×1 elements (≈1-2% tile utilization), and on TPU its
# [B,C,H,W,d=8] intermediate layout-pads the trailing dim 8→128 (16× HBM,
# OOM at reference shape). The "blocked" formulation re-expresses the
# depth-banded structure as a dense 2D conv over channel blocks of G with a
# 1-channel halo: contraction 9·(G+2), outputs G·d — real MXU tiles at
# ~(G+2)/3× redundant FLOPs (the band is embedded in a dense kernel).
# "auto" resolves at trace time: blocked on TPU, ndhwc elsewhere. Routing is
# measured, not assumed: see tools/microbench_conv3d.py.
_CONV3D_IMPL = "auto"
_CONV3D_BLOCK = 30


def set_conv3d_impl(impl: str, block: Optional[int] = None) -> None:
    """Select the packed-3D-conv backend ('auto' | 'ndhwc' | 'blocked'),
    module-level, read at trace time."""
    global _CONV3D_IMPL, _CONV3D_BLOCK
    if impl not in ("auto", "ndhwc", "blocked"):
        raise ValueError(f"conv3d impl {impl!r} not in ('auto', 'ndhwc', 'blocked')")
    _CONV3D_IMPL = impl
    if block is not None:
        _CONV3D_BLOCK = int(block)


def _conv3d_blocked_kernel(kernel: jnp.ndarray, G: int) -> jnp.ndarray:
    """Embed the [3,3,3,1,d] depth-band kernel into a dense 2D conv kernel
    [3, 3, G+2, G·d]: K2[dy,dx, cl+dz, cl·d+j] = K[dz,dy,dx,0,j]."""
    d = kernel.shape[-1]
    K2 = jnp.zeros((3, 3, G + 2, G * d), kernel.dtype)
    cl = jnp.arange(G)
    co = (cl * d)[:, None] + jnp.arange(d)[None]  # [G, d]
    for dz in range(3):
        K2 = K2.at[:, :, (cl + dz)[:, None], co].set(kernel[dz, :, :, 0, :][:, :, None, :])
    return K2


def _conv3d_over_packed_blocked(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray, G: int
) -> jnp.ndarray:
    """Blocked-halo formulation of :func:`_conv3d_over_packed` (bit-equal up
    to float reassociation; exactness-tested in tests/test_models.py).

    Channel blocks of G with a 1-channel zero-padded halo on each side fold
    into the batch axis; ONE dense [3,3,G+2,G·d] conv then computes every
    depth tap as an MXU contraction instead of a 1-input-channel 3D conv.
    """
    B, H, W, C = x.shape
    d = kernel.shape[-1]
    nblk = -(-C // G)
    Cp = nblk * G
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Cp - C)))
    xb = xp.reshape(B, H, W, nblk, G)
    zero = jnp.zeros((B, H, W, 1, 1), x.dtype)
    left = jnp.concatenate([zero, xb[..., :-1, G - 1 : G]], axis=3)
    right = jnp.concatenate([xb[..., 1:, 0:1], zero], axis=3)
    win = jnp.concatenate([left, xb, right], axis=-1)  # [B,H,W,nblk,G+2]
    win = win.transpose(0, 3, 1, 2, 4).reshape(B * nblk, H, W, G + 2)
    out = jax.lax.conv_general_dilated(
        win,
        _conv3d_blocked_kernel(kernel, G),
        window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = out.reshape(B, nblk, H, W, G, d).transpose(0, 2, 3, 5, 1, 4)
    out = out.reshape(B, H, W, d, Cp)[..., :C] + bias[..., None]
    return out.reshape(B, H, W, d * C)


def _conv3d_over_packed(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """3D conv treating the channel axis as depth: x [B,H,W,C] → [B,H,W,C·d].

    Equivalent role to reference layers01.py:252-257 / 292-296 (torch
    ``Conv3d(1, d, 3)`` over [B,1,C,H,W]).
    kernel: [3,3,3,1,d]; returns the depth axis folded back into channels
    d-major (channel = d_idx·C + c_idx), matching the torch
    ``view(b, c*d, h, w)`` flatten so converted reference weights (and the
    fixed-function PixelShuffle consumer in the unpack layer) line up
    exactly.
    """
    impl = _CONV3D_IMPL
    if impl == "auto":
        impl = "blocked" if jax.default_backend() == "tpu" else "ndhwc"
    if impl == "blocked":
        return _conv3d_over_packed_blocked(x, kernel, bias, _CONV3D_BLOCK)
    B, H, W, C = x.shape
    vol = x.transpose(0, 3, 1, 2)[..., None]  # [B, D=C, H, W, 1]
    out = jax.lax.conv_general_dilated(
        vol,
        kernel,
        window_strides=(1, 1, 1),
        padding=[(1, 1), (1, 1), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    out = out + bias
    d = kernel.shape[-1]
    # [B, C, H, W, d] → [B, H, W, d·C] (d-major, torch flatten order)
    return out.transpose(0, 2, 3, 4, 1).reshape(B, H, W, d * C)


class PackLayerConv3d(nn.Module):
    """space-to-depth ×r² → 3D conv over packed dim (d) → 2D conv back to C
    (layers01.py:222-257)."""

    in_channels: int
    kernel_size: int
    r: int = 2
    d: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = space_to_depth(x, self.r)
        kernel = self.param(
            "conv3d_kernel", nn.initializers.xavier_uniform(), (3, 3, 3, 1, self.d)
        )
        bias = self.param("conv3d_bias", nn.initializers.zeros, (self.d,))
        x = _conv3d_over_packed(
            x.astype(self.dtype), kernel.astype(self.dtype), bias.astype(self.dtype)
        )
        return Conv2D(self.in_channels, self.kernel_size, 1, dtype=self.dtype, name="conv")(x)


class UnpackLayerConv3d(nn.Module):
    """2D conv → 3D conv → PixelShuffle ×r (layers01.py:260-297)."""

    out_channels: int
    kernel_size: int
    r: int = 2
    d: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Conv2D(
            self.out_channels * self.r**2 // self.d,
            self.kernel_size,
            1,
            dtype=self.dtype,
            name="conv",
        )(x)
        kernel = self.param(
            "conv3d_kernel", nn.initializers.xavier_uniform(), (3, 3, 3, 1, self.d)
        )
        bias = self.param("conv3d_bias", nn.initializers.zeros, (self.d,))
        x = _conv3d_over_packed(
            x.astype(self.dtype), kernel.astype(self.dtype), bias.astype(self.dtype)
        )
        return depth_to_space(x, self.r)


@DEPTH_NET_REGISTRY.register()
class PackNet01(nn.Module):
    version: str = "A"
    max_depth: float = 80.0
    upsample_depth: bool = False
    dtype: Any = jnp.float32

    @classmethod
    def from_cfg(cls, cfg):
        return cls(
            version=str(cfg.MODEL.DEPTH_NET.get("VERSION", "1A"))[1:],
            max_depth=float(cfg.MODEL.MAX_DEPTH),
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
    ) -> List[jnp.ndarray]:
        from .depth_nets import flip_images

        if flip is not None:
            image = flip_images(image, flip)

        ni, no = 64, 1
        n1, n2, n3, n4, n5 = 64, 64, 128, 256, 512
        num_blocks = (2, 2, 3, 3)
        pack_kernel = (5, 3, 3, 3, 3)
        unpack_kernel = (3, 3, 3, 3, 3)

        if self.version == "A":  # channel concatenation
            n1o, n1i = n1, n1 + ni + no
            n2o, n2i = n2, n2 + n1 + no
            n3o, n3i = n3, n3 + n2 + no
            n4o, n4i = n4, n4 + n3
            n5o, n5i = n5, n5 + n4
        elif self.version == "B":  # channel addition
            n1o, n1i = n1, n1 + no
            n2o, n2i = n2, n2 + no
            n3o, n3i = n3 // 2, n3 // 2 + no
            n4o, n4i = n4 // 2, n4 // 2
            n5o, n5i = n5 // 2, n5 // 2
        else:
            raise ValueError(f"Unknown PackNet version {self.version}")

        dt = self.dtype
        x = Conv2D(ni, 5, 1, dtype=dt, name="pre_calc")(image.astype(dt))

        # encoder
        x1 = Conv2D(n1, 7, 1, dtype=dt, name="conv1")(x)
        x1p = PackLayerConv3d(n1, pack_kernel[0], dtype=dt, name="pack1")(x1)
        x2 = ResidualBlock(n2, num_blocks[0], 1, dtype=dt, name="conv2")(x1p)
        x2p = PackLayerConv3d(n2, pack_kernel[1], dtype=dt, name="pack2")(x2)
        x3 = ResidualBlock(n3, num_blocks[1], 1, dtype=dt, name="conv3")(x2p)
        x3p = PackLayerConv3d(n3, pack_kernel[2], dtype=dt, name="pack3")(x3)
        x4 = ResidualBlock(n4, num_blocks[2], 1, dtype=dt, name="conv4")(x3p)
        x4p = PackLayerConv3d(n4, pack_kernel[3], dtype=dt, name="pack4")(x4)
        x5 = ResidualBlock(n5, num_blocks[3], 1, dtype=dt, name="conv5")(x4p)
        x5p = PackLayerConv3d(n5, pack_kernel[4], dtype=dt, name="pack5")(x5)

        skip1, skip2, skip3, skip4, skip5 = x, x1p, x2p, x3p, x4p

        def merge(a, b):
            return jnp.concatenate([a, b], -1) if self.version == "A" else a + b

        # decoder
        unpack5 = UnpackLayerConv3d(n5o, unpack_kernel[0], dtype=dt, name="unpack5")(x5p)
        iconv5 = Conv2D(n5, 3, 1, dtype=dt, name="iconv5")(merge(unpack5, skip5))

        unpack4 = UnpackLayerConv3d(n4o, unpack_kernel[1], dtype=dt, name="unpack4")(iconv5)
        iconv4 = Conv2D(n4, 3, 1, dtype=dt, name="iconv4")(merge(unpack4, skip4))
        disp4 = InvDepth(dtype=dt, name="disp4")(iconv4)
        udisp4 = upsample_nearest_2x(disp4)

        unpack3 = UnpackLayerConv3d(n3o, unpack_kernel[2], dtype=dt, name="unpack3")(iconv4)
        cat3 = jnp.concatenate([merge(unpack3, skip3), udisp4.astype(dt)], -1)
        iconv3 = Conv2D(n3, 3, 1, dtype=dt, name="iconv3")(cat3)
        disp3 = InvDepth(dtype=dt, name="disp3")(iconv3)
        udisp3 = upsample_nearest_2x(disp3)

        unpack2 = UnpackLayerConv3d(n2o, unpack_kernel[3], dtype=dt, name="unpack2")(iconv3)
        cat2 = jnp.concatenate([merge(unpack2, skip2), udisp3.astype(dt)], -1)
        iconv2 = Conv2D(n2, 3, 1, dtype=dt, name="iconv2")(cat2)
        disp2 = InvDepth(dtype=dt, name="disp2")(iconv2)
        udisp2 = upsample_nearest_2x(disp2)

        unpack1 = UnpackLayerConv3d(n1o, unpack_kernel[4], dtype=dt, name="unpack1")(iconv2)
        cat1 = jnp.concatenate([merge(unpack1, skip1), udisp2.astype(dt)], -1)
        iconv1 = Conv2D(n1, 3, 1, dtype=dt, name="iconv1")(cat1)
        disp1 = InvDepth(dtype=dt, name="disp1")(iconv1)

        disps = [disp1, disp2, disp3, disp4]
        depths = [
            disp_to_depth(d, min_depth=0.1, max_depth=self.max_depth)[1] for d in disps
        ]

        if flip is not None:
            depths = [flip_images(d, flip) for d in depths]
        if self.upsample_depth:
            depths = [resize_img(d, image.shape[1:3], mode="nearest") for d in depths]
        return depths
