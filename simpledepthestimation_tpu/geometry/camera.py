"""Differentiable pinhole-camera geometry in NHWC jnp.

TPU-native re-design of reference detectron2/geometry/camera.py:14-234.
Functional (no in-place mutation, no lru-cached device tensors — XLA hoists
the constant grids at compile time), NHWC layout (TPU conv layout), and the
bilinear warp is a gather composition with the exact semantics of
``F.grid_sample(mode='bilinear', padding_mode='zeros', align_corners=True)``.

All functions are jit-safe: static shapes, no data-dependent control flow.

The tiny [3,3]×[3,HW] projection contractions run at ``Precision.HIGHEST``:
the K·K⁻¹ round trip catastrophically cancels (fx·px + cx·z with
fx·px ≈ −cx·z), so the TPU's default bf16 matmul precision would cost
~0.1 px of warp accuracy for zero speed benefit (these contractions are
a negligible fraction of step FLOPs).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.resample import grid_sample_bilinear

_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def scale_intrinsics(K: jnp.ndarray, x_scale: float, y_scale: float) -> jnp.ndarray:
    """Scale fx/cx by x_scale and fy/cy by y_scale (reference camera.py:14-22).

    Functional: returns a new K.
    """
    scale = jnp.array(
        [[x_scale, 1.0, x_scale], [1.0, y_scale, y_scale], [1.0, 1.0, 1.0]],
        dtype=K.dtype,
    )
    return K * scale


def inv_intrinsics(K: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a pinhole K [B,3,3] (reference camera.py:25-37)."""
    fx, fy = K[:, 0, 0], K[:, 1, 1]
    cx, cy = K[:, 0, 2], K[:, 1, 2]
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    row0 = jnp.stack([1.0 / fx, zeros, -cx / fx], axis=-1)
    row1 = jnp.stack([zeros, 1.0 / fy, -cy / fy], axis=-1)
    row2 = jnp.stack([zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2], axis=1)


def resize_img(image: jnp.ndarray, dst_hw: Tuple[int, int], mode: str = "bilinear") -> jnp.ndarray:
    """Resize NHWC image. Matches torch ``F.interpolate`` semantics used by the
    reference (camera.py:40-46): align_corners=True for bilinear, plain
    nearest (floor of scaled index) otherwise.
    """
    H, W = image.shape[1], image.shape[2]
    dh, dw = dst_hw
    if H == dh and W == dw:
        return image
    if mode == "nearest":
        # torch 'nearest': src_idx = floor(dst_idx * scale)
        ys = jnp.floor(jnp.arange(dh) * (H / dh)).astype(jnp.int32)
        xs = jnp.floor(jnp.arange(dw) * (W / dw)).astype(jnp.int32)
        return image[:, ys][:, :, xs]
    if mode == "bilinear":
        # align_corners=True bilinear via explicit gather-interpolation
        ys = jnp.linspace(0.0, H - 1.0, dh)
        xs = jnp.linspace(0.0, W - 1.0, dw)
        y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
        y1 = jnp.clip(y0 + 1, 0, H - 1)
        x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
        x1 = jnp.clip(x0 + 1, 0, W - 1)
        wy = (ys - y0).astype(image.dtype)[None, :, None, None]
        wx = (xs - x0).astype(image.dtype)[None, None, :, None]
        top = image[:, y0][:, :, x0] * (1 - wx) + image[:, y0][:, :, x1] * wx
        bot = image[:, y1][:, :, x0] * (1 - wx) + image[:, y1][:, :, x1] * wx
        return top * (1 - wy) + bot * wy
    raise ValueError(f"Unknown resize mode {mode}")


def resize_img_avgpool(image: jnp.ndarray, dst_hw: Tuple[int, int]) -> jnp.ndarray:
    """Adaptive average-pool resize (reference camera.py:49-54). Supports the
    common integer-factor case exactly."""
    H, W = image.shape[1], image.shape[2]
    dh, dw = dst_hw
    if H == dh and W == dw:
        return image
    assert H % dh == 0 and W % dw == 0, "avgpool resize needs integer factors"
    fh, fw = H // dh, W // dw
    B, _, _, C = image.shape
    return image.reshape(B, dh, fh, dw, fw, C).mean(axis=(2, 4))


def image_grid(H: int, W: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel grid [3, H, W] of (x, y, 1) (reference camera.py:94-122).

    No batch dim / caching: XLA constant-folds this inside jit.
    """
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=dtype), jnp.arange(W, dtype=dtype), indexing="ij"
    )
    return jnp.stack([xs, ys, jnp.ones_like(xs)], axis=0)


def img_to_points(depth: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Backproject depth [B,H,W,1] through R [B,3,3], t [B,3,1] → points [B,3,H*W].

    Reference camera.py:125-138 (kept flat in HW for the downstream matmul —
    a [3, HW] MXU-friendly contraction).
    """
    B, H, W, _ = depth.shape
    grid = image_grid(H, W, depth.dtype).reshape(3, H * W)  # [3, HW]
    flat_depth = depth.reshape(B, 1, H * W)
    pts = grid[None] * flat_depth  # [B,3,HW]
    return _einsum("bij,bjn->bin", R, pts) + t


def points_to_img(
    points: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray, H: int, W: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Project points [B,3,HW] with R [B,3,3], t [B,3,HW or 1] to pixel coords.

    Returns (coords [B,H,W,2] xy, depth [B,H,W,1], valid mask [B,H,W,1]);
    semantics of reference camera.py:141-163: z-divide with +1e-6, validity =
    finite & 0<=X<W-1 & 0<=Y<H-1 & Z>0, Z clamped at 1e-5.
    """
    B = points.shape[0]
    proj = _einsum("bij,bjn->bin", R, points) + t  # [B,3,HW]
    X = proj[:, 0] / (proj[:, 2] + 1e-6)
    Y = proj[:, 1] / (proj[:, 2] + 1e-6)
    Z = proj[:, 2]

    valid = (
        jnp.isfinite(X)
        & (X >= 0)
        & (X < W - 1)
        & jnp.isfinite(Y)
        & (Y >= 0)
        & (Y < H - 1)
        & (Z > 0)
    )
    Z = jnp.maximum(Z, 1e-5)

    coords = jnp.stack([X, Y], axis=-1).reshape(B, H, W, 2)
    return coords, Z.reshape(B, H, W, 1), valid.reshape(B, H, W, 1)


def view_synthesis(
    image_B: jnp.ndarray,
    depth_A: jnp.ndarray,
    intrinsics: jnp.ndarray,
    R_A_to_B: jnp.ndarray,
    t_A_to_B: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Warp image_B into frame A via depth_A and relative pose (reference
    camera.py:166-202).

    image_B: [B,H,W,C]; depth_A: [B,H,W,1]; intrinsics: [B,3,3];
    R_A_to_B: [B,3,3]; t_A_to_B: [B,3,1] rigid or [B,H,W,3] dense motion.

    Returns (sampled_B [B,H,W,C], depth_in_B [B,H,W,1],
    normalized coords [B,H,W,2], valid mask [B,H,W,1]).
    """
    B, H, W, _ = image_B.shape

    points_A = img_to_points(
        depth_A, R=inv_intrinsics(intrinsics), t=jnp.zeros((B, 3, 1), image_B.dtype)
    )  # [B,3,HW]

    R = _einsum("bij,bjk->bik", intrinsics, R_A_to_B)
    if t_A_to_B.ndim == 4:  # dense motion field [B,H,W,3]
        t_flat = t_A_to_B.reshape(B, H * W, 3).transpose(0, 2, 1)
    else:  # rigid [B,3,1]
        t_flat = t_A_to_B.reshape(B, 3, 1)
    t = _einsum("bij,bjn->bin", intrinsics, t_flat)

    coords, depth_in_B, valid = points_to_img(points_A, R, t, H, W)

    Xs = jnp.nan_to_num(coords[..., 0])
    Ys = jnp.nan_to_num(coords[..., 1])
    Xs = jnp.clip(Xs, 0.0, W - 1.0)
    Ys = jnp.clip(Ys, 0.0, H - 1.0)

    # normalized [-1, 1] coords (align_corners=True convention)
    Xn = 2.0 * Xs / (W - 1.0) - 1.0
    Yn = 2.0 * Ys / (H - 1.0) - 1.0
    norm_coords = jnp.stack([Xn, Yn], axis=-1)

    sampled_B = grid_sample_bilinear(image_B, norm_coords)

    return sampled_B, depth_in_B, norm_coords, valid


def view_synthesis_v2(
    image_B: jnp.ndarray,
    depth_A: jnp.ndarray,
    intrinsics: jnp.ndarray,
    R_A_to_B: jnp.ndarray,
    t_A_to_B: jnp.ndarray,
):
    """Variant sampling with the TF-style unnormalized-coordinate resampler
    (reference camera.py:205-234). Same projection as :func:`view_synthesis`,
    gather on raw pixel coords."""
    from ..ops.resample import resampler_with_unstacked_warp

    B, H, W, _ = image_B.shape
    points_A = img_to_points(
        depth_A, R=inv_intrinsics(intrinsics), t=jnp.zeros((B, 3, 1), image_B.dtype)
    )
    R = _einsum("bij,bjk->bik", intrinsics, R_A_to_B)
    if t_A_to_B.ndim == 4:
        t_flat = t_A_to_B.reshape(B, H * W, 3).transpose(0, 2, 1)
    else:
        t_flat = t_A_to_B.reshape(B, 3, 1)
    t = _einsum("bij,bjn->bin", intrinsics, t_flat)

    coords, depth_in_B, valid = points_to_img(points_A, R, t, H, W)
    Xs = jnp.clip(jnp.nan_to_num(coords[..., 0]), 0.0, W - 1.0)
    Ys = jnp.clip(jnp.nan_to_num(coords[..., 1]), 0.0, H - 1.0)
    sampled_B = resampler_with_unstacked_warp(image_B, Xs, Ys)
    return sampled_B, depth_in_B, jnp.stack([Xs, Ys], -1), valid
