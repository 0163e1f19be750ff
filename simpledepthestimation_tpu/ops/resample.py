"""Bilinear image resampling (the gather-heavy warp at the heart of
self-supervised depth training).

Exact semantics of ``torch.nn.functional.grid_sample(mode='bilinear',
padding_mode='zeros', align_corners=True)`` (used at reference
detectron2/geometry/camera.py:196) and of the TF-style gather resampler
(reference detectron2/geometry/resampler.py:65-122), re-designed for TPU:

- NHWC layout; the gather is a single-axis ``jnp.take`` on the
  batch-flattened [B*H*W, C] operand with the batch offset folded into the
  indices — measured 1.54× faster on v5e than the batched [B, H*W, C]
  ``take_along_axis`` formulation (tools/microbench_packed.py; both are
  index-throughput-bound, but XLA's global single-axis gather lowering is
  cheaper per index). Channels ride the lane dimension.
- Gradients flow through both the image (gather transpose = scatter-add) and
  the coordinates (analytic bilinear weight derivative), matching
  grid_sample's autograd.
- A fused Pallas kernel for warp+photometric lives in ops/pallas_warp.py;
  this jnp composition is the reference implementation and fallback.
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather_corner(
    flat_img: jnp.ndarray,
    base: jnp.ndarray,
    ix: jnp.ndarray,
    iy: jnp.ndarray,
    H: int,
    W: int,
):
    """Gather pixel values at integer (ix, iy), zero-filling out-of-bounds.

    flat_img: [B*H*W, C]; base: [B, 1] per-batch flat offsets (b·H·W);
    ix, iy: [B, N] int32. Returns values [B, N, C].
    """
    inb = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
    idx = base + jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
    vals = jnp.take(flat_img, idx.reshape(-1), axis=0, mode="clip").reshape(
        idx.shape + (flat_img.shape[-1],)
    )
    return vals * inb[..., None].astype(flat_img.dtype)


def resample_bilinear(image: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of NHWC ``image`` at unnormalized pixel coords.

    image: [B, H, W, C]; x, y: [B, h, w] float pixel coordinates.
    Out-of-bounds contributions are zero (padding_mode='zeros'): every corner
    is masked individually, so partially-outside samples fade out exactly as
    grid_sample does.
    """
    B, H, W, C = image.shape
    out_shape = x.shape[1:]
    N = 1
    for s in out_shape:
        N *= s
    x = x.reshape(B, N)
    y = y.reshape(B, N)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(image.dtype)[..., None]
    wy = (y - y0).astype(image.dtype)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = image.reshape(B * H * W, C)
    base = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None]
    v00 = _gather_corner(flat, base, x0i, y0i, H, W)
    v01 = _gather_corner(flat, base, x0i + 1, y0i, H, W)
    v10 = _gather_corner(flat, base, x0i, y0i + 1, H, W)
    v11 = _gather_corner(flat, base, x0i + 1, y0i + 1, H, W)

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy
    return out.reshape((B,) + out_shape + (C,))


def grid_sample_bilinear(image: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """``F.grid_sample`` parity: normalized [-1,1] grid, align_corners=True,
    bilinear, zeros padding.

    image: [B, H, W, C]; grid: [B, h, w, 2] with (x, y) in [-1, 1].
    """
    B, H, W, C = image.shape
    x = (grid[..., 0] + 1.0) * (W - 1) / 2.0
    y = (grid[..., 1] + 1.0) * (H - 1) / 2.0
    return resample_bilinear(image, x, y)


def resampler_with_unstacked_warp(
    image: jnp.ndarray, warp_x: jnp.ndarray, warp_y: jnp.ndarray, safe: bool = True
) -> jnp.ndarray:
    """TF-style resampler on unnormalized coords (reference resampler.py:65-122).

    Identical math to :func:`resample_bilinear`; kept as a named entry point
    for capability parity (used by view_synthesis_v2 paths).
    """
    del safe  # zero-fill OOB is always on, matching safe_gather_nd
    return resample_bilinear(image, warp_x, warp_y)
