#!/usr/bin/env python
"""Test whether warp-gather cost scales with gathered ELEMENTS (indices ×
slice elems) rather than bytes: if yes, packing RGB u8 into one u32 word
(1 gathered element/pixel instead of 3) should cut the warp ~3×.

Variants (all: grad wrt coords of sum(resample), the loss-path shape):
  f32-C3 : current resample_bilinear on [B,H,W,3] f32
  f32-C1 : same on [B,H,W,1] (element-count scaling probe)
  u32pack: RGB packed into uint32, gathered as [B,H*W] int32, VPU unpack
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def packed_resample(packed_flat, x, y, H, W):
    """Bilinear resample from a u32-packed RGB image.

    packed_flat: [B, H*W] int32 (r | g<<8 | b<<16, each channel u8).
    x, y: [B, N] float pixel coords. Returns [B, N, 3] f32 in [0,1].
    """
    import jax.numpy as jnp

    def corner(ix, iy):
        inb = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
        v = jnp.take_along_axis(packed_flat, idx, axis=1)  # [B,N] int32
        r = (v & 0xFF).astype(jnp.float32)
        g = ((v >> 8) & 0xFF).astype(jnp.float32)
        b = ((v >> 16) & 0xFF).astype(jnp.float32)
        rgb = jnp.stack([r, g, b], axis=-1) * (1.0 / 255.0)
        return rgb * inb[..., None].astype(jnp.float32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    v00 = corner(x0i, y0i)
    v01 = corner(x0i + 1, y0i)
    v10 = corner(x0i, y0i + 1)
    v11 = corner(x0i + 1, y0i + 1)

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def xpair_resample(image, x, y):
    """Bilinear resample with TWO gathers: each fetches a (1,2,C) slice —
    the x-adjacent corner pair, contiguous in memory — per output pixel,
    halving the gather index count vs the 4-corner formulation."""
    import jax
    import jax.numpy as jnp

    B, H, W, C = image.shape
    N = x.shape[1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    xs = jnp.clip(x0i, 0, W - 2)  # slice start: covers xs, xs+1
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3),
        collapsed_slice_dims=(1,),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )

    def row_pair(yi):
        inb_y = (yi >= 0) & (yi <= H - 1)
        starts = jnp.stack([jnp.clip(yi, 0, H - 1), xs], axis=-1)  # [B,N,2]
        pair = jax.lax.gather(
            image, starts, dimension_numbers=dnums, slice_sizes=(1, 1, 2, C),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # [B,N,2,C]
        # select true corners out of the (xs, xs+1) pair
        o0 = jnp.clip(x0i - xs, 0, 1)[..., None]
        o1 = jnp.clip(x0i + 1 - xs, 0, 1)[..., None]
        v0 = jnp.where(o0 == 0, pair[:, :, 0], pair[:, :, 1])
        v1 = jnp.where(o1 == 0, pair[:, :, 0], pair[:, :, 1])
        inb0 = ((x0i >= 0) & (x0i <= W - 1) & inb_y)[..., None]
        inb1 = ((x0i + 1 >= 0) & (x0i + 1 <= W - 1) & inb_y)[..., None]
        v0 = v0 * inb0.astype(image.dtype)
        v1 = v1 * inb1.astype(image.dtype)
        return v0, v1

    v00, v01 = row_pair(y0i)
    v10, v11 = row_pair(y0i + 1)

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def flat_resample(flat_img, x, y, B, H, W):
    """4-corner take() on a batch-flattened [B*H*W, C] operand (global
    indices with the batch offset folded in)."""
    import jax.numpy as jnp

    base = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None]

    def corner(ix, iy):
        inb = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        idx = base + jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
        v = jnp.take(flat_img, idx.reshape(-1), axis=0).reshape(
            idx.shape + (flat_img.shape[-1],)
        )
        return v * inb[..., None].astype(flat_img.dtype)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    v00 = corner(x0i, y0i)
    v01 = corner(x0i + 1, y0i)
    v10 = corner(x0i, y0i + 1)
    v11 = corner(x0i + 1, y0i + 1)

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def main():
    import jax
    import jax.numpy as jnp

    from simpledepthestimation_tpu.engine.defaults import enable_compilation_cache

    enable_compilation_cache()
    from simpledepthestimation_tpu.ops.resample import resample_bilinear

    B, H, W = 16, 192, 640
    rng = np.random.RandomState(0)
    img_u8 = rng.randint(0, 256, (B, H, W, 3)).astype(np.uint8)
    img = jnp.asarray(img_u8.astype(np.float32) / 255.0)
    img1 = img[..., :1]
    packed = jnp.asarray(
        (
            img_u8[..., 0].astype(np.int32)
            | (img_u8[..., 1].astype(np.int32) << 8)
            | (img_u8[..., 2].astype(np.int32) << 16)
        ).reshape(B, H * W)
    )
    xs = jnp.asarray(rng.uniform(-1, W, (B, H, W)).astype(np.float32))
    ys = jnp.asarray(rng.uniform(-1, H, (B, H, W)).astype(np.float32))
    xsf = xs.reshape(B, -1)
    ysf = ys.reshape(B, -1)

    # correctness: packed == f32 path exactly (u8/255 values are exact f32)
    ref = np.asarray(resample_bilinear(img, xs, ys)).reshape(B, -1, 3)
    got = np.asarray(packed_resample(packed, xsf, ysf, H, W))
    print(f"packed vs f32 max err: {np.abs(ref - got).max():.2e}")

    def timed(fn, steps=50):
        g = jax.jit(
            jax.grad(lambda xx, yy: jnp.sum(fn(xx, yy)), argnums=(0, 1))
        )
        out = g(xsf, ysf)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = g(xsf, ysf)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / steps * 1000

    refx = np.asarray(xpair_resample(img, xsf, ysf)).reshape(B, -1, 3)
    print(f"xpair  vs f32 max err: {np.abs(ref - refx).max():.2e}")

    t3 = timed(lambda xx, yy: resample_bilinear(img, xx.reshape(B, H, W), yy.reshape(B, H, W)))
    t1 = timed(lambda xx, yy: resample_bilinear(img1, xx.reshape(B, H, W), yy.reshape(B, H, W)))
    tp = timed(lambda xx, yy: packed_resample(packed, xx, yy, H, W))
    tx = timed(lambda xx, yy: xpair_resample(img, xx, yy))
    flat_img = img.reshape(B * H * W, 3)
    reff = np.asarray(flat_resample(flat_img, xsf, ysf, B, H, W))
    print(f"flat   vs f32 max err: {np.abs(ref - reff).max():.2e}")
    tf = timed(lambda xx, yy: flat_resample(flat_img, xx, yy, B, H, W))
    print(f"f32-C3  grad-coords: {t3:8.2f} ms")
    print(f"f32-C1  grad-coords: {t1:8.2f} ms")
    print(f"u32pack grad-coords: {tp:8.2f} ms")
    print(f"xpair   grad-coords: {tx:8.2f} ms")
    print(f"flat    grad-coords: {tf:8.2f} ms")


if __name__ == "__main__":
    main()
