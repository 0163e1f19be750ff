#!/usr/bin/env python
"""Compare warp-gather formulations fwd+bwd(depth-like path) on the chip:

  4gather-f32 : current (4 × take_along_axis corner gathers)
  4gather-bf16: same, gathering a bf16 image
  patch-f32   : one lax.gather of 2×2×C patches + in-patch selects
  patch-bf16  : patch gather on bf16 image
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def patch_resample(image, x, y):
    """One 2×2-patch gather bilinear resample (zeros padding,
    align_corners unnormalized coords)."""
    import jax
    import jax.numpy as jnp

    B, H, W, C = image.shape
    out_shape = x.shape[1:]
    N = int(np.prod(out_shape))
    x = x.reshape(B, N)
    y = y.reshape(B, N)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(image.dtype)[..., None]
    wy = (y - y0).astype(image.dtype)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    ys_start = jnp.clip(y0i, 0, H - 2)
    xs_start = jnp.clip(x0i, 0, W - 2)
    starts = jnp.stack([ys_start, xs_start], axis=-1)  # [B, N, 2]

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    patches = jax.lax.gather(
        image,
        starts,
        dimension_numbers=dnums,
        slice_sizes=(1, 2, 2, C),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # [B, N, 2, 2, C]
    patches = patches.reshape(B, N, 2, 2, C)

    # in-patch row/col offset of each true corner (0 or 1)
    oy0 = jnp.clip(y0i - ys_start, 0, 1)[..., None, None]
    ox0 = jnp.clip(x0i - xs_start, 0, 1)[..., None]
    oy1 = jnp.clip(y0i + 1 - ys_start, 0, 1)[..., None, None]
    ox1 = jnp.clip(x0i + 1 - xs_start, 0, 1)[..., None]

    rows0 = jnp.where(oy0 == 0, patches[:, :, 0], patches[:, :, 1])  # [B,N,2,C]
    rows1 = jnp.where(oy1 == 0, patches[:, :, 0], patches[:, :, 1])
    v00 = jnp.where(ox0 == 0, rows0[:, :, 0], rows0[:, :, 1])  # [B,N,C]
    v01 = jnp.where(ox1 == 0, rows0[:, :, 0], rows0[:, :, 1])
    v10 = jnp.where(ox0 == 0, rows1[:, :, 0], rows1[:, :, 1])
    v11 = jnp.where(ox1 == 0, rows1[:, :, 0], rows1[:, :, 1])

    def inb(ix, iy):
        return (
            (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        ).astype(image.dtype)[..., None]

    v00 = v00 * inb(x0i, y0i)
    v01 = v01 * inb(x0i + 1, y0i)
    v10 = v10 * inb(x0i, y0i + 1)
    v11 = v11 * inb(x0i + 1, y0i + 1)

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy
    return out.reshape((B,) + out_shape + (C,))


def main():
    import jax
    import jax.numpy as jnp

    from simpledepthestimation_tpu.engine.defaults import enable_compilation_cache

    enable_compilation_cache()
    from simpledepthestimation_tpu.ops.resample import resample_bilinear

    B, H, W, C = 16, 192, 640, 3
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    img_bf16 = img.astype(jnp.bfloat16)
    xs = jnp.asarray(rng.uniform(-1, W, (B, H, W)).astype(np.float32))
    ys = jnp.asarray(rng.uniform(-1, H, (B, H, W)).astype(np.float32))

    # correctness check of the patch variant
    ref = np.asarray(resample_bilinear(img, xs, ys))
    got = np.asarray(patch_resample(img, xs, ys))
    err = np.abs(ref - got).max()
    print(f"patch vs 4gather max err: {err:.2e}")

    def timed(fn, *args, steps=50):
        # grad wrt the coordinates (the expensive path in the loss)
        g = jax.jit(jax.grad(lambda xx, yy: jnp.sum(fn(args[0], xx, yy).astype(jnp.float32)), argnums=(0, 1)))
        out = g(args[1], args[2])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = g(args[1], args[2])
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / steps * 1000

    print(f"4gather-f32  grad-coords: {timed(resample_bilinear, img, xs, ys):8.2f} ms")
    print(f"4gather-bf16 grad-coords: {timed(resample_bilinear, img_bf16, xs, ys):8.2f} ms")
    print(f"patch-f32    grad-coords: {timed(patch_resample, img, xs, ys):8.2f} ms")
    print(f"patch-bf16   grad-coords: {timed(patch_resample, img_bf16, xs, ys):8.2f} ms")


if __name__ == "__main__":
    main()
