#!/usr/bin/env python
"""Micro-benchmark alternative lowerings of the warp gather and bilinear
resize on the real chip (fwd+bwd), to pick the fastest TPU formulation.

Variants:
  resample A: take_along_axis on [B, HW, C] (current)
  resample C: channels-major single gather [B, C, HW] along minor axis
  resize   G: chained fancy-index gathers (current)
  resize   M: separable interpolation as two matmuls (MXU)
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from simpledepthestimation_tpu.engine.defaults import enable_compilation_cache

    enable_compilation_cache()

    B, H, W, C = 16, 192, 640, 3
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    x = jnp.asarray(rng.uniform(0, W - 1, (B, H, W)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, H - 1, (B, H, W)).astype(np.float32))

    def time_fn(fn, *args, steps=30):
        g = jax.jit(jax.grad(lambda *a: jnp.sum(fn(*a) ** 2)))
        out = g(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = g(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / steps * 1000

    # ----- resample variants ------------------------------------------------
    from simpledepthestimation_tpu.ops.resample import resample_bilinear

    def resample_chmajor(image, xx, yy):
        Bb, Hh, Ww, Cc = image.shape
        N = Hh * Ww
        xx = xx.reshape(Bb, N)
        yy = yy.reshape(Bb, N)
        x0 = jnp.floor(xx)
        y0 = jnp.floor(yy)
        wx = (xx - x0)[:, None, :]
        wy = (yy - y0)[:, None, :]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        flat = image.transpose(0, 3, 1, 2).reshape(Bb, Cc, Hh * Ww)  # [B,C,HW]

        def corner(ix, iy):
            inb = (ix >= 0) & (ix <= Ww - 1) & (iy >= 0) & (iy <= Hh - 1)
            idx = jnp.clip(iy, 0, Hh - 1) * Ww + jnp.clip(ix, 0, Ww - 1)
            vals = jnp.take_along_axis(flat, idx[:, None, :], axis=2)  # [B,C,N]
            return vals * inb[:, None, :].astype(flat.dtype)

        v00 = corner(x0i, y0i)
        v01 = corner(x0i + 1, y0i)
        v10 = corner(x0i, y0i + 1)
        v11 = corner(x0i + 1, y0i + 1)
        out = (v00 * (1 - wx) + v01 * wx) * (1 - wy) + (v10 * (1 - wx) + v11 * wx) * wy
        return out.reshape(Bb, Cc, Hh, Ww).transpose(0, 2, 3, 1)

    print(f"resample A (NHWC gather):  {time_fn(resample_bilinear, img, x, y):8.2f} ms")
    print(f"resample C (ch-major):     {time_fn(resample_chmajor, img, x, y):8.2f} ms")

    # ----- resize variants --------------------------------------------------
    from simpledepthestimation_tpu.geometry.camera import resize_img

    def resize_matmul(image, dh, dw):
        Hh, Ww = image.shape[1:3]
        def interp_matrix(src, dst):
            pos = jnp.linspace(0.0, src - 1.0, dst)
            lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, src - 1)
            hi = jnp.clip(lo + 1, 0, src - 1)
            w = pos - lo
            m = jnp.zeros((dst, src))
            m = m.at[jnp.arange(dst), lo].add(1 - w)
            m = m.at[jnp.arange(dst), hi].add(w)
            return m

        Ry = interp_matrix(Hh, dh)  # [dh, H]
        Rx = interp_matrix(Ww, dw)  # [dw, W]
        out = jnp.einsum("yh,bhwc->bywc", Ry, image, precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("xw,bywc->byxc", Rx, out, precision=jax.lax.Precision.HIGHEST)

    for (dh, dw) in ((96, 320), (48, 160), (24, 80)):
        a = time_fn(partial(resize_img, dst_hw=(dh, dw)), img)
        b = time_fn(lambda im: resize_matmul(im, dh, dw), img)
        print(f"resize {dh}x{dw}: gather {a:7.2f} ms   matmul {b:7.2f} ms")


if __name__ == "__main__":
    main()
