#!/usr/bin/env python
"""Image-cotangent implementations on the chip: packed-gather VJP scatter
vs the banded MXU kernel (ops/pallas_warp.warp_image_cotangent).

The MotionLearning cycle loss differentiates a warp w.r.t. its IMAGE
operand at detached coords (reference motion_loss.py:11).  Default shape =
that loss's production call: [2B=32, 128, 416, 3].
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def bench(f, *args, iters=20):
    import jax
    import jax.numpy as jnp

    g = jax.jit(lambda *a: jnp.sum(f(*a)))
    float(jax.device_get(g(*args)))  # compile + honest sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    float(jax.device_get(out))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from simpledepthestimation_tpu.ops import pallas_warp, resample

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--width", type=int, default=416)
    p.add_argument("--channels", type=int, default=3)
    p.add_argument("--disp", type=float, default=8.0,
                   help="max |displacement| of the coherent coord field")
    args = p.parse_args()

    B, H, W, C = args.batch, args.height, args.width, args.channels
    rng = np.random.RandomState(0)
    ys, xs = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    d = args.disp
    x = jnp.asarray(np.clip(xs[None] + d * (rng.rand(B, H, W) - 0.5), 0, W - 1)
                    .astype(np.float32))
    y = jnp.asarray(np.clip(ys[None] + d * (rng.rand(B, H, W) - 0.5), 0, H - 1)
                    .astype(np.float32))
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    ct = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))

    def vjp_of(f):
        def run(ct):
            _, vjp = jax.vjp(f, img)
            (d_img,) = vjp(ct)
            return d_img
        return run

    print(f"image-cotangent on chip  [{B},{H},{W},{C}] disp±{d/2:.0f}px")
    ms = bench(vjp_of(lambda im: resample._resample_bilinear_4gather(im, x, y)), ct)
    print(f"  4gather VJP (4 scatters):        {ms:7.2f} ms")
    ms = bench(vjp_of(lambda im: resample._resample_bilinear_packed(im, x, y)), ct)
    print(f"  packed VJP (2 scatters + fold):  {ms:7.2f} ms")
    for dd in (jnp.bfloat16, jnp.float32):
        ms = bench(
            lambda ct: pallas_warp.warp_image_cotangent(ct, x, y, H, dot_dtype=dd),
            ct,
        )
        print(f"  banded kernel ({dd.__name__:8}):     {ms:7.2f} ms")

    # value check vs the exact oracle (bf16 rounds interp weights only)
    want = vjp_of(lambda im: resample._resample_bilinear_4gather(im, x, y))(ct)
    got = pallas_warp.warp_image_cotangent(ct, x, y, H, dot_dtype=jnp.float32)
    err = float(jnp.max(jnp.abs(got - want)))
    print(f"  f32 kernel max|err| vs oracle: {err:.2e}")


if __name__ == "__main__":
    main()
