#!/usr/bin/env python
"""Banded MXU warp kernel vs gather formulations on real TPU (round 2,
VERDICT item 2a).

Times one full warp plane [B, 192, 640, 3] fwd + grad-wrt-coords (the
production backward — the warped operand is the constant context frame) at
the flagship batch and at B=48, with ego-motion-like coordinates, for:

- 4gather:   unpacked 4-corner flat take (round-1 formulation)
- packed:    row-pair packed 2-gather (round-2 formulation)
- banded f32/bf16: the Pallas one-hot-matmul kernel (ops/pallas_warp.py)

Also reports max |delta| vs the 4gather oracle for each variant.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_coords(rng, B, H, W):
    xs = np.tile(np.arange(W, dtype=np.float32), (B, H, 1))
    ys = np.tile(np.arange(H, dtype=np.float32)[:, None], (B, 1, W))
    disp = 12.0 * rng.rand(B, H, W).astype(np.float32)
    x = xs - disp + rng.randn(B, H, W).astype(np.float32)
    y = ys + 0.5 * rng.randn(B, H, W).astype(np.float32)
    x = np.clip(x, 0.0, W - 1.0)
    y = np.clip(y, 0.0, H - 1.0)
    return x.astype(np.float32), y.astype(np.float32)


def run():
    import jax
    import jax.numpy as jnp

    from simpledepthestimation_tpu.engine.defaults import enable_compilation_cache
    enable_compilation_cache()
    from simpledepthestimation_tpu.ops.resample import (
        resample_bilinear,
        _resample_bilinear_4gather,
    )
    from simpledepthestimation_tpu.ops import pallas_warp

    H, W, C = 192, 640, 3
    rng = np.random.RandomState(0)
    t00 = time.time()

    def timeit(name, g, xy, n=20):
        r = g(xy)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = g(xy)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"[{time.time()-t00:7.1f}s] {name:44s} {dt:8.2f} ms", flush=True)
        return dt

    variants = [
        ("4gather", lambda im, x, y: _resample_bilinear_4gather(im, x, y)),
        ("packed", lambda im, x, y: resample_bilinear(im, x, y)),
        ("banded f32", lambda im, x, y: pallas_warp.warp_banded(
            im, x, y, dot_dtype=jnp.float32)),
        ("banded bf16", lambda im, x, y: pallas_warp.warp_banded(
            im, x, y, dot_dtype=jnp.bfloat16)),
    ]

    results = {}
    for B in (16, 48):
        img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
        x, y = make_coords(np.random.RandomState(1), B, H, W)
        xy = jnp.stack([jnp.asarray(x), jnp.asarray(y)])

        ref = np.asarray(_resample_bilinear_4gather(img, xy[0], xy[1]))
        for name, f in variants:
            got = np.asarray(jax.jit(f)(img, xy[0], xy[1]))
            delta = float(np.abs(got.astype(np.float32) - ref).max())
            viol = ""
            if name.startswith("banded"):
                _, v = jax.jit(
                    lambda im, xx, yy, f32=(name == "banded f32"): pallas_warp.warp_banded_raw(
                        im, xx, yy,
                        dot_dtype=jnp.float32 if f32 else jnp.bfloat16)
                )(img, xy[0], xy[1])
                viol = f" viol={bool(v)}"
            print(f"  B={B} {name:12s} max|d|={delta:.2e}{viol}", flush=True)

            g = jax.jit(jax.grad(
                lambda c, f=f: jnp.sum(f(img, c[0], c[1]) ** 2)))
            results[(B, name)] = timeit(f"B={B} {name} fwd+dcoords", g, xy)

            fw = jax.jit(lambda c, f=f: f(img, c[0], c[1]))
            results[(B, name + " fwd")] = timeit(f"B={B} {name} fwd only", fw, xy)

    print()
    for k, v in sorted(results.items()):
        print(f"  B={k[0]:2d} {k[1]:22s} {v:8.2f} ms")


if __name__ == "__main__":
    run()
