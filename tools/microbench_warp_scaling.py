#!/usr/bin/env python
"""Warp-gather scaling diagnosis (round 2).

The row-pair packed gather measured 2.06x at B=16 with ego-motion-like
coords (tools/microbench_warp_packed.py) but the full-step bench did not
move, and at B=48 with uniform-random coords the packed formulation was
measured SLOWER than the 4-gather (176 vs 149 ms).  Two confounded
variables: warp batch (16 vs 48) and coordinate distribution (ego-like
smooth/near-diagonal vs uniform random).  This bench fills the matrix and
times candidate fixes:

- chunked: the flat take split into 4 sequential index chunks (tests
  whether the B=48 cliff is a superlinearity in single-gather size),
- unpacked fallback at large B (formulation switch by batch).

All fwd + grad-wrt-coords (the production backward: the warped operand is
the constant context frame, so its scatter is DCE'd).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_coords(rng, B, H, W, kind):
    if kind == "ego":
        xs = np.tile(np.arange(W, dtype=np.float32), (B, H, 1))
        ys = np.tile(np.arange(H, dtype=np.float32)[:, None], (B, 1, W))
        disp = 12.0 * rng.rand(B, H, W).astype(np.float32)
        x = xs - disp + rng.randn(B, H, W).astype(np.float32)
        y = ys + 0.5 * rng.randn(B, H, W).astype(np.float32)
    else:
        x = (rng.rand(B, H, W) * W).astype(np.float32)
        y = (rng.rand(B, H, W) * H).astype(np.float32)
    return x.astype(np.float32), y.astype(np.float32)


def run():
    import jax
    import jax.numpy as jnp

    from simpledepthestimation_tpu.engine.defaults import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp
    from simpledepthestimation_tpu.ops.resample import (
        _resample_bilinear_packed,
        _resample_bilinear_4gather,
    )

    def packed_chunked(img, x, y, max_idx=2_500_000):
        """Split the batch into chunks small enough that the packed gather
        stays in its linear regime, run them sequentially, concat."""
        B, H, W, C = img.shape
        per = max(1, max_idx // (H * W))
        if per >= B:
            return _resample_bilinear_packed(img, x, y)
        outs = [
            _resample_bilinear_packed(img[i:i + per], x[i:i + per], y[i:i + per])
            for i in range(0, B, per)
        ]
        return jnp.concatenate(outs, axis=0)

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

    results = {}
    for B in (16, 24, 32, 48):
        img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
        for kind in ("ego", "rand"):
            x, y = make_coords(np.random.RandomState(1), B, H, W, kind)
            xy = jnp.stack([jnp.asarray(x), jnp.asarray(y)])
            for fname, f in (
                ("4gather", _resample_bilinear_4gather),
                ("packed", _resample_bilinear_packed),
                ("packed_chunked", packed_chunked),
            ):
                g = jax.jit(jax.grad(lambda c, f=f: jnp.sum(f(img, c[0], c[1]) ** 2)))
                results[(B, kind, fname)] = timeit(f"B={B} {kind} {fname}", g, xy)

    print()
    for k, v in sorted(results.items()):
        print(f"  B={k[0]:2d} {k[1]:4s} {k[2]:8s} {v:8.2f} ms")


if __name__ == "__main__":
    run()
