#!/usr/bin/env python
"""Decompose view_synthesis cost on the chip (round 2).

The banded warp kernel cut the isolated resample 3-5x, but the full step
barely moved — so the rest of the view-synthesis chain (backproject /
project / masks / normalize, and their backwards) must now dominate.
Times, at the flagship per-scale shape [N*B=32, 192, 640]:

  a) full view_synthesis fwd + grad wrt depth & pose
  b) projection only (resample replaced by coords.sum) fwd + grad
  c) resample only (precomputed coords) fwd + grad
  d) resize_img of the context stack (the per-scale resize)

a - b - c = overhead XLA fails to fuse between projection and resample.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run():
    import jax
    import jax.numpy as jnp

    from simpledepthestimation_tpu.engine.defaults import enable_compilation_cache
    enable_compilation_cache()
    from simpledepthestimation_tpu import geometry as G
    from simpledepthestimation_tpu.geometry import camera as C
    from simpledepthestimation_tpu.ops.resample import resample_bilinear

    B, H, W = 32, 192, 640
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    depth = jnp.asarray((rng.rand(B, H, W, 1) * 40 + 1).astype(np.float32))
    K = jnp.asarray(
        np.tile(np.array([[[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]]],
                         np.float32), (B, 1, 1)))
    R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)))
    t = jnp.asarray(np.tile(np.array([0.05, 0.002, 0.01], np.float32
                                     ).reshape(1, 3, 1), (B, 1, 1)))

    t00 = time.time()

    def timeit(name, g, args, n=20):
        r = g(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = g(*args)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"[{time.time()-t00:7.1f}s] {name:46s} {dt:8.2f} ms", flush=True)
        return dt

    def full(d, tt):
        s, dB, coords, valid = C.view_synthesis(img, d, K, R, tt)
        return jnp.sum(s ** 2) + jnp.sum(dB) + jnp.sum(valid)

    timeit("view_synthesis full fwd+d(depth,t)",
           jax.jit(jax.grad(full, argnums=(0, 1))), (depth, t))

    def proj_only(d, tt):
        pts = C.img_to_points(d, R=C.inv_intrinsics(K),
                              t=jnp.zeros((B, 3, 1), jnp.float32))
        Rp = jnp.einsum("bij,bjk->bik", K, R)
        tp = jnp.einsum("bij,bjn->bin", K, tt)
        coords, dB, valid = C.points_to_img(pts, Rp, tp, H, W)
        return jnp.sum(coords ** 2) + jnp.sum(dB) + jnp.sum(valid)

    timeit("projection only fwd+d(depth,t)",
           jax.jit(jax.grad(proj_only, argnums=(0, 1))), (depth, t))

    xs = np.tile(np.arange(W, dtype=np.float32), (B, H, 1))
    ys = np.tile(np.arange(H, dtype=np.float32)[:, None], (B, 1, W))
    x = jnp.asarray(np.clip(xs - 12 * rng.rand(B, H, W), 0, W - 1).astype(np.float32))
    y = jnp.asarray(np.clip(ys + 0.5 * rng.randn(B, H, W), 0, H - 1).astype(np.float32))

    def res_only(xx, yy):
        return jnp.sum(resample_bilinear(img, xx, yy) ** 2)

    timeit("resample only fwd+dcoords",
           jax.jit(jax.grad(res_only, argnums=(0, 1))), (x, y))

    big = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    timeit("resize_img to half-res fwd",
           jax.jit(lambda im: C.resize_img(im, (H // 2, W // 2))), (big,))


if __name__ == "__main__":
    run()
