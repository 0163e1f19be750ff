#!/usr/bin/env python
"""Sweep the tile-granular warp kernel's V2_TILE_H (8 vs 16) on real TPU.

Times one full warp plane [96, 192, 640, 3] (the flagship's scale-0 pair of
context warps batched) fwd + grad-wrt-coords, under BOTH coordinate regimes
the production step sees:

- init:    random-init-like depth (~0.2-2 m) -> displacements up to ~170 px
           with border clipping, the high-flag-rate regime;
- trained: steady-state depth (5-60 m) -> small coherent displacements,
           the ~0-flag regime.

Also prints the per-tile flag fraction (_tile_violations_v2) for each
regime/tile height, since 16-row tiles have ~8 rows less y-spread budget.

Usage: python tools/microbench_warp_tiled.py [--tile-h 8 16] [--b 96]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_coords(rng, B, H, W, regime):
    """Ego-motion-like coords from the actual projection chain."""
    import jax.numpy as jnp

    from simpledepthestimation_tpu.geometry import camera as C

    if regime == "init":
        depth = (0.2 + 1.8 * rng.rand(B, H, W, 1)).astype(np.float32)
    else:
        depth = (5.0 + 55.0 * rng.rand(B, H, W, 1)).astype(np.float32)
    K = np.tile(
        np.array([[[371.0, 0, W / 2], [0, 368.0, H / 2], [0, 0, 1]]], np.float32),
        (B, 1, 1),
    )
    from simpledepthestimation_tpu.geometry.camera import inv_intrinsics

    Kinv = np.asarray(inv_intrinsics(jnp.asarray(K)))
    R = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    t = np.tile(np.array([0.05, 0.005, 0.8], np.float32).reshape(1, 3, 1), (B, 1, 1))
    # the exact in-step coordinate chain: backproject with K^-1, project K·R
    pts = C.img_to_points(jnp.asarray(depth), jnp.asarray(Kinv), jnp.zeros((B, 3, 1)))
    KR = jnp.asarray(K) @ jnp.asarray(R)
    Kt = jnp.asarray(K) @ jnp.asarray(t)
    coords, _, _ = C.points_to_img(pts, KR, Kt, H, W)
    x = np.asarray(coords[..., 0], np.float32)
    y = np.asarray(coords[..., 1], np.float32)
    return x, y


def run():
    p = argparse.ArgumentParser()
    p.add_argument("--tile-h", type=int, nargs="+", default=[8, 16])
    p.add_argument("--b", type=int, default=96)
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from simpledepthestimation_tpu.engine.defaults import enable_compilation_cache

    enable_compilation_cache()
    import simpledepthestimation_tpu.ops.pallas_warp as pw

    B, H, W = args.b, 192, 640
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32), jnp.bfloat16)

    for regime in ("trained", "init"):
        x_np, y_np = make_coords(rng, B, H, W, regime)
        x, y = jnp.asarray(x_np), jnp.asarray(y_np)
        ct = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
        for th in args.tile_h:
            flags = np.asarray(
                jax.jit(
                    lambda xx, yy, th=th: pw._tile_violations_v2(
                        xx, yy, H, W, max(pw._pad_geometry(H), 48), 96, 512,
                        tile_h=th,
                    )
                )(x, y)
            )

            def loss(xx, yy, th=th):
                out = pw.warp_banded(img, xx, yy, dot_dtype=jnp.bfloat16,
                                     xwin=512, ywin=96, tile_h=th)
                return jnp.vdot(ct, out.astype(jnp.float32))

            g = jax.jit(jax.grad(loss, (0, 1)))
            f = jax.jit(lambda xx, yy, th=th: pw.warp_banded(
                img, xx, yy, dot_dtype=jnp.bfloat16, xwin=512, ywin=96,
                tile_h=th))
            jax.block_until_ready(f(x, y))
            jax.block_until_ready(g(x, y))
            t0 = time.perf_counter()
            for _ in range(args.steps):
                jax.block_until_ready(f(x, y))
            t_f = (time.perf_counter() - t0) / args.steps * 1000
            t0 = time.perf_counter()
            for _ in range(args.steps):
                jax.block_until_ready(g(x, y))
            t_g = (time.perf_counter() - t0) / args.steps * 1000
            print(
                f"{regime:8s} tile_h={th:2d}: fwd {t_f:7.2f} ms  "
                f"fwd+bwd {t_g:7.2f} ms  flag={100 * flags.mean():.2f}%",
                flush=True,
            )


if __name__ == "__main__":
    run()
