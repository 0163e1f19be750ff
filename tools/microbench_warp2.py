#!/usr/bin/env python
"""Pin down the expensive path: view_synthesis fwd+bwd w.r.t. DEPTH (the
coordinate-gradient path), per scale; and the per-scale loss cost."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from simpledepthestimation_tpu.engine.defaults import enable_compilation_cache

    enable_compilation_cache()
    from simpledepthestimation_tpu.geometry.camera import view_synthesis
    from simpledepthestimation_tpu.models import losses as L

    B = 16
    rng = np.random.RandomState(0)

    def timed(fn, *args, steps=30):
        g = jax.jit(fn)
        out = g(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = g(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / steps * 1000

    for scale in range(4):
        H, W = 192 // 2**scale, 640 // 2**scale
        img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
        depth = jnp.asarray(rng.uniform(1, 80, (B, H, W, 1)).astype(np.float32))
        K = jnp.asarray(
            np.tile(np.array([[[0.58 * W, 0, W / 2], [0, 0.58 * W, H / 2], [0, 0, 1]]], np.float32), (B, 1, 1))
        )
        R = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)))
        t = jnp.asarray(np.full((B, 3, 1), 0.05, np.float32))

        def warp_loss(d):
            sampled, _, _, _ = view_synthesis(img, d, K, R, t)
            return jnp.sum(sampled)

        t_warp = timed(jax.grad(warp_loss), depth)

        def photo_loss(d):
            sampled, _, _, _ = view_synthesis(img, d, K, R, t)
            l1 = jnp.mean(jnp.abs(sampled - img), -1, keepdims=True)
            s = jnp.mean(L.ssim(sampled, img), -1, keepdims=True)
            return jnp.mean(0.85 * s + 0.15 * l1)

        t_photo = timed(jax.grad(photo_loss), depth)
        print(f"scale {scale} ({H}x{W}): warp-bwd-depth {t_warp:7.2f} ms   +photo {t_photo:7.2f} ms")


if __name__ == "__main__":
    main()
