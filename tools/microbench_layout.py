#!/usr/bin/env python
"""Test the lane-padding hypothesis: SSIM/photometric on NHWC (C=3 minor —
lanes padded 3/128) vs channel-first NCHW (W=640 minor — full lanes)."""

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

    B, H, W = 16, 192, 640
    rng = np.random.RandomState(0)
    a_hwc = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    b_hwc = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    a_chw = jnp.asarray(np.moveaxis(np.asarray(a_hwc), -1, 1).copy())
    b_chw = jnp.asarray(np.moveaxis(np.asarray(b_hwc), -1, 1).copy())

    def timed(fn, *args, steps=30):
        g = jax.jit(jax.grad(lambda *xs: jnp.sum(fn(*xs))))
        out = g(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = g(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / steps * 1000

    def window9(x, haxis, waxis):
        Hh = x.shape[haxis]
        Ww = x.shape[waxis]
        pad = [(0, 0)] * x.ndim
        pad[haxis] = (1, 1)
        pad[waxis] = (1, 1)
        xp = jnp.pad(x, pad, mode="reflect")
        out = None
        for dy in range(3):
            for dx in range(3):
                idx = [slice(None)] * x.ndim
                idx[haxis] = slice(dy, dy + Hh)
                idx[waxis] = slice(dx, dx + Ww)
                piece = xp[tuple(idx)]
                out = piece if out is None else out + piece
        return out / 9.0

    def ssim_generic(x, y, haxis, waxis, caxis):
        mu_x = window9(x, haxis, waxis)
        mu_y = window9(y, haxis, waxis)
        sx = window9(x * x, haxis, waxis) - mu_x**2
        sy = window9(y * y, haxis, waxis) - mu_y**2
        sxy = window9(x * y, haxis, waxis) - mu_x * mu_y
        n = (2 * mu_x * mu_y + 1e-4) * (2 * sxy + 9e-4)
        d = (mu_x**2 + mu_y**2 + 1e-4) * (sx + sy + 9e-4)
        dist = jnp.clip((1 - n / d) / 2, 0, 1)
        l1 = jnp.abs(x - y)
        blend = 0.85 * dist + 0.15 * l1
        return jnp.mean(blend, axis=caxis)

    t_hwc = timed(lambda x, y: ssim_generic(x, y, 1, 2, 3), a_hwc, b_hwc)
    t_chw = timed(lambda x, y: ssim_generic(x, y, 2, 3, 1), a_chw, b_chw)
    print(f"ssim+l1 fwd+bwd NHWC (C minor): {t_hwc:8.2f} ms")
    print(f"ssim+l1 fwd+bwd NCHW (W minor): {t_chw:8.2f} ms")

    # plain elementwise chain for reference
    def chain(x, y):
        return jnp.abs(x - y) * (x + y) + jnp.exp(-jnp.abs(x))

    print(f"elementwise NHWC: {timed(chain, a_hwc, b_hwc):8.2f} ms")
    print(f"elementwise NCHW: {timed(chain, a_chw, b_chw):8.2f} ms")


if __name__ == "__main__":
    main()
