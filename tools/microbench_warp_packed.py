#!/usr/bin/env python
"""Warp-gather attack round 2 (VERDICT r1 item 2): reduce the INDEX COUNT.

The flat `jnp.take` 4-corner gather is per-index-cost bound (docs/PERF.md
item 2: wider slices amortize the per-index overhead — C=3 beat C=1 and
u32-packing). So: pre-pack the 2×2 pixel neighborhood into channels with
shifted copies (a cheap, fusable bandwidth op), then ONE flat gather of a
contiguous 4C-wide slice fetches all four bilinear corners — 4× fewer
indices through the same fast `take` lowering. A row-pair variant (2
gathers of 2C) sits in between.

Edge semantics stay exact grid_sample 'zeros': right/bottom zero padding
covers the +1 shifts, in-packed `where` selects repair the anchor clip at
the left/top edge, and per-corner OOB masks zero the rest.

Measures fwd + grad-wrt-coords (the production backward: the warped image
is the constant context frame — gradients flow only through the
coordinates) at the MonoDepth2 flagship shape.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run():
    import jax
    import jax.numpy as jnp

    from simpledepthestimation_tpu.ops.resample import resample_bilinear

    B, H, W, C = 16, 192, 640, 3
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    # ego-motion-like coords: near-identity plus smooth disparity + noise
    xs = np.tile(np.arange(W, dtype=np.float32), (B, H, 1))
    ys = np.tile(np.arange(H, dtype=np.float32)[:, None], (B, 1, W))
    disp = 12.0 * rng.rand(B, H, W).astype(np.float32)
    x = jnp.asarray(xs - disp + rng.randn(B, H, W).astype(np.float32))
    y = jnp.asarray(ys + 0.5 * rng.randn(B, H, W).astype(np.float32))

    def pack22(img):
        """[B,H,W,C] → [B,H,W,4C]: (v00|v01|v10|v11) neighborhoods."""
        p = jnp.pad(img, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return jnp.concatenate(
            [p[:, :H, :W], p[:, :H, 1:], p[:, 1:, :W], p[:, 1:, 1:]], axis=-1
        )

    def packy(img):
        """[B,H,W,C] → [B,H,W,2C]: (v0x|v1x) row pairs."""
        p = jnp.pad(img, ((0, 0), (0, 1), (0, 0), (0, 0)))
        return jnp.concatenate([p[:, :H], p[:, 1:]], axis=-1)

    def _flat_take(packed_flat, base, ax, ay, Wd, n_ch):
        idx = base + ay * Wd + ax
        return jnp.take(packed_flat, idx.reshape(-1), axis=0, mode="clip").reshape(
            idx.shape + (n_ch,)
        )

    def resample_packed22(packed_flat, x, y):
        """packed_flat: [Bn*H*W, 4C] from pack22."""
        Bn = x.shape[0]
        xf = x.reshape(Bn, -1)
        yf = y.reshape(Bn, -1)
        x0 = jnp.floor(xf)
        y0 = jnp.floor(yf)
        wx = (xf - x0)[..., None]
        wy = (yf - y0)[..., None]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        ax = jnp.clip(x0i, 0, W - 1)
        ay = jnp.clip(y0i, 0, H - 1)
        base = (jnp.arange(Bn, dtype=jnp.int32) * (H * W))[:, None]
        vals = _flat_take(packed_flat, base, ax, ay, W, 4 * C)  # [B,N,4C]
        g = vals.reshape(vals.shape[:-1] + (2, 2, C))  # [...,(y),(x),C]

        def corner(dx, dy, cx, cy):
            # in-packed offsets repairing the anchor clip at left/top edges
            sx = jnp.clip(cx - ax, 0, 1)[..., None]
            sy = jnp.clip(cy - ay, 0, 1)[..., None]
            row = jnp.where(sy == 0, g[..., 0, :, :].reshape(vals.shape[:-1] + (2 * C,)),
                            g[..., 1, :, :].reshape(vals.shape[:-1] + (2 * C,)))
            row = row.reshape(vals.shape[:-1] + (2, C))
            v = jnp.where(sx == 0, row[..., 0, :], row[..., 1, :])
            inb = (cx >= 0) & (cx <= W - 1) & (cy >= 0) & (cy <= H - 1)
            return v * inb[..., None].astype(v.dtype)

        v00 = corner(0, 0, x0i, y0i)
        v01 = corner(1, 0, x0i + 1, y0i)
        v10 = corner(0, 1, x0i, y0i + 1)
        v11 = corner(1, 1, x0i + 1, y0i + 1)
        top = v00 * (1 - wx) + v01 * wx
        bot = v10 * (1 - wx) + v11 * wx
        return (top * (1 - wy) + bot * wy).reshape((Bn,) + x.shape[1:] + (C,))

    def resample_packy(packed_flat, x, y):
        """packed_flat: [Bn*H*W, 2C] from packy: 2 gathers (per x corner)."""
        Bn = x.shape[0]
        xf = x.reshape(Bn, -1)
        yf = y.reshape(Bn, -1)
        x0 = jnp.floor(xf)
        y0 = jnp.floor(yf)
        wx = (xf - x0)[..., None]
        wy = (yf - y0)[..., None]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        ay = jnp.clip(y0i, 0, H - 1)
        base = (jnp.arange(Bn, dtype=jnp.int32) * (H * W))[:, None]

        def col(cx):
            inb_x = (cx >= 0) & (cx <= W - 1)
            axc = jnp.clip(cx, 0, W - 1)
            vals = _flat_take(packed_flat, base, axc, ay, W, 2 * C)
            g = vals.reshape(vals.shape[:-1] + (2, C))
            sy0 = jnp.clip(y0i - ay, 0, 1)[..., None]
            sy1 = jnp.clip(y0i + 1 - ay, 0, 1)[..., None]
            v0 = jnp.where(sy0 == 0, g[..., 0, :], g[..., 1, :])
            v1 = jnp.where(sy1 == 0, g[..., 0, :], g[..., 1, :])
            m0 = inb_x & (y0i >= 0) & (y0i <= H - 1)
            m1 = inb_x & (y0i + 1 >= 0) & (y0i + 1 <= H - 1)
            return v0 * m0[..., None].astype(v0.dtype), v1 * m1[..., None].astype(v1.dtype)

        v00, v10 = col(x0i)
        v01, v11 = col(x0i + 1)
        top = v00 * (1 - wx) + v01 * wx
        bot = v10 * (1 - wx) + v11 * wx
        return (top * (1 - wy) + bot * wy).reshape((Bn,) + x.shape[1:] + (C,))

    # -- correctness vs the production path ---------------------------------
    ref = resample_bilinear(image, x, y)
    p22_flat = pack22(image).reshape(B * H * W, 4 * C)
    py_flat = packy(image).reshape(B * H * W, 2 * C)
    out22 = resample_packed22(p22_flat, x, y)
    outy = resample_packy(py_flat, x, y)
    err22 = float(jnp.max(jnp.abs(out22 - ref)))
    erry = float(jnp.max(jnp.abs(outy - ref)))
    print(f"max|packed22 - ref| = {err22:.3e}   max|packy - ref| = {erry:.3e}")
    assert err22 < 1e-5 and erry < 1e-5

    # extreme-coordinate edge audit (all OOB regimes)
    xe = jnp.asarray(
        np.array([[-5.0, -1.0, -0.5, 0.0, W - 1.5, W - 1.0, W - 0.5, W + 3.0]], np.float32)
    ).reshape(1, 8, 1)
    ye = jnp.asarray(
        np.array([[-3.0, -0.5, 0.2, H / 2, H - 1.7, H - 1.0, H - 0.3, H + 2.0]], np.float32)
    ).reshape(1, 8, 1)
    xg, yg = jnp.broadcast_to(xe, (1, 8, 8)).transpose(0, 2, 1), jnp.broadcast_to(ye, (1, 8, 8))
    img1 = image[:1]
    r = resample_bilinear(img1, xg, yg)
    a = resample_packed22(pack22(img1).reshape(H * W, 4 * C), xg, yg)
    b = resample_packy(packy(img1).reshape(H * W, 2 * C), xg, yg)
    print(f"edge-audit: packed22 {float(jnp.max(jnp.abs(a - r))):.3e}  "
          f"packy {float(jnp.max(jnp.abs(b - r))):.3e}")
    assert float(jnp.max(jnp.abs(a - r))) < 1e-5
    assert float(jnp.max(jnp.abs(b - r))) < 1e-5

    # -- timing: fwd + grad wrt coords (production backward shape) ----------
    def bench(name, fn, *args):
        def loss(x_, y_):
            return jnp.sum(fn(*args, x_, y_) ** 2)

        g = jax.jit(jax.grad(lambda xy: loss(xy[0], xy[1])))
        xy = jnp.stack([x, y])
        r = g(xy)
        jax.block_until_ready(r)
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            r = g(xy)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{name:>28}: {dt:7.2f} ms/iter (fwd+bwd, B={B} {H}x{W})")
        return dt

    t_ref = bench("flat-4gather (production)", lambda xx, yy: resample_bilinear(image, xx, yy))
    # include the packing in the timed region: in the real loss it is
    # (re)built per scale from the resized context frame
    t_22 = bench(
        "packed-2x2 (1 gather)",
        lambda xx, yy: resample_packed22(pack22(image).reshape(B * H * W, 4 * C), xx, yy),
    )
    t_y = bench(
        "packed-rows (2 gathers)",
        lambda xx, yy: resample_packy(packy(image).reshape(B * H * W, 2 * C), xx, yy),
    )
    print(f"speedups vs production: packed22 {t_ref / t_22:.2f}x, packy {t_ref / t_y:.2f}x")


if __name__ == "__main__":
    run()
