#!/usr/bin/env python
"""Raw scatter-add cost per formulation of the warp's image cotangent.

The MotionLearning cycle loss differentiates a bilinear warp w.r.t. its
IMAGE operand (the sampled translation field, reference motion_loss.py:11)
— the backward is scatter-adds of corner contributions, measured at
2 x 70 ms of a 255 ms step (docs/PERF.md round-5 ML decomposition).  Like
the gather study (docs/PERF.md item 2), the FORMULATION sets the cost:

  4gather VJP     -> 4 scatters of C-wide slices at B*H*W indices
  row-pair packed -> 2 scatters of 2C-wide slices (y-corners share a slot)
  2x2 patch packed-> 1 scatter of 4C-wide slices (all four corners)

This tool measures the raw ``zeros.at[idx].add(updates)`` cost of each
shape on the chip (index distribution matched to a coherent warp: near-
identity displacements, so neighboring samples collide in the scatter the
way production coords do).  The fold-back of a packed scatter result is a
cheap fused slice-add and is included where it applies.
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

    # device_get a scalar, not block_until_ready: on the tunneled axon
    # backend block_until_ready can return before the stream drains
    # (bench.py docstring)
    g = jax.jit(lambda *a: jnp.sum(f(*a)))
    float(jax.device_get(g(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    float(jax.device_get(out))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--width", type=int, default=416)
    p.add_argument("--channels", type=int, default=3)
    args = p.parse_args()

    B, H, W, C = args.batch, args.height, args.width, args.channels
    N = B * H * W
    rng = np.random.RandomState(0)

    # coherent displacement coords -> int corner indices with production-like
    # collision structure
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    disp = 5.0 * rng.rand(B, H, W) - 2.5
    yy = np.clip(ys[None] + disp, 0, H - 1).astype(np.float32)
    xx = np.clip(xs[None] + 3.0 * rng.rand(B, H, W) - 1.5, 0, W - 1).astype(
        np.float32
    )
    base = (np.arange(B, dtype=np.int64) * H * W)[:, None]
    flat = (
        base + np.floor(yy).astype(np.int64).reshape(B, -1) * W
        + np.floor(xx).astype(np.int64).reshape(B, -1)
    ).reshape(-1)
    idx = jnp.asarray(flat.astype(np.int32))
    ct = jnp.asarray(rng.rand(N, C).astype(np.float32))

    def scatter(width, n_scatters, idx, ct):
        upd = jnp.tile(ct, (1, width // C))

        def f(idx, upd):
            out = jnp.zeros((N + W + 1, width), jnp.float32)
            for _ in range(n_scatters):
                out = out.at[idx].add(upd)
            return out

        return bench(f, idx, upd)

    print(f"image-cotangent scatter formulations  B={B} {H}x{W} C={C} "
          f"({N/1e6:.1f}M samples)")
    for name, width, n in (
        ("4gather   (4 x C-wide)", C, 4),
        ("row-pair  (2 x 2C-wide)", 2 * C, 2),
        ("2x2 patch (1 x 4C-wide)", 4 * C, 1),
    ):
        ms = scatter(width, n, idx, ct)
        print(f"  {name}: {ms:7.2f} ms")

    # padded-plane variant of the 4gather (what the banded-kernel bwd pays:
    # indices into the 128-padded plane)
    Wp = -(-W // 128) * 128
    flat_p = (
        (np.arange(B, dtype=np.int64) * H * Wp)[:, None]
        + np.floor(yy).astype(np.int64).reshape(B, -1) * Wp
        + np.floor(xx).astype(np.int64).reshape(B, -1)
    ).reshape(-1)
    idx_p = jnp.asarray(flat_p.astype(np.int32))
    Np = B * H * Wp

    def f_pad(idx, upd):
        out = jnp.zeros((Np + Wp + 1, C), jnp.float32)
        for _ in range(4):
            out = out.at[idx].add(upd)
        return out

    print(f"  4gather on {Wp}-padded plane: {bench(f_pad, idx_p, ct):7.2f} ms")


if __name__ == "__main__":
    main()
