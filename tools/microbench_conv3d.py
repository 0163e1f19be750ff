#!/usr/bin/env python
"""PackNet packed-3D-conv formulation bench (VERDICT item 3: PackNet at the
reference training shape).

The reference's pack/unpack blocks run ``Conv3d(1, 8, 3)`` over the packed
depth axis (layers01.py:252-257): ONE input channel, so the literal NDHWC
lowering contracts 27×1 elements per MXU tile (~1-2% utilization). The
"blocked" formulation (models/packnet.py:_conv3d_over_packed_blocked) folds
channel blocks of G (+1-channel halo) into the batch and embeds the depth
band in a dense [3,3,G+2,G·8] 2D conv: contraction 9·(G+2), at (G+2)/3×
redundant FLOPs. This tool measures both (fwd+bwd, f32 and bf16) at every
(D, H, W) the PackNet-1A encoder/decoder actually produces at 192×640 and
sweeps G.

Usage: python tools/microbench_conv3d.py [--batch 8] [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# (layer, D=packed channels, H, W) at input 192x640, B per plane:
# pack_k takes [B, H/2^k, W/2^k, 4*C_k]; unpack mirrors on the decoder side.
SHAPES = [
    ("pack1", 256, 96, 320),
    ("pack2", 256, 48, 160),
    ("pack3", 512, 24, 80),
    ("pack4", 1024, 12, 40),
    ("pack5", 2048, 6, 20),
    ("unpack5", 256, 6, 20),   # conv 2D first reduces to n5o*r^2/d = 256
    ("unpack4", 128, 12, 40),
    ("unpack3", 64, 24, 80),
    ("unpack2", 32, 48, 160),
    ("unpack1", 32, 96, 320),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--blocks", type=int, nargs="+", default=[6, 14, 30, 62])
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from simpledepthestimation_tpu.engine.defaults import enable_compilation_cache
    enable_compilation_cache()
    from simpledepthestimation_tpu.models.packnet import (
        _conv3d_over_packed,
        _conv3d_over_packed_blocked,
    )

    dt = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)
    B = args.batch

    def timed(fn, *a):
        jfn = jax.jit(fn)
        out = jfn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jfn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    totals = {}
    for name, D, H, W in SHAPES:
        x = jnp.asarray(rng.rand(B, H, W, D).astype(np.float32)).astype(dt)
        k = jnp.asarray(rng.randn(3, 3, 3, 1, 8).astype(np.float32)).astype(dt)
        b = jnp.asarray(rng.randn(8).astype(np.float32)).astype(dt)

        def grad_of(fn):
            def loss(k_):
                return jnp.sum(fn(x, k_, b).astype(jnp.float32) ** 2)
            return jax.grad(loss)

        row = {"ndhwc": timed(_conv3d_over_packed, x, k, b)
               + timed(grad_of(_conv3d_over_packed), k)}
        for G in args.blocks:
            fn = lambda x_, k_, b_, G=G: _conv3d_over_packed_blocked(x_, k_, b_, G)
            row[f"blk{G}"] = timed(fn, x, k, b) + timed(grad_of(fn), k)
        for kk, v in row.items():
            totals[kk] = totals.get(kk, 0.0) + v
        print(f"{name:9s} D={D:5d} {H:3d}x{W:3d}  "
              + "  ".join(f"{kk}={v:7.2f}ms" for kk, v in row.items()))
    print("TOTAL(fwd+bwd, all layers): "
          + "  ".join(f"{kk}={v:7.2f}ms" for kk, v in totals.items()))


if __name__ == "__main__":
    main()
