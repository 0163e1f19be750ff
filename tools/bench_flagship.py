#!/usr/bin/env python
"""Parameterized flagship bench (MonoDepth2-R18 192x640): sweep batch size,
warp impl, and banded window to tune the production defaults.

Same measurement protocol as bench.py (on-device batch, per-chunk sync).

  python tools/bench_flagship.py --batch 24 --window 96
  python tools/bench_flagship.py --batch 16,24,32 --window 64,96,128
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_one(B, window, impl, steps=30, remat=False):
    import jax

    from __graft_entry__ import _tiny_cfg, _train_batch
    from simpledepthestimation_tpu.models import build_model
    from simpledepthestimation_tpu.parallel import (
        build_mesh, create_train_state, make_train_step, data_sharding,
    )
    from simpledepthestimation_tpu.solver import build_optimizer

    cfg = _tiny_cfg("bfloat16" if jax.default_backend() == "tpu" else "float32")
    cfg.TPU.WARP_IMPL = impl
    cfg.TPU.WARP_WINDOW = window
    H, W = (192, 640) if jax.default_backend() == "tpu" else (64, 96)
    batch = _train_batch(B, H, W)

    mesh = build_mesh(("data",), (len(jax.devices()),))
    model = build_model(cfg)
    opt, _ = build_optimizer(cfg, steps_per_epoch=100)
    state = create_train_state(model, opt, batch, jax.random.PRNGKey(0))
    step = make_train_step(model, opt, mesh, donate=True, remat=remat)
    dsh = data_sharding(mesh)
    dev = {k: jax.device_put(v, dsh) for k, v in batch.items()
           if hasattr(v, "shape")}
    key = jax.random.PRNGKey(7)

    n = 0
    for i in range(5):
        state, m = step(state, dev, jax.random.fold_in(key, n)); n += 1
    # device_get, not block_until_ready: the tunneled axon backend can return
    # from block_until_ready before the step stream drains (same protocol as
    # bench.py / bench_models.py)
    float(jax.device_get(m["total_loss"]))
    t0 = time.perf_counter()
    for c in range(steps // 5):
        for i in range(5):
            state, m = step(state, dev, jax.random.fold_in(key, n)); n += 1
        float(jax.device_get(m["total_loss"]))
    dt = time.perf_counter() - t0
    ips = B * (steps // 5) * 5 / dt
    print(f"B={B:<3} impl={impl:<10} window={window:<4} remat={int(remat)} "
          f"{ips:7.1f} img/s/chip", flush=True)
    return ips


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", default="24")
    p.add_argument("--window", default="128")
    p.add_argument("--impl", default="auto")
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the forward during backprop "
                   "(TPU.REMAT) — trades FLOPs for HBM to fit larger B")
    args = p.parse_args()

    from simpledepthestimation_tpu.engine.defaults import enable_compilation_cache
    enable_compilation_cache()

    for B in [int(x) for x in args.batch.split(",")]:
        for w in [int(x) for x in args.window.split(",")]:
            for impl in args.impl.split(","):
                run_one(B, w, impl, args.steps, args.remat)


if __name__ == "__main__":
    main()
