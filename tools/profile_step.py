#!/usr/bin/env python
"""Decompose train-step time on the real chip: which parts cost what.

Times the full MonoDepth2 step and ablations (no SSIM, no automask, mean
reduce, supervised-only) at the benchmark shape. Guides kernel work — run
after any compute-path change.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def time_step(cfg, batch, steps=10):
    import jax
    from simpledepthestimation_tpu.models import build_model
    from simpledepthestimation_tpu.parallel import (
        build_mesh, create_train_state, make_train_step, data_sharding,
    )
    from simpledepthestimation_tpu.solver import build_optimizer

    mesh = build_mesh(("data",), (0,))
    model = build_model(cfg)
    optimizer, _ = build_optimizer(cfg, steps_per_epoch=100)
    state = create_train_state(model, optimizer, batch, jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer, mesh, donate=True)
    dsh = data_sharding(mesh)
    dev_batch = {k: jax.device_put(v, dsh) for k, v in batch.items()}
    key = jax.random.PRNGKey(1)

    for i in range(3):
        state, m = step(state, dev_batch, jax.random.fold_in(key, i))
    jax.block_until_ready(m["total_loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = step(state, dev_batch, jax.random.fold_in(key, 100 + i))
    jax.block_until_ready(m["total_loss"])
    return (time.perf_counter() - t0) / steps


def main():
    from simpledepthestimation_tpu.engine.defaults import enable_compilation_cache

    enable_compilation_cache()
    from __graft_entry__ import _tiny_cfg, _train_batch

    B, H, W = 16, 192, 640
    batch = _train_batch(B, H, W)

    variants = {}

    cfg = _tiny_cfg("bfloat16")
    variants["full (ssim+automask+min)"] = cfg

    cfg = _tiny_cfg("bfloat16"); cfg.LOSS.SSIM_WEIGHT = 0.0
    variants["no-ssim"] = cfg

    cfg = _tiny_cfg("bfloat16"); cfg.LOSS.AUTOMASK = False
    variants["no-automask"] = cfg

    cfg = _tiny_cfg("bfloat16"); cfg.LOSS.SMOOTHNESS_WEIGHT = 0.0
    variants["no-smooth"] = cfg

    sup = _tiny_cfg("bfloat16")
    sup.MODEL.META_ARCHITECTURE = "SupDepthModel"
    variants["supervised-only (nets minus pose/warp)"] = sup

    sup_batch = {"img": batch["img"], "flip": batch["flip"],
                 "depth": np.random.RandomState(0).uniform(1, 60, (B, H, W, 1)).astype(np.float32)}

    for name, cfg in variants.items():
        b = sup_batch if name.startswith("supervised") else batch
        dt = time_step(cfg, b)
        print(f"{name:42s} {dt * 1000:8.1f} ms/step   {B / dt:7.1f} img/s")


if __name__ == "__main__":
    main()
