#!/usr/bin/env python
"""Bisect the MonoDepth2 step's unaccounted time (round 2).

profile_step says: full 222ms, nets-only 60ms, ssim ~7ms, automask ~5ms;
isolated warps ~45ms — leaving ~85ms unattributed. Variants here isolate
the remaining structure:

  - full               (baseline)
  - scales=1           (only the full-res scale)
  - scales=2
  - no-warp            (view_synthesis monkeypatched to identity-return)
  - no-pose            (PoseNet replaced by constant poses)
"""

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
    from __graft_entry__ import _tiny_cfg, _train_batch
    from tools.profile_step import time_step
    from simpledepthestimation_tpu.models import meta_arch as MA
    from simpledepthestimation_tpu.geometry import camera as C

    B, H, W = 16, 192, 640
    batch = _train_batch(B, H, W)

    def bench(name, cfg):
        dt = time_step(cfg, batch)
        print(f"{name:34s} {dt * 1000:8.1f} ms/step   {B / dt:7.1f} img/s",
              flush=True)

    bench("full", _tiny_cfg("bfloat16"))

    for s in (1, 2):
        cfg = _tiny_cfg("bfloat16")
        cfg.LOSS.NUM_SCALES = s
        bench(f"scales={s}", cfg)

    real_vs = C.view_synthesis

    def fake_vs(image_B, depth_A, K, R, t):
        ones = jnp.ones(depth_A.shape, image_B.dtype)
        coords = jnp.zeros(depth_A.shape[:3] + (2,), image_B.dtype)
        return image_B, ones, coords, ones

    MA.view_synthesis = fake_vs
    try:
        bench("no-warp (identity view_synthesis)", _tiny_cfg("bfloat16"))
    finally:
        MA.view_synthesis = real_vs


if __name__ == "__main__":
    main()
