#!/usr/bin/env python
"""Per-model-family train-step throughput on the chip (full fwd+bwd+Adam,
chunk-synced like bench.py). Shapes match the hardware-verified CLI drives,
so warm compile-cache runs are fast.

Prints one line per family: images/sec/chip at the stated shape.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


CASES = [
    # (name, meta_arch, depth_net kwargs, pose?, B, H, W, case_opts)
    # reference shapes: Supervised Base.yaml KBCrops then RandomCrops to
    # 704x352 and trains IMS_PER_BATCH 16 (resnet18.yaml keeps 16);
    # bts_r50.yaml overrides IMS_PER_BATCH to 8 at the same crop.
    # BTS-R50 at 352x704 B=8 exceeds single-chip HBM without remat (the
    # v5e worker OOM-crashes); TPU.REMAT fits it AND beats the largest
    # non-remat batch per image (47.7 img/s vs B=2's 30.5, round 5)
    ("Supervised-R18", "SupDepthModel", {"NAME": "DepthResNet", "ENCODER_NAME": "18"}, False, 16, 352, 704, ()),
    ("BTS-R50", "SupDepthModel", {"NAME": "BtsModel", "ENCODER_NAME": "resnet50_bts"}, False, 8, 352, 704,
     ("TPU.REMAT", "True")),
    ("MonoDepth2-R18", "MonoDepth2Model", {"NAME": "DepthResNet", "ENCODER_NAME": "18"}, True, 48, 192, 640, ()),
    # reference shapes: packnet_1a.yaml trains 192x640 B=8; MotionLearning
    # Base.yaml trains 128x416 B=16
    ("PackNet-1A", "MonoDepth2Model", {"NAME": "PackNet01", "VERSION": "1A"}, True, 8, 192, 640, ()),
    ("MotionLearning-R18", "MotionLearningModel",
     {"NAME": "GoogleResNet", "ENCODER_NAME": "18", "NORM": "randLN", "NOISE_STDDEV": 0.5,
      "RAMPUP_ITERS": 100, "UPSAMPLE_DEPTH": False, "LEARN_SCALE": False},
     "motion", 16, 128, 416, ()),
]


def make_case(meta, dn, pose, B, H, W, opts=()):
    """(cfg, host batch) for a family at a given shape — shared with
    tools/trace_step.py so profiles hit the exact benched configuration.

    ``opts`` is a flat KEY VALUE list merged last (same syntax as the train
    CLIs), e.g. ``TPU.CONV3D_IMPL blocked`` to sweep kernel backends.
    """
    import jax

    from simpledepthestimation_tpu.config import get_cfg

    cfg = get_cfg()
    if opts:
        cfg.merge_from_list(list(opts))
    cfg.MODEL.META_ARCHITECTURE = meta
    for k, v in dn.items():
        cfg.MODEL.DEPTH_NET[k] = v
    cfg.TPU.COMPUTE_DTYPE = "bfloat16" if jax.default_backend() == "tpu" else "float32"
    loss = cfg.LOSS
    loss.VARIANCE_FOCUS = 0.85
    if pose == "motion":
        cfg.MODEL.POSE_NET.NAME = "GoogleMotionNet"
        cfg.MODEL.POSE_NET.USE_DEPTH = True
        cfg.MODEL.POSE_NET.MASK_MOTION = True
        cfg.MODEL.POSE_NET.LEARN_SCALE = True
        cfg.MODEL.POSE_NET.SCALE_CONSTRAIN = "clip_ste"
        cfg.MODEL.POSE_NET.BURN_IN_ITERS = 20
        loss.NUM_SCALES = 1
        loss.SSIM_WEIGHT = 3.0
        loss.C1 = float("inf")
        loss.C2 = 9e-6
        loss.CLIP = 0.0
        loss.MOTION_SMOOTHNESS_WEIGHT = 1.0
        loss.MOTION_SPARSITY_WEIGHT = 0.2
        loss.ROT_CYCLE_WEIGHT = 1e-3
        loss.TRANS_CYCLE_WEIGHT = 5e-2
        loss.SMOOTHNESS_WEIGHT = 0.001
    elif pose:
        cfg.MODEL.POSE_NET.NAME = "PoseNet"
        cfg.MODEL.POSE_NET.NUM_CONTEXTS = 2
        loss.SSIM_WEIGHT = 0.85
        loss.C1, loss.C2, loss.CLIP = 1e-4, 9e-4, 0.0
        loss.AUTOMASK = True
        loss.SMOOTHNESS_WEIGHT = 0.001
        loss.PHOTOMETRIC_REDUCE = "min"

    rng = np.random.RandomState(0)
    K = np.tile(
        np.array([[[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]]], np.float32),
        (B, 1, 1),
    )
    batch = {
        "img": rng.rand(B, H, W, 3).astype(np.float32),
        "intrinsics": K,
    }
    if meta == "SupDepthModel":
        batch["depth"] = (rng.rand(B, H, W, 1) * 60).astype(np.float32)
    else:
        n_ctx = 2 if pose is True else 1
        batch["img_orig"] = batch["img"].copy()
        batch["ctx_img"] = rng.rand(B, n_ctx, H, W, 3).astype(np.float32)
        batch["ctx_img_orig"] = batch["ctx_img"].copy()
        batch["flip"] = np.zeros((B,), bool)
    if pose == "motion":
        batch["noise_stddev"] = np.float32(0.1)
        batch["motion_weight"] = np.float32(1.0)
    return cfg, batch


def bench_case(name, meta, dn, pose, B, H, W, opts=()):
    import jax

    from simpledepthestimation_tpu.models import build_model
    from simpledepthestimation_tpu.parallel import (
        build_mesh, create_train_state, make_train_step, data_sharding,
    )
    from simpledepthestimation_tpu.solver import build_optimizer

    cfg, batch = make_case(meta, dn, pose, B, H, W, opts)
    model = build_model(cfg)
    optimizer, _ = build_optimizer(cfg, steps_per_epoch=100)
    mesh = build_mesh(("data",), (len(jax.devices()),))
    state = create_train_state(model, optimizer, batch, jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer, mesh, donate=True,
                           remat=bool(cfg.TPU.get("REMAT", False)))
    from simpledepthestimation_tpu.parallel.mesh import replicated

    dsh = data_sharding(mesh)
    rep = replicated(mesh)
    dev = {
        k: jax.device_put(v, dsh if np.ndim(v) >= 1 else rep)
        for k, v in batch.items()
    }
    key = jax.random.PRNGKey(7)

    for i in range(5):
        state, m = step(state, dev, jax.random.fold_in(key, i))
    float(jax.device_get(m["total_loss"]))
    n = 0
    t0 = time.perf_counter()
    for c in range(6):
        for i in range(5):
            state, m = step(state, dev, jax.random.fold_in(key, 100 + n))
            n += 1
        # device_get, not block_until_ready: on the tunneled axon backend
        # block_until_ready can return before the step stream drains
        # (under-reports elapsed time); fetching the scalar is the honest sync
        # (same protocol as bench.py).
        float(jax.device_get(m["total_loss"]))
    dt = time.perf_counter() - t0
    print(f"{name:<20} B={B:<3} {H}x{W}:  {B * n / dt:7.1f} img/s/chip")


def main():
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", default="", help="run only this family (prefix match)")
    p.add_argument(
        "--sweep", default="", help="comma-separated batch sizes to sweep (per family)"
    )
    p.add_argument(
        "opts",
        nargs="*",
        default=[],
        help="trailing KEY VALUE cfg overrides (e.g. TPU.CONV3D_IMPL blocked)",
    )
    args = p.parse_args()

    from simpledepthestimation_tpu.engine.defaults import enable_compilation_cache

    enable_compilation_cache()
    for case in CASES:
        name, meta, dn, pose, B, H, W, case_opts = case
        if args.family and not name.lower().startswith(args.family.lower()):
            continue
        for b in ([int(x) for x in args.sweep.split(",")] if args.sweep else [B]):
            bench_case(name, meta, dn, pose, b, H, W,
                       tuple(case_opts) + tuple(args.opts))


if __name__ == "__main__":
    main()
