#!/usr/bin/env python
"""MotionLearning (unsupervised depth + motion) entry point.

Counterpart of reference projects/MotionLearning/train.py:53-174: Adam
(depth/pose groups, eps=1e-7) + MultiStepLR, RandLayerNorm noise-stddev
ramp ``NOISE_STDDEV·min(step/RAMPUP,1)²`` and motion burn-in weight
``clip(2·step/BURN_IN−1, 0, 1)`` — injected as traced batch scalars instead
of module mutation — plus gradient-norm clipping via SOLVER.GRAD_CLIP.
"""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from simpledepthestimation_tpu.engine import default_argument_parser, simple_main
from simpledepthestimation_tpu.engine.runtime import do_train, do_test


def make_schedule_fn(cfg):
    noise_stddev = float(cfg.MODEL.DEPTH_NET.get("NOISE_STDDEV", 0.0))
    rampup = int(cfg.MODEL.DEPTH_NET.get("RAMPUP_ITERS", 0))
    burn_in = int(cfg.MODEL.POSE_NET.get("BURN_IN_ITERS", 0))

    def extra(step: int):
        # the reference increments global_step BEFORE computing the step's
        # schedules (projects/MotionLearning/train.py:97-114), so optimizer
        # step i (0-based completed steps) trains under global_step = i+1
        global_step = step + 1
        out = {}
        stddev = 0.0
        if rampup > 0:
            stddev = noise_stddev * min(global_step / float(rampup), 1.0) ** 2
        out["noise_stddev"] = np.float32(stddev)
        weight = 1.0
        if burn_in > 0:
            weight = float(np.clip(2.0 * global_step / burn_in - 1.0, 0.0, 1.0))
        out["motion_weight"] = np.float32(weight)
        return out

    return extra


def train(cfg, resume=False):
    return do_train(cfg, resume=resume, extra_batch_fn=make_schedule_fn(cfg))


def test(cfg, resume=False):
    return do_test(cfg)


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    simple_main(args, train, test)
