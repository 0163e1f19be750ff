"""MotionLearning end-to-end training on synthetic data with the real
project entry schedules (noise-stddev ramp + motion burn-in as traced batch
scalars)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from simpledepthestimation_tpu.config import CfgNode, get_cfg
from simpledepthestimation_tpu.engine.runtime import do_train


def test_motionlearning_end_to_end(tmp_path):
    from projects.MotionLearning.train import make_schedule_fn

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "MotionLearningModel"
    dn = cfg.MODEL.DEPTH_NET
    dn.NAME = "GoogleResNet"
    dn.ENCODER_NAME = "18"
    dn.NORM = "randLN"
    dn.LEARN_SCALE = False
    dn.UPSAMPLE_DEPTH = False
    dn.NOISE_STDDEV = 0.5
    dn.RAMPUP_ITERS = 10
    pn = cfg.MODEL.POSE_NET
    pn.NAME = "GoogleMotionNet"
    pn.USE_DEPTH = True
    pn.GROUP_NORM = False
    pn.MASK_MOTION = True
    pn.LEARN_SCALE = True
    pn.SCALE_CONSTRAIN = "clip_ste"
    pn.BURN_IN_ITERS = 4
    cfg.TPU.COMPUTE_DTYPE = "float32"

    loss = cfg.LOSS
    loss.NUM_SCALES = 1
    loss.SSIM_WEIGHT = 3.0
    loss.C1 = "inf"
    loss.C2 = 9e-6
    loss.CLIP = 0.0
    loss.DEPTH_L1_WEIGHT = 0.0
    loss.SMOOTHNESS_WEIGHT = 0.001
    loss.SUPERVISED_WEIGHT = 0.0
    loss.VARIANCE_FOCUS = 0.85
    loss.VAR_LOSS_WEIGHT = 0.0
    loss.MOTION_SMOOTHNESS_WEIGHT = 1.0
    loss.MOTION_SPARSITY_WEIGHT = 0.2
    loss.ROT_CYCLE_WEIGHT = 1e-3
    loss.TRANS_CYCLE_WEIGHT = 5e-2
    loss.SCALE_NORMALIZE = False

    train = cfg.DATASETS.TRAIN
    train.NAME = "SyntheticDepth"
    train.LENGTH = 8
    train.IMG_HEIGHT = 64
    train.IMG_WIDTH = 96
    train.FORWARD_CONTEXT = 1
    train.BACKWARD_CONTEXT = 0
    train.PREPROCESS = [
        CfgNode({"NAME": "RandomImageAug"}),
        CfgNode({"NAME": "ToTensor"}),
    ]
    cfg.DATASETS.TEST.NAME = ""  # skip eval (randLN eval path tested in units)

    cfg.SOLVER.OPT = "adam_multistep"
    cfg.SOLVER.EPS = 1e-7
    cfg.SOLVER.IMS_PER_BATCH = 4
    cfg.SOLVER.DEPTH_LR = 2e-4
    cfg.SOLVER.POSE_LR = 2e-4
    cfg.SOLVER.LR_STEPS = (8,)
    cfg.SOLVER.GAMMA = 0.5
    cfg.SOLVER.MAX_EPOCHS = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 2
    cfg.SOLVER.GRAD_CLIP = 10.0
    cfg.DATALOADER.NUM_WORKERS = 1
    cfg.TEST.EVAL_PERIOD = 0
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 0
    cfg.LOG_PERIOD = 1
    cfg.freeze()

    state = do_train(cfg, resume=False, extra_batch_fn=make_schedule_fn(cfg))
    assert int(state.step) == 4  # 8/4 × 2 epochs

    import json

    rows = [json.loads(l) for l in open(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))]
    keys = set(k for r in rows for k in r)
    assert {"rgb_l1_loss", "ssim_loss", "motion_smooth_loss", "total_loss"} <= keys
    for r in rows:
        if "total_loss" in r:
            assert np.isfinite(r["total_loss"])
