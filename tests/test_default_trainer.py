"""DefaultTrainer (hook-driven path) smoke test on the synthetic dataset."""

import glob
import json
import os

import numpy as np
import pytest

from simpledepthestimation_tpu.config import CfgNode, get_cfg
from simpledepthestimation_tpu.engine.trainer import DefaultTrainer


def test_default_trainer_end_to_end(tmp_path):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "SupDepthModel"
    cfg.MODEL.DEPTH_NET.NAME = "DepthResNet"
    cfg.MODEL.DEPTH_NET.ENCODER_NAME = "18"
    cfg.MODEL.DEPTH_NET.UPSAMPLE_DEPTH = False
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.LOSS.VARIANCE_FOCUS = 0.85
    for split, length in (("TRAIN", 8), ("TEST", 2)):
        ds = cfg.DATASETS[split]
        ds.NAME = "SyntheticDepth"
        ds.LENGTH = length
        ds.IMG_HEIGHT = 64
        ds.IMG_WIDTH = 96
    cfg.DATASETS.TRAIN.PREPROCESS = [CfgNode({"NAME": "ToTensor"})]
    cfg.DATASETS.TEST.PREPROCESS = [CfgNode({"NAME": "ToTensor"})]
    cfg.SOLVER.OPT = "adamw_poly"
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.SOLVER.DEPTH_LR = 1e-4
    cfg.SOLVER.MAX_EPOCHS = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 1
    cfg.DATALOADER.NUM_WORKERS = 1
    cfg.TEST.EVAL_PERIOD = 2
    cfg.TEST.GT_SCALE = False
    cfg.EVALUATORS = ("kitti_evaluator",)
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 0
    cfg.LOG_PERIOD = 1
    cfg.freeze()

    trainer = DefaultTrainer(cfg)
    trainer.train()

    assert trainer.iter == 2  # 8/8 per epoch × 2 epochs
    # periodic checkpointer hook wrote epochs
    assert trainer.checkpointer.has_checkpoint()
    # writers produced metrics.json with loss entries
    rows = [
        json.loads(l) for l in open(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))
    ]
    assert any("silog_loss" in r for r in rows)
    # eval hook ran at final epoch and logged metrics into storage
    assert any("kitti evaluator/abs_rel" in r for r in rows) or any(
        "abs_rel" in k for r in rows for k in r
    )


def test_default_trainer_precise_bn(tmp_path):
    """PreciseBN hook fires before eval and swaps recomputed BN statistics
    into the trainer state (reference hooks.py:381-450 path)."""
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "SupDepthModel"
    cfg.MODEL.DEPTH_NET.NAME = "DepthResNet"
    cfg.MODEL.DEPTH_NET.ENCODER_NAME = "18"
    cfg.MODEL.DEPTH_NET.UPSAMPLE_DEPTH = False
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.LOSS.VARIANCE_FOCUS = 0.85
    for split, length in (("TRAIN", 8), ("TEST", 2)):
        ds = cfg.DATASETS[split]
        ds.NAME = "SyntheticDepth"
        ds.LENGTH = length
        ds.IMG_HEIGHT = 64
        ds.IMG_WIDTH = 96
    cfg.DATASETS.TRAIN.PREPROCESS = [CfgNode({"NAME": "ToTensor"})]
    cfg.DATASETS.TEST.PREPROCESS = [CfgNode({"NAME": "ToTensor"})]
    cfg.SOLVER.OPT = "adamw_poly"
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.SOLVER.DEPTH_LR = 1e-4
    cfg.SOLVER.MAX_EPOCHS = 1
    cfg.SOLVER.CHECKPOINT_PERIOD = 1
    cfg.DATALOADER.NUM_WORKERS = 1
    cfg.TEST.EVAL_PERIOD = 1
    cfg.TEST.PRECISE_BN.ENABLED = True
    cfg.TEST.PRECISE_BN.NUM_ITER = 2
    cfg.TEST.GT_SCALE = False
    cfg.EVALUATORS = ("kitti_evaluator",)
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 0
    cfg.LOG_PERIOD = 1
    cfg.freeze()

    trainer = DefaultTrainer(cfg)
    from simpledepthestimation_tpu.engine import hooks as hooks_lib

    assert any(isinstance(h, hooks_lib.PreciseBN) for h in trainer._hooks)
    before = np.asarray(
        trainer.state.batch_stats["depth_net"]["encoder"]["bn1"]["mean"]
    ).copy()
    trainer.train()
    after = np.asarray(
        trainer.state.batch_stats["depth_net"]["encoder"]["bn1"]["mean"]
    )
    # the recomputed true-average stats differ from the (mostly-initial) EMAs
    assert not np.allclose(before, after)
