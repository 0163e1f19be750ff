"""End-to-end training tests on the synthetic dataset over the 8-device
virtual CPU mesh: the full stack (config → data → SPMD jitted step → eval →
checkpoint/resume) in miniature."""

import os

import numpy as np
import pytest

import jax

from simpledepthestimation_tpu.config import CfgNode, get_cfg
from simpledepthestimation_tpu.engine.runtime import do_train, do_test


def _base_cfg(tmp_path, meta_arch):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = meta_arch
    cfg.MODEL.DEPTH_NET.NAME = "DepthResNet"
    cfg.MODEL.DEPTH_NET.ENCODER_NAME = "18"
    cfg.MODEL.DEPTH_NET.UPSAMPLE_DEPTH = False
    cfg.TPU.COMPUTE_DTYPE = "float32"  # CPU testing
    cfg.LOSS.VARIANCE_FOCUS = 0.85

    for split, length in (("TRAIN", 16), ("TEST", 3)):
        ds = cfg.DATASETS[split]
        ds.NAME = "SyntheticDepth"
        ds.LENGTH = length
        ds.IMG_HEIGHT = 64
        ds.IMG_WIDTH = 96
    cfg.DATASETS.TRAIN.PREPROCESS = [
        CfgNode({"NAME": "RandomFlip"}),
        CfgNode({"NAME": "ToTensor"}),
    ]
    cfg.DATASETS.TEST.PREPROCESS = [CfgNode({"NAME": "ToTensor"})]

    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.SOLVER.MAX_EPOCHS = 1
    cfg.SOLVER.CHECKPOINT_PERIOD = 1
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.TEST.EVAL_PERIOD = 1
    cfg.TEST.GT_SCALE = False
    cfg.EVALUATORS = ("kitti_evaluator",)
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 0
    cfg.LOG_PERIOD = 1
    cfg.VIS_PERIOD = 2  # exercise the depth-panel logging path
    return cfg


def test_supervised_end_to_end(tmp_path):
    cfg = _base_cfg(tmp_path, "SupDepthModel")
    cfg.SOLVER.OPT = "adamw_poly"
    cfg.SOLVER.DEPTH_LR = 1e-4
    cfg.freeze()

    state = do_train(cfg, resume=False)
    assert state is not None
    assert int(state.step) == 2  # 16 samples / batch 8 × 1 epoch

    # checkpoint written
    import glob

    assert glob.glob(os.path.join(cfg.OUTPUT_DIR, "*"))

    # eval standalone path (loads checkpoint)
    results = do_test(cfg)
    assert "kitti evaluator" in results
    assert np.isfinite(results["kitti evaluator"]["abs_rel"])


def test_supervised_loss_decreases(tmp_path):
    """Overfit 8 synthetic images for a few epochs: silog must drop."""
    cfg = _base_cfg(tmp_path, "SupDepthModel")
    cfg.DATASETS.TRAIN.LENGTH = 8
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.SOLVER.OPT = "adamw_poly"
    cfg.SOLVER.DEPTH_LR = 1e-3
    cfg.SOLVER.MAX_EPOCHS = 6
    cfg.TEST.EVAL_PERIOD = 0
    cfg.freeze()

    import json

    do_train(cfg, resume=False)
    metrics_file = os.path.join(cfg.OUTPUT_DIR, "metrics.json")
    rows = [json.loads(l) for l in open(metrics_file)]
    losses = [r["silog_loss"] for r in rows if "silog_loss" in r]
    assert len(losses) >= 4
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_monodepth2_end_to_end(tmp_path):
    cfg = _base_cfg(tmp_path, "MonoDepth2Model")
    cfg.MODEL.POSE_NET.NAME = "PoseNet"
    cfg.MODEL.POSE_NET.NUM_CONTEXTS = 2
    cfg.DATASETS.TRAIN.FORWARD_CONTEXT = 1
    cfg.DATASETS.TRAIN.BACKWARD_CONTEXT = 1
    cfg.DATASETS.TRAIN.PREPROCESS = [
        CfgNode({"NAME": "RandomFlip"}),
        CfgNode({"NAME": "RandomImageAug"}),
        CfgNode({"NAME": "ToTensor"}),
    ]
    cfg.LOSS.SSIM_WEIGHT = 0.85
    cfg.LOSS.C1 = 1e-4
    cfg.LOSS.C2 = 9e-4
    cfg.LOSS.CLIP = 0.0
    cfg.LOSS.AUTOMASK = True
    cfg.LOSS.SMOOTHNESS_WEIGHT = 0.001
    cfg.LOSS.PHOTOMETRIC_REDUCE = "min"
    cfg.LOSS.SUPERVISED_WEIGHT = 0.0
    cfg.LOSS.VAR_LOSS_WEIGHT = 0.0
    cfg.SOLVER.OPT = "adam_multistep"
    cfg.SOLVER.DEPTH_LR = 2e-4
    cfg.SOLVER.POSE_LR = 2e-4
    cfg.SOLVER.LR_STEPS = (15,)
    cfg.TEST.EVAL_PERIOD = 0
    cfg.TEST.GT_SCALE = True
    cfg.freeze()

    state = do_train(cfg, resume=False)
    assert int(state.step) == 2


def test_resume_continues_epoch(tmp_path):
    cfg = _base_cfg(tmp_path, "SupDepthModel")
    cfg.SOLVER.OPT = "adamw_poly"
    cfg.SOLVER.MAX_EPOCHS = 2
    cfg.TEST.EVAL_PERIOD = 0
    cfg.freeze()

    state1 = do_train(cfg, resume=False)
    assert int(state1.step) == 4

    # resume from the saved final checkpoint: no more epochs to run, state intact
    state2 = do_train(cfg, resume=True)
    assert int(state2.step) == 4


def test_async_eval_matches_sync(tmp_path):
    """TEST.ASYNC overlaps epoch-end eval with the next epoch on a
    params/batch_stats snapshot; the logged eval metrics must be identical
    to the synchronous path (same seed → same states → same numbers), with
    one eval row per epoch in both runs."""
    import json

    def run(async_flag, subdir):
        cfg = _base_cfg(tmp_path / subdir, "SupDepthModel")
        cfg.SOLVER.OPT = "adamw_poly"
        cfg.SOLVER.DEPTH_LR = 1e-4
        cfg.SOLVER.MAX_EPOCHS = 2
        cfg.TEST.EVAL_PERIOD = 1
        cfg.TEST.ASYNC = async_flag
        cfg.VIS_PERIOD = 0
        cfg.freeze()
        do_train(cfg, resume=False)
        rows = [
            json.loads(l)
            for l in open(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))
        ]
        evals = [
            {k: v for k, v in r.items() if k.startswith("kitti evaluator/")}
            for r in rows
            if any(k.startswith("kitti evaluator/") for k in r)
        ]
        return evals

    sync_rows = run(False, "sync")
    async_rows = run(True, "async")
    assert len(sync_rows) == 2 and len(async_rows) == 2
    for s, a in zip(sync_rows, async_rows):
        assert set(s) == set(a)
        for k in s:
            np.testing.assert_allclose(a[k], s[k], rtol=1e-6, err_msg=k)
