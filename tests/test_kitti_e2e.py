"""End-to-end MonoDepth2 training on a fabricated on-disk KITTI tree:
exercises the real KITTI indexing → LoadImg/Resize/Flip/Jitter pipeline →
self-supervised training → refined-depth eval, start to finish."""

import os

import numpy as np
import pytest

import cv2

from simpledepthestimation_tpu.config import CfgNode, get_cfg
from simpledepthestimation_tpu.engine.runtime import do_train


def _make_kitti(root, n=10, H=96, W=128):
    date, drive, cam = "2011_09_26", "0001", "image_02"
    rng = np.random.RandomState(0)
    drive_dir = os.path.join(root, "raw", date, f"{date}_drive_{drive}_sync", cam, "data")
    os.makedirs(drive_dir, exist_ok=True)
    depth_dir = os.path.join(
        root, "refined", f"{date}_drive_{drive}_sync", "proj_depth", "groundtruth", cam
    )
    os.makedirs(depth_dir, exist_ok=True)

    base = rng.randint(0, 255, (H, W, 3), np.uint8)
    for i in range(n):
        img = np.roll(base, i * 2, axis=1)  # temporal shift = photometric signal
        cv2.imwrite(os.path.join(drive_dir, f"{i:010d}.png"), img)
        depth = (rng.uniform(2, 60, (H, W)) * 255).astype(np.uint16)
        cv2.imwrite(os.path.join(depth_dir, f"{i:010d}.png"), depth)

    with open(os.path.join(root, "raw", date, "calib_cam_to_cam.txt"), "w") as f:
        f.write("P_rect_02: 70.0 0.0 64.0 0.0 0.0 70.0 48.0 0.0 0.0 0.0 1.0 0.0\n")
        f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
    for name in ("calib_velo_to_cam.txt", "calib_imu_to_velo.txt"):
        with open(os.path.join(root, "raw", date, name), "w") as f:
            f.write("R: 1 0 0 0 1 0 0 0 1\nT: 0 0 0\n")

    split = os.path.join(root, "split.txt")
    with open(split, "w") as f:
        for i in range(n):
            f.write(f"{date}/{date}_drive_{drive}_sync/{cam}/data/{i:010d}.png\n")
    return split


def test_monodepth2_on_kitti_tree(tmp_path):
    root = str(tmp_path / "kitti")
    split = _make_kitti(root, n=10)

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "MonoDepth2Model"
    cfg.MODEL.DEPTH_NET.NAME = "DepthResNet"
    cfg.MODEL.DEPTH_NET.ENCODER_NAME = "18"
    cfg.MODEL.DEPTH_NET.UPSAMPLE_DEPTH = False
    cfg.MODEL.POSE_NET.NAME = "PoseNet"
    cfg.MODEL.POSE_NET.NUM_CONTEXTS = 2
    cfg.TPU.COMPUTE_DTYPE = "float32"
    loss = cfg.LOSS
    loss.SSIM_WEIGHT = 0.85
    loss.C1, loss.C2, loss.CLIP = 1e-4, 9e-4, 0.0
    loss.AUTOMASK = True
    loss.SMOOTHNESS_WEIGHT = 0.001
    loss.PHOTOMETRIC_REDUCE = "min"
    loss.SUPERVISED_WEIGHT = 0.0
    loss.VAR_LOSS_WEIGHT = 0.0
    loss.VARIANCE_FOCUS = 0.85

    train = cfg.DATASETS.TRAIN
    train.NAME = "KittiDepthV2"
    train.DATA_ROOT = os.path.join(root, "raw")
    train.DEPTH_ROOT = ""
    train.SPLIT = split
    train.DEPTH_TYPE = "none"
    train.FORWARD_CONTEXT = 1
    train.BACKWARD_CONTEXT = 1
    train.STRIDE = 1
    train.PREPROCESS = [
        CfgNode({"NAME": "LoadImg", "WITH_CTX": True}),
        CfgNode({"NAME": "Resize", "IMG_W": 96, "IMG_H": 64}),
        CfgNode({"NAME": "RandomFlip"}),
        CfgNode({"NAME": "RandomImageAug"}),
        CfgNode({"NAME": "ToTensor"}),
    ]
    test = cfg.DATASETS.TEST
    test.NAME = "KittiDepthV2"
    test.DATA_ROOT = os.path.join(root, "raw")
    test.DEPTH_ROOT = os.path.join(root, "refined")
    test.SPLIT = split
    test.DEPTH_TYPE = "refined"
    test.PREPROCESS = [
        CfgNode({"NAME": "LoadImg"}),
        CfgNode({"NAME": "LoadDepth", "KEEP_ORIG": True}),
        CfgNode({"NAME": "ClipDepth", "MAX_DEPTH": 80}),
        CfgNode({"NAME": "Resize", "IMG_W": 96, "IMG_H": 64}),
        CfgNode({"NAME": "ToTensor"}),
    ]

    cfg.SOLVER.OPT = "adam_multistep"
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.SOLVER.DEPTH_LR = 2e-4
    cfg.SOLVER.POSE_LR = 2e-4
    cfg.SOLVER.LR_STEPS = (15,)
    cfg.SOLVER.MAX_EPOCHS = 1
    cfg.SOLVER.CHECKPOINT_PERIOD = 1
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.TEST.EVAL_PERIOD = 1
    cfg.TEST.GT_SCALE = True
    cfg.EVALUATORS = ("kitti_evaluator",)
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.SEED = 0
    cfg.LOG_PERIOD = 1
    cfg.freeze()

    state = do_train(cfg, resume=False)
    # 8 valid samples (10 frames − 2 boundary), batch 8, 1 epoch → 1 step
    assert int(state.step) == 1
    # eval ran and wrote metrics.json rows with the loss
    import json

    rows = [json.loads(l) for l in open(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))]
    assert any("rec_loss" in r for r in rows)
