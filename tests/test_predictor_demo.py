"""DefaultPredictor + demo-pipeline test: checkpoint → single-image inference
→ inverse preprocess to the original frame."""

import os

import numpy as np
import pytest

import jax

from simpledepthestimation_tpu.config import CfgNode, get_cfg


def test_default_predictor_roundtrip(rng, tmp_path):
    from simpledepthestimation_tpu.engine.trainer import DefaultPredictor
    from simpledepthestimation_tpu.engine.checkpoint import Checkpointer
    from simpledepthestimation_tpu.models import build_model
    from simpledepthestimation_tpu.parallel import create_train_state
    from simpledepthestimation_tpu.solver import build_optimizer

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "SupDepthModel"
    cfg.MODEL.DEPTH_NET.NAME = "DepthResNet"
    cfg.MODEL.DEPTH_NET.ENCODER_NAME = "18"
    cfg.MODEL.DEPTH_NET.UPSAMPLE_DEPTH = False
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.LOSS.VARIANCE_FOCUS = 0.85
    cfg.SOLVER.OPT = "adamw_poly"
    cfg.SOLVER.DEPTH_LR = 1e-4
    # test pipeline: resize to the network shape, invertible back to original
    cfg.DATASETS.TEST.PREPROCESS = [
        CfgNode({"NAME": "Resize", "IMG_W": 96, "IMG_H": 64}),
        CfgNode({"NAME": "ToTensor"}),
    ]
    cfg.OUTPUT_DIR = str(tmp_path / "out")

    # write a checkpoint the predictor can load
    model = build_model(cfg)
    optimizer, _ = build_optimizer(cfg, steps_per_epoch=1)
    sample = {"img": rng.rand(1, 64, 96, 3).astype(np.float32)}
    state = create_train_state(model, optimizer, sample, jax.random.PRNGKey(0), train=False)
    Checkpointer(cfg.OUTPUT_DIR).save(epoch=0, state=state)

    predictor = DefaultPredictor(cfg)
    image = rng.randint(0, 255, (128, 200, 3), np.uint8)
    depth = predictor(image)
    # inverse Resize restores the original frame
    assert depth.shape == (128, 200)
    assert np.isfinite(depth).all() and (depth > 0).all()

    # deterministic across calls
    depth2 = predictor(image)
    np.testing.assert_allclose(depth, depth2)
