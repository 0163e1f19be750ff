"""Runtime pretrained-encoder injection: a '18pt' config + a torch-layout
weight file on disk → encoder params actually change before training."""

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


def _state(cfg, rng):
    model = build_model(cfg)
    optimizer, _ = build_optimizer(cfg, steps_per_epoch=1)
    batch = {
        "img": rng.rand(1, 64, 96, 3).astype(np.float32),
        "depth": rng.uniform(1, 60, (1, 64, 96, 1)).astype(np.float32),
    }
    return create_train_state(model, optimizer, batch, jax.random.PRNGKey(0))


def _cfg(encoder="18pt"):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "SupDepthModel"
    cfg.MODEL.DEPTH_NET.NAME = "DepthResNet"
    cfg.MODEL.DEPTH_NET.ENCODER_NAME = encoder
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.SOLVER.OPT = "adamw_poly"
    cfg.SOLVER.DEPTH_LR = 1e-4
    return cfg


def test_runtime_injects_weights(rng, tmp_path):
    path = tmp_path / "resnet18.pth"
    sd = _fake_torch_resnet18_state()
    torch.save(sd, str(path))

    cfg = _cfg("18pt")
    cfg.MODEL.DEPTH_NET.PRETRAINED_WEIGHTS = str(path)
    state = _state(cfg, rng)
    before = np.asarray(state.params["depth_net"]["encoder"]["conv1"]["kernel"]).copy()

    state2 = maybe_load_pretrained_encoder(cfg, state)
    after = np.asarray(state2.params["depth_net"]["encoder"]["conv1"]["kernel"])
    assert not np.allclose(before, after)
    np.testing.assert_allclose(
        after, np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0)), atol=1e-6
    )


def test_runtime_no_pt_suffix_noop(rng):
    cfg = _cfg("18")
    state = _state(cfg, rng)
    assert maybe_load_pretrained_encoder(cfg, state) is state


def test_runtime_missing_weights_warns(rng, monkeypatch):
    monkeypatch.delenv("SDE_TPU_PRETRAINED_DIR", raising=False)
    cfg = _cfg("18pt")
    state = _state(cfg, rng)
    out = maybe_load_pretrained_encoder(cfg, state)
    assert out is not None  # no crash; random init kept
