"""Solver tests: LR schedules, param groups, freeze masks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from simpledepthestimation_tpu.config import get_cfg
from simpledepthestimation_tpu.solver import (
    build_optimizer,
    poly_lr_schedule,
    multistep_lr_schedule,
)
from simpledepthestimation_tpu.solver.build import apply_freeze, freeze_substrings_from_cfg


def test_poly_schedule():
    s = poly_lr_schedule(1e-3, 1e-5, 100, power=0.9)
    np.testing.assert_allclose(float(s(0)), 1e-3)
    np.testing.assert_allclose(float(s(100)), 1e-5, rtol=1e-5)
    assert float(s(50)) < 1e-3


def test_multistep_schedule():
    s = multistep_lr_schedule(1e-3, [10, 20], gamma=0.1)
    np.testing.assert_allclose(float(s(5)), 1e-3)
    np.testing.assert_allclose(float(s(15)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(s(25)), 1e-5, rtol=1e-5)


def test_param_groups_depth_pose():
    cfg = get_cfg()
    cfg.SOLVER.OPT = "adam_multistep"
    cfg.SOLVER.DEPTH_LR = 1e-3
    cfg.SOLVER.POSE_LR = 1e-4
    cfg.SOLVER.LR_STEPS = ()
    tx, _ = build_optimizer(cfg, steps_per_epoch=10)

    params = {
        "depth_net": {"w": jnp.ones((4,))},
        "pose_net": {"w": jnp.ones((4,))},
    }
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # update magnitudes scale with their group LRs (adam step ≈ lr at init)
    du = float(jnp.abs(updates["depth_net"]["w"]).mean())
    pu = float(jnp.abs(updates["pose_net"]["w"]).mean())
    assert du / pu == pytest.approx(10.0, rel=0.05)


def test_freeze_mask():
    """BtsModel mirrors the reference's unconditional set_misc
    (BTSNet.py:382-412): stem conv + every encoder BN affine frozen even
    with both FIX flags off; FIX_1ST_CONV adds the first block; decoder BNs
    and encoder downsample BNs stay trainable; other depth nets freeze
    nothing."""
    cfg = get_cfg()
    cfg.MODEL.DEPTH_NET.NAME = "BtsModel"
    cfg.MODEL.DEPTH_NET.ENCODER_NAME = "resnet50_bts"
    cfg.MODEL.DEPTH_NET.FIX_1ST_CONV = True
    frozen = freeze_substrings_from_cfg(cfg)
    assert "encoder/conv1/" in frozen and "encoder/layer1_0/" in frozen

    # non-BTS nets never call set_misc → nothing frozen even with the flag
    other = get_cfg()
    other.MODEL.DEPTH_NET.FIX_1ST_CONV = True
    assert freeze_substrings_from_cfg(other) == []

    tx = apply_freeze(optax.sgd(1.0), frozen)
    leaf = lambda: jnp.ones((2,))
    params = {
        "depth_net": {
            "encoder": {
                "conv1": {"kernel": leaf()},
                "bn1": {"scale": leaf()},
                "layer1_0": {"conv2": {"kernel": leaf()}},
                "layer3_0": {
                    "kernel": leaf(),
                    "bn2": {"scale": leaf()},
                    "downsample_bn": {"scale": leaf()},
                },
            },
            "decoder": {"bn2": {"scale": leaf()}},
        }
    }
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    enc = updates["depth_net"]["encoder"]

    def total(x):
        return float(jnp.abs(x).sum())

    assert total(enc["conv1"]["kernel"]) == 0  # stem conv: frozen
    assert total(enc["bn1"]["scale"]) == 0  # stem BN: frozen
    assert total(enc["layer1_0"]["conv2"]["kernel"]) == 0  # FIX_1ST_CONV block
    assert total(enc["layer3_0"]["bn2"]["scale"]) == 0  # block BN: frozen
    assert total(enc["layer3_0"]["kernel"]) > 0  # block conv: trains
    assert total(enc["layer3_0"]["downsample_bn"]["scale"]) > 0  # '.bn' misses torch downsample.1
    assert total(updates["depth_net"]["decoder"]["bn2"]["scale"]) > 0  # decoder out of scope


def test_remat_step_matches_plain(rng):
    """TPU.REMAT changes memory, not math."""
    from simpledepthestimation_tpu.models import build_model
    from simpledepthestimation_tpu.parallel import build_mesh, create_train_state, make_train_step

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "SupDepthModel"
    cfg.MODEL.DEPTH_NET.NAME = "DepthResNet"
    cfg.MODEL.DEPTH_NET.ENCODER_NAME = "18"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.SOLVER.OPT = "adamw_poly"
    cfg.SOLVER.DEPTH_LR = 1e-4

    model = build_model(cfg)
    tx, _ = build_optimizer(cfg, steps_per_epoch=10)
    batch = {
        "img": rng.rand(2, 64, 96, 3).astype(np.float32),
        "depth": rng.uniform(0, 60, (2, 64, 96, 1)).astype(np.float32),
    }
    mesh = build_mesh(("data",), (1,), devices=jax.devices()[:1])
    state_a = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
    state_b = jax.tree_util.tree_map(lambda x: x.copy(), state_a)

    step_plain = make_train_step(model, tx, mesh, donate=False, remat=False)
    step_remat = make_train_step(model, tx, mesh, donate=False, remat=True)
    _, m_plain = step_plain(state_a, batch, jax.random.PRNGKey(1))
    _, m_remat = step_remat(state_b, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(m_plain["total_loss"]), float(m_remat["total_loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m_plain["grad_norm"]), float(m_remat["grad_norm"]), rtol=1e-4
    )
