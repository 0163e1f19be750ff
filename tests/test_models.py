"""Model construction + forward-shape tests (the reference's only unit tests
were shape-printing __main__ smoke blocks — BTSNet.py:416-436; we make them
real)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simpledepthestimation_tpu.config import get_cfg
from simpledepthestimation_tpu.models import build_model, build_depth_net, build_pose_net


def _supervised_cfg(encoder="18"):
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "SupDepthModel"
    cfg.MODEL.DEPTH_NET.NAME = "DepthResNet"
    cfg.MODEL.DEPTH_NET.ENCODER_NAME = encoder
    cfg.MODEL.DEPTH_NET.UPSAMPLE_DEPTH = False
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.LOSS.VARIANCE_FOCUS = 0.85
    return cfg


def _monodepth2_cfg():
    cfg = _supervised_cfg()
    cfg.MODEL.META_ARCHITECTURE = "MonoDepth2Model"
    cfg.MODEL.POSE_NET.NAME = "PoseNet"
    cfg.MODEL.POSE_NET.NUM_CONTEXTS = 2
    cfg.LOSS.SSIM_WEIGHT = 0.85
    cfg.LOSS.C1 = 1e-4
    cfg.LOSS.C2 = 9e-4
    cfg.LOSS.CLIP = 0.0
    cfg.LOSS.AUTOMASK = True
    cfg.LOSS.SMOOTHNESS_WEIGHT = 0.001
    cfg.LOSS.PHOTOMETRIC_REDUCE = "min"
    cfg.LOSS.SUPERVISED_WEIGHT = 0.0
    cfg.LOSS.VAR_LOSS_WEIGHT = 0.0
    return cfg


B, H, W = 2, 64, 96


def test_depth_resnet_shapes(rng):
    cfg = _supervised_cfg()
    net = build_depth_net(cfg)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), img, train=False)
    depths = net.apply(variables, img, train=False)
    assert len(depths) == 4
    assert depths[0].shape == (B, H, W, 1)
    assert depths[1].shape == (B, H // 2, W // 2, 1)
    assert depths[3].shape == (B, H // 8, W // 8, 1)
    # softplus disparity is unbounded above → depth in (0, MAX_DEPTH]
    d = np.asarray(depths[0])
    assert (d > 0).all() and (d <= 80.0 + 1e-4).all()


def test_depth_resnet_flip_equivariance(rng):
    """flip flag: net(flip(x)) unflipped == net with flip=True."""
    cfg = _supervised_cfg()
    net = build_depth_net(cfg)
    img = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), img, train=False)

    flip_on = net.apply(variables, img, flip=jnp.array([True]), train=False)
    manual = net.apply(variables, img[:, :, ::-1, :], train=False)
    np.testing.assert_allclose(
        np.asarray(flip_on[0]), np.asarray(manual[0][:, :, ::-1, :]), atol=1e-5
    )
    flip_off = net.apply(variables, img, flip=jnp.array([False]), train=False)
    plain = net.apply(variables, img, train=False)
    np.testing.assert_allclose(np.asarray(flip_off[0]), np.asarray(plain[0]), atol=1e-6)


def test_pose_net_shapes(rng):
    cfg = _monodepth2_cfg()
    net = build_pose_net(cfg)
    x = jnp.asarray(rng.rand(B, H, W, 9).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    poses = net.apply(variables, x, train=False)
    assert len(poses) == 2
    for T in poses:
        T = np.asarray(T)
        assert T.shape == (B, 4, 4)
        np.testing.assert_allclose(T[:, 3], np.tile([0, 0, 0, 1], (B, 1)), atol=1e-6)
        # rotations near identity at init (0.01 scale)
        np.testing.assert_allclose(T[:, :3, :3], np.tile(np.eye(3), (B, 1, 1)), atol=0.2)


def test_supervised_meta_arch_train_and_eval(rng):
    cfg = _supervised_cfg()
    model = build_model(cfg)
    batch = {
        "img": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        "depth": jnp.asarray(rng.uniform(0, 60, (B, H, W, 1)).astype(np.float32)),
    }
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)
    losses, _ = model.apply(variables, batch, train=True, mutable=["batch_stats"])
    assert "silog_loss" in losses
    assert np.isfinite(float(losses["silog_loss"]))

    out = model.apply(variables, batch, train=False)
    assert out["depth_pred"].shape == (B, H, W, 1)


def test_monodepth2_meta_arch_losses(rng):
    cfg = _monodepth2_cfg()
    model = build_model(cfg)
    batch = {
        "img": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        "img_orig": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        "ctx_img": jnp.asarray(rng.rand(B, 2, H, W, 3).astype(np.float32)),
        "ctx_img_orig": jnp.asarray(rng.rand(B, 2, H, W, 3).astype(np.float32)),
        "intrinsics": jnp.tile(
            jnp.asarray(
                [[[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]]], jnp.float32
            ),
            (B, 1, 1),
        ),
        "flip": jnp.zeros((B,), bool),
    }
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)
    losses, _ = model.apply(variables, batch, train=True, mutable=["batch_stats"])
    assert "rec_loss" in losses and "smooth_loss" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["rec_loss"]) > 0

    out = model.apply(variables, batch, train=False)
    assert out["depth_pred"].shape == (B, H, W, 1)


def test_monodepth2_gradients_flow(rng):
    cfg = _monodepth2_cfg()
    model = build_model(cfg)
    batch = {
        "img": jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32)),
        "img_orig": jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32)),
        "ctx_img": jnp.asarray(rng.rand(1, 2, H, W, 3).astype(np.float32)),
        "ctx_img_orig": jnp.asarray(rng.rand(1, 2, H, W, 3).astype(np.float32)),
        "intrinsics": jnp.asarray(
            [[[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]]], jnp.float32
        ),
        "flip": jnp.zeros((1,), bool),
    }
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch,
            train=True,
            mutable=["batch_stats"],
        )
        return sum(out.values())

    grads = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    norms = [float(jnp.abs(g).max()) for g in leaves]
    assert all(np.isfinite(n) for n in norms)
    # both depth and pose nets receive gradient
    assert any(n > 0 for n in norms)
    pose_grads = jax.tree_util.tree_leaves(grads["pose_net"])
    assert any(float(jnp.abs(g).max()) > 0 for g in pose_grads)
