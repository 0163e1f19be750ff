"""Shape/loss tests for the extended model families: PackNet, BTS,
GoogleResNet(+v2), GooglePoseNet/GoogleMotionNet, MotionLearningModel."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simpledepthestimation_tpu.config import get_cfg
from simpledepthestimation_tpu.models import build_model, build_depth_net, build_pose_net

B, H, W = 1, 64, 96


def test_packnet_shapes(rng):
    cfg = get_cfg()
    cfg.MODEL.DEPTH_NET.NAME = "PackNet01"
    cfg.MODEL.DEPTH_NET.VERSION = "1A"
    cfg.MODEL.DEPTH_NET.UPSAMPLE_DEPTH = False
    cfg.TPU.COMPUTE_DTYPE = "float32"
    net = build_depth_net(cfg)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), img)
    depths = net.apply(variables, img)
    assert len(depths) == 4
    assert depths[0].shape == (B, H, W, 1)
    assert depths[1].shape == (B, H // 2, W // 2, 1)
    d = np.asarray(depths[0])
    assert np.isfinite(d).all() and (d > 0).all()


def test_packnet_version_b(rng):
    cfg = get_cfg()
    cfg.MODEL.DEPTH_NET.NAME = "PackNet01"
    cfg.MODEL.DEPTH_NET.VERSION = "1B"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    net = build_depth_net(cfg)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), img)
    depths = net.apply(variables, img)
    assert depths[0].shape == (B, H, W, 1)


def test_space_depth_roundtrip(rng):
    from simpledepthestimation_tpu.models.packnet import space_to_depth, depth_to_space

    x = jnp.asarray(rng.rand(2, 8, 12, 5).astype(np.float32))
    packed = space_to_depth(x, 2)
    assert packed.shape == (2, 4, 6, 20)
    np.testing.assert_allclose(np.asarray(depth_to_space(packed, 2)), np.asarray(x))


def test_bts_shapes(rng):
    cfg = get_cfg()
    cfg.MODEL.DEPTH_NET.NAME = "BtsModel"
    cfg.MODEL.DEPTH_NET.ENCODER_NAME = "resnet50_bts"
    cfg.MODEL.DEPTH_NET.BTS_SIZE = 512
    cfg.MODEL.DATASET = "kitti"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    net = build_depth_net(cfg)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    K = jnp.asarray(
        np.tile(np.array([[[700.0, 0, W / 2], [0, 700.0, H / 2], [0, 0, 1]]], np.float32), (B, 1, 1))
    )
    variables = net.init(jax.random.PRNGKey(0), img, intrinsics=K, train=False)
    depths = net.apply(variables, img, intrinsics=K, train=False)
    assert len(depths) == 1
    assert depths[0].shape == (B, H, W, 1)
    d = np.asarray(depths[0])
    assert np.isfinite(d).all() and (d >= 0).all()
    # focal scaling: doubling focal doubles depth
    d2 = np.asarray(net.apply(variables, img, intrinsics=K * 2, train=False)[0])
    mask = d > 1e-3
    np.testing.assert_allclose(d2[mask] / d[mask], 2.0, rtol=1e-4)


@pytest.mark.parametrize(
    "encoder", ["resnext50_bts", "densenet121_bts", "mobilenetv2_bts"]
)
def test_bts_encoder_zoo_forward(rng, encoder):
    """Each zoo encoder (reference BTSNet.py:278-333) must feed the BTS
    decoder 5 skip maps with the declared channel counts and produce a
    finite full-res depth."""
    from simpledepthestimation_tpu.models.encoders import BTS_ENCODERS

    cfg = get_cfg()
    cfg.MODEL.DEPTH_NET.NAME = "BtsModel"
    cfg.MODEL.DEPTH_NET.ENCODER_NAME = encoder
    cfg.MODEL.DEPTH_NET.BTS_SIZE = 256
    cfg.MODEL.DATASET = "kitti"
    cfg.TPU.COMPUTE_DTYPE = "float32"

    ctor, channels = BTS_ENCODERS[encoder]
    enc = ctor(jnp.float32, "encoder")
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    feats = enc.init_with_output(jax.random.PRNGKey(0), img, train=False)[0]
    assert tuple(f.shape[-1] for f in feats) == tuple(channels), encoder
    # strides: the BTS decoder needs H/2, H/4, H/8, H/16, H/32 skips
    assert tuple(f.shape[1] for f in feats) == (H // 2, H // 4, H // 8, H // 16, H // 32)

    net = build_depth_net(cfg)
    variables = net.init(jax.random.PRNGKey(0), img, train=False)
    depths = net.apply(variables, img, train=False)
    assert depths[0].shape == (B, H, W, 1)
    d = np.asarray(depths[0])
    assert np.isfinite(d).all() and (d >= 0).all()


def test_bts_lpg_planar_exactness():
    """LPG on a fronto-parallel plane (n=(0,0,1), dist=d) gives depth d."""
    from simpledepthestimation_tpu.models.bts import local_planar_guidance

    plane = np.zeros((1, 4, 6, 4), np.float32)
    plane[..., 2] = 1.0  # n3
    plane[..., 3] = 7.5  # dist
    out = np.asarray(local_planar_guidance(jnp.asarray(plane), 4))
    assert out.shape == (1, 16, 24)
    np.testing.assert_allclose(out, 7.5, rtol=1e-6)


def test_google_resnet_randln(rng):
    cfg = get_cfg()
    cfg.MODEL.DEPTH_NET.NAME = "GoogleResNet"
    cfg.MODEL.DEPTH_NET.ENCODER_NAME = "18"
    cfg.MODEL.DEPTH_NET.NORM = "randLN"
    cfg.MODEL.DEPTH_NET.LEARN_SCALE = False
    cfg.MODEL.DEPTH_NET.UPSAMPLE_DEPTH = False
    cfg.TPU.COMPUTE_DTYPE = "float32"
    net = build_depth_net(cfg)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        img,
        train=True,
        noise_stddev=0.5,
    )
    depths = net.apply(variables, img, train=False)
    assert len(depths) == 1
    assert depths[0].shape == (B, H, W, 1)

    # noise changes the training-mode output, eval is deterministic
    out_a = net.apply(
        variables, img, train=True, noise_stddev=0.5,
        rngs={"noise": jax.random.PRNGKey(2)},
    )
    out_b = net.apply(
        variables, img, train=True, noise_stddev=0.5,
        rngs={"noise": jax.random.PRNGKey(3)},
    )
    assert not np.allclose(np.asarray(out_a[0]), np.asarray(out_b[0]))


def test_rand_layer_norm_zero_stddev_finite(rng):
    # The MotionLearning noise ramp starts at stddev 0 (a traced scalar);
    # fmod(x, 0) is NaN, so train-mode output must stay finite and match
    # the noise-free statistics exactly at stddev 0.
    from simpledepthestimation_tpu.models.layers import RandLayerNorm

    ln = RandLayerNorm()
    x = jnp.asarray(rng.rand(2, 8, 12, 5).astype(np.float32))
    variables = ln.init(jax.random.PRNGKey(0), x)
    noisy = ln.apply(
        variables, x, stddev=jnp.float32(0.0), rng=jax.random.PRNGKey(1), train=True
    )
    clean = ln.apply(variables, x, train=False)
    assert np.isfinite(np.asarray(noisy)).all()
    np.testing.assert_allclose(np.asarray(noisy), np.asarray(clean), rtol=1e-6)


def test_google_resnet_v2(rng):
    cfg = get_cfg()
    cfg.MODEL.DEPTH_NET.NAME = "GoogleResNetv2"
    cfg.MODEL.DEPTH_NET.ENCODER_NAME = "18"
    cfg.MODEL.DEPTH_NET.NORM = "BN"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    net = build_depth_net(cfg)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), img, train=False)
    depths = net.apply(variables, img, train=False)
    assert depths[0].shape == (B, H, W, 1)


def test_google_pose_net(rng):
    cfg = get_cfg()
    cfg.MODEL.POSE_NET.NAME = "GooglePoseNet"
    cfg.MODEL.POSE_NET.GROUP_NORM = False
    cfg.MODEL.POSE_NET.LEARN_SCALE = True
    cfg.TPU.COMPUTE_DTYPE = "float32"
    net = build_pose_net(cfg)
    x = jnp.asarray(rng.rand(2, H, W, 8).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    pose = net.apply(variables, x)
    assert pose.shape == (2, 4, 4)
    np.testing.assert_allclose(np.asarray(pose)[:, 3], np.tile([0, 0, 0, 1], (2, 1)), atol=1e-6)


def test_google_motion_net(rng):
    cfg = get_cfg()
    cfg.MODEL.POSE_NET.NAME = "GoogleMotionNet"
    cfg.MODEL.POSE_NET.GROUP_NORM = False
    cfg.MODEL.POSE_NET.LEARN_SCALE = True
    cfg.MODEL.POSE_NET.MASK_MOTION = True
    cfg.MODEL.POSE_NET.SCALE_CONSTRAIN = "clip_ste"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    net = build_pose_net(cfg)
    x = jnp.asarray(rng.rand(2, 128, 128, 8).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    pose, motion = net.apply(variables, x, motion_weight=0.5)
    assert pose.shape == (2, 4, 4)
    assert motion.shape == (2, 128, 128, 3)
    # burn-in weight 0 kills the motion field
    _, motion0 = net.apply(variables, x, motion_weight=0.0)
    np.testing.assert_allclose(np.asarray(motion0), 0.0, atol=1e-8)


def _motion_cfg():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "MotionLearningModel"
    cfg.MODEL.DEPTH_NET.NAME = "GoogleResNet"
    cfg.MODEL.DEPTH_NET.ENCODER_NAME = "18"
    cfg.MODEL.DEPTH_NET.NORM = "randLN"
    cfg.MODEL.DEPTH_NET.LEARN_SCALE = False
    cfg.MODEL.DEPTH_NET.UPSAMPLE_DEPTH = False
    cfg.MODEL.POSE_NET.NAME = "GoogleMotionNet"
    cfg.MODEL.POSE_NET.USE_DEPTH = True
    cfg.MODEL.POSE_NET.GROUP_NORM = False
    cfg.MODEL.POSE_NET.MASK_MOTION = True
    cfg.MODEL.POSE_NET.LEARN_SCALE = True
    cfg.MODEL.POSE_NET.SCALE_CONSTRAIN = "clip_ste"
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
    return cfg


def test_motion_learning_meta_arch(rng):
    cfg = _motion_cfg()
    model = build_model(cfg)
    batch = {
        "img": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        "ctx_img": jnp.asarray(rng.rand(B, 1, H, W, 3).astype(np.float32)),
        "intrinsics": jnp.asarray(
            np.tile(np.array([[[55.0, 0, W / 2], [0, 55.0, H / 2], [0, 0, 1]]], np.float32), (B, 1, 1))
        ),
        "noise_stddev": jnp.float32(0.1),
        "motion_weight": jnp.float32(1.0),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        batch,
        train=True,
    )
    losses = model.apply(
        variables, batch, train=True, rngs={"noise": jax.random.PRNGKey(2)}
    )
    expected = {
        "rgb_l1_loss", "ssim_loss", "rot_loss", "trans_loss",
        "motion_smooth_loss", "motion_sparsity_loss", "smooth_loss",
    }
    assert expected <= set(losses.keys()), losses.keys()
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    out = model.apply(variables, {"img": batch["img"]}, train=False)
    assert out["depth_pred"].shape == (B, H, W, 1)


def test_conv3d_blocked_matches_ndhwc(rng):
    """The blocked-halo MXU formulation of the packed 3D conv is numerically
    equal to the literal NDHWC conv for every block size / channel-count
    regime (divisible, non-divisible, C < G)."""
    from simpledepthestimation_tpu.models.packnet import (
        _conv3d_over_packed,
        _conv3d_over_packed_blocked,
    )

    for C, G in [(8, 4), (24, 30), (13, 5), (64, 14)]:
        x = jnp.asarray(rng.rand(2, 6, 10, C).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, 3, 1, 8).astype(np.float32))
        b = jnp.asarray(rng.randn(8).astype(np.float32))
        ref = np.asarray(_conv3d_over_packed(x, k, b))
        got = np.asarray(_conv3d_over_packed_blocked(x, k, b, G))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5), (C, G)


def test_conv3d_blocked_gradients(rng):
    from simpledepthestimation_tpu.models.packnet import (
        _conv3d_over_packed,
        _conv3d_over_packed_blocked,
    )

    x = jnp.asarray(rng.rand(1, 4, 6, 12).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 1, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(8).astype(np.float32))

    g_ref = jax.grad(lambda k_: jnp.sum(jnp.sin(_conv3d_over_packed(x, k_, b))))(k)
    g_blk = jax.grad(
        lambda k_: jnp.sum(jnp.sin(_conv3d_over_packed_blocked(x, k_, b, 5)))
    )(k)
    np.testing.assert_allclose(np.asarray(g_blk), np.asarray(g_ref), rtol=1e-4, atol=1e-5)
