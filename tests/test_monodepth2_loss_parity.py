"""Regression guard: the batched per-scale MonoDepth2 loss must equal a
straightforward unbatched reference-style computation (per-context python
loop, reference MonoDepth2.py:78-125)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simpledepthestimation_tpu.config import get_cfg
from simpledepthestimation_tpu.models import build_model
from simpledepthestimation_tpu.models import losses as L
from simpledepthestimation_tpu.geometry.camera import (
    resize_img,
    scale_intrinsics,
    view_synthesis,
)

B, H, W = 2, 64, 96


def _cfg():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "MonoDepth2Model"
    cfg.MODEL.DEPTH_NET.NAME = "DepthResNet"
    cfg.MODEL.DEPTH_NET.ENCODER_NAME = "18"
    cfg.MODEL.DEPTH_NET.UPSAMPLE_DEPTH = False
    cfg.MODEL.POSE_NET.NAME = "PoseNet"
    cfg.MODEL.POSE_NET.NUM_CONTEXTS = 2
    cfg.TPU.COMPUTE_DTYPE = "float32"
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


def _reference_style_loss(model, variables, batch):
    """Unbatched per-context computation mirroring the reference loop."""
    from simpledepthestimation_tpu.models.meta_arch import normalize_image

    net_in = normalize_image(batch["img"], model.pixel_mean, model.pixel_std)
    depth_pred = model.depth_net.apply(
        {
            "params": variables["params"]["depth_net"],
            "batch_stats": variables["batch_stats"]["depth_net"],
        },
        net_in,
        flip=batch["flip"],
        train=True,
        mutable=["batch_stats"],
    )[0]
    ctx = batch["ctx_img"]
    pose_in = jnp.concatenate([batch["img"], ctx[:, 0], ctx[:, 1]], -1)
    poses = model.pose_net.apply(
        {"params": variables["params"]["pose_net"]}, pose_in, train=True
    )

    image = batch["img_orig"]
    intrinsics = batch["intrinsics"]
    num_scales = len(depth_pred)
    rec_total = 0.0
    smooth_total = 0.0
    for i in range(num_scales):
        scale_w = 1.0 / 2 ** (num_scales - i - 1)
        h, w = depth_pred[i].shape[1:3]
        rimg = resize_img(image, (h, w))
        K = scale_intrinsics(intrinsics, w / W, h / H)
        maps = []
        for j in range(2):
            tgt = resize_img(batch["ctx_img_orig"][:, j], (h, w))
            pose = poses[j]
            sampled, _, _, _ = view_synthesis(
                tgt, depth_pred[i], K, pose[:, :3, :3], pose[:, :3, 3:4]
            )
            for cand in (sampled, tgt):
                l1 = jnp.mean(jnp.abs(cand - rimg), -1, keepdims=True)
                s = jnp.mean(L.ssim(cand, rimg, 1e-4, 9e-4), -1, keepdims=True)
                maps.append(0.85 * s + 0.15 * l1)
        rec_total += jnp.mean(jnp.min(jnp.concatenate(maps, -1), -1))
        smooth_total += (
            L.smoothness_loss(depth_pred[i], rimg) * scale_w * 0.001 / num_scales
        )
    return rec_total / num_scales, smooth_total


def test_batched_loss_matches_reference_loop(rng):
    cfg = _cfg()
    model = build_model(cfg)
    batch = {
        "img": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        "img_orig": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)),
        "ctx_img": jnp.asarray(rng.rand(B, 2, H, W, 3).astype(np.float32)),
        "ctx_img_orig": jnp.asarray(rng.rand(B, 2, H, W, 3).astype(np.float32)),
        "intrinsics": jnp.tile(
            jnp.asarray([[[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]]], jnp.float32),
            (B, 1, 1),
        ),
        "flip": jnp.asarray([True, False]),
    }
    variables = model.init(jax.random.PRNGKey(0), batch, train=True)
    losses, _ = model.apply(variables, batch, train=True, mutable=["batch_stats"])

    rec_ref, smooth_ref = _reference_style_loss(model, variables, batch)
    np.testing.assert_allclose(float(losses["rec_loss"]), float(rec_ref), rtol=1e-5)
    np.testing.assert_allclose(float(losses["smooth_loss"]), float(smooth_ref), rtol=1e-5)
