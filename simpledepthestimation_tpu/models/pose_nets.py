"""Pose networks.

``PoseNet`` mirrors reference detectron2/modeling/pose_net/PoseNet.py:22-65
(SfmLearner-style 7-conv stack → global mean → 0.01× 6-DoF per context).
``GooglePoseNet``/``GoogleMotionNet`` mirror GooglePoseNet.py:30-208
(2-frame RGB(-D) pose with learned rot/trans scales; dense residual motion
field refined through all 8 feature levels).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .build import POSE_NET_REGISTRY, compute_dtype
from .layers import ConvGNReLU
from ..geometry.pose import pose_vec2mat
from ..geometry.camera import resize_img


@POSE_NET_REGISTRY.register()
class PoseNet(nn.Module):
    """7 stride-2 convs on concat(target, contexts) → per-context SE(3)."""

    num_contexts: int = 2
    dtype: Any = jnp.float32

    @classmethod
    def from_cfg(cls, cfg):
        return cls(
            num_contexts=int(cfg.MODEL.POSE_NET.NUM_CONTEXTS),
            dtype=compute_dtype(cfg),
        )

    @nn.compact
    def __call__(self, pose_input: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        """pose_input: [B,H,W,3*(1+num_contexts)]. Returns num_contexts [B,4,4]."""
        channels = (16, 32, 64, 128, 256, 256, 256)
        kernels = (7, 5, 3, 3, 3, 3, 3)
        x = pose_input
        for i, (ch, k) in enumerate(zip(channels, kernels)):
            x = ConvGNReLU(ch, kernel_size=k, stride=2, dtype=self.dtype, name=f"conv{i + 1}")(x)

        pose = nn.Conv(
            6 * self.num_contexts,
            (1, 1),
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="pose_head",
        )(x)
        pose = jnp.mean(pose.astype(jnp.float32), axis=(1, 2))  # [B, 6*N]
        pose = 0.01 * pose.reshape(pose.shape[0], self.num_contexts, 6)
        return [pose_vec2mat(pose[:, i]) for i in range(self.num_contexts)]


def _constrained_scale(raw: jnp.ndarray, constraint: str, minval: float = 0.001) -> jnp.ndarray:
    """Learned-scale reparameterizations (reference GooglePoseNet.py:181-198)."""
    if constraint == "clip":
        return nn.relu(raw - minval) + minval
    if constraint == "clip_ste":
        # straight-through: forward clips, gradient passes through
        return raw + jax.lax.stop_gradient(jnp.maximum(raw, minval) - raw)
    if constraint == "softplus":
        return nn.softplus(raw) * 0.01 + minval
    raise ValueError(constraint)


@POSE_NET_REGISTRY.register()
class GooglePoseNet(nn.Module):
    """2-frame (optionally RGB-D) pose net with learned rot/trans scales
    (reference GooglePoseNet.py:30-86). Pose layout: vec = (t, r)."""

    group_norm: bool = False
    learn_scale: bool = True
    scale_constraint: str = "clip"
    dtype: Any = jnp.float32

    @classmethod
    def from_cfg(cls, cfg):
        pn = cfg.MODEL.POSE_NET
        return cls(
            group_norm=bool(pn.get("GROUP_NORM", False)),
            learn_scale=bool(pn.get("LEARN_SCALE", True)),
            scale_constraint=str(pn.get("SCALE_CONSTRAIN", "clip")),
            dtype=compute_dtype(cfg),
        )

    @nn.compact
    def __call__(self, pose_input: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        channels = (16, 32, 64, 128, 256, 256, 256)
        kernels = (7, 5, 3, 3, 3, 3, 3)
        x = pose_input
        for i, (ch, k) in enumerate(zip(channels, kernels)):
            x = ConvGNReLU(
                ch, kernel_size=k, stride=2, group_norm=self.group_norm,
                dtype=self.dtype, name=f"conv{i + 1}",
            )(x)

        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        pose = nn.Conv(
            6, (1, 1), kernel_init=nn.initializers.xavier_uniform(), name="pose_pred"
        )(pooled)[:, 0, 0, :]
        trans, rot = pose[:, :3], pose[:, 3:]

        if self.learn_scale:
            rot_scale = _constrained_scale(
                self.param("rot_scale", nn.initializers.constant(0.01), ()),
                self.scale_constraint,
            )
            trans_scale = _constrained_scale(
                self.param("trans_scale", nn.initializers.constant(0.01), ()),
                self.scale_constraint,
            )
            vec = jnp.concatenate([trans * trans_scale, rot * rot_scale], -1)
        else:
            vec = jnp.concatenate([trans * 0.01, rot * 0.01], -1)
        return pose_vec2mat(vec)


class MotionRefiner(nn.Module):
    """Refine the translation field against one feature level
    (reference GooglePoseNet.py:89-115): two conv paths on cat(upsampled,
    skip), residual 1×1 combine."""

    channel_mid: int
    group_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, trans: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
        up = resize_img(trans, skip.shape[1:3], mode="bilinear")
        inputs = jnp.concatenate([up, skip], -1)
        out1 = ConvGNReLU(
            self.channel_mid, 3, 1, group_norm=self.group_norm, dtype=self.dtype, name="conv1"
        )(inputs)
        out2 = ConvGNReLU(
            self.channel_mid, 3, 1, group_norm=self.group_norm, dtype=self.dtype, name="conv21"
        )(inputs)
        out2 = ConvGNReLU(
            self.channel_mid, 3, 1, group_norm=self.group_norm, dtype=self.dtype, name="conv22"
        )(out2)
        combined = jnp.concatenate([out1, out2], -1)
        delta = nn.Conv(
            3, (1, 1), use_bias=False, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(), name="conv3",
        )(combined)
        return up + delta.astype(jnp.float32)


@POSE_NET_REGISTRY.register()
class GoogleMotionNet(nn.Module):
    """Pose head + dense residual motion-field decoder
    (reference GooglePoseNet.py:110-208).

    Returns (pose [B,4,4], motion_field [B,H,W,3] × motion_weight);
    ``motion_weight`` (the burn-in ramp) is a traced scalar input.
    """

    group_norm: bool = False
    learn_scale: bool = True
    mask_motion: bool = True
    scale_constraint: str = "clip"
    dtype: Any = jnp.float32

    @classmethod
    def from_cfg(cls, cfg):
        pn = cfg.MODEL.POSE_NET
        return cls(
            group_norm=bool(pn.get("GROUP_NORM", False)),
            learn_scale=bool(pn.get("LEARN_SCALE", True)),
            mask_motion=bool(pn.get("MASK_MOTION", True)),
            scale_constraint=str(pn.get("SCALE_CONSTRAIN", "clip")),
            dtype=compute_dtype(cfg),
        )

    @nn.compact
    def __call__(
        self,
        pose_input: jnp.ndarray,
        motion_weight: jnp.ndarray | float = 1.0,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        channels = (16, 32, 64, 128, 256, 512, 1024)
        feats = []
        x = pose_input
        for i, ch in enumerate(channels):
            x = ConvGNReLU(
                ch, kernel_size=3, stride=2, group_norm=self.group_norm,
                dtype=self.dtype, name=f"conv{i + 1}",
            )(x)
            feats.append(x)

        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)  # [B,1,1,1024]
        pose = nn.Conv(
            6, (1, 1), use_bias=False,
            kernel_init=nn.initializers.xavier_uniform(), name="pose_pred",
        )(pooled)  # [B,1,1,6]
        rot = pose[:, 0, 0, :3]
        trans = pose[:, 0, 0, 3:]

        # dense residual motion: 1×1 seed from the pose, refined coarse→fine
        # through every feature level then the input itself
        motion = nn.Conv(
            3, (1, 1), kernel_init=nn.initializers.xavier_uniform(), name="conv8"
        )(pose).astype(jnp.float32)
        for lvl in range(7, 0, -1):
            motion = MotionRefiner(
                channel_mid=channels[lvl - 1], group_norm=self.group_norm,
                dtype=self.dtype, name=f"refiner{lvl}",
            )(motion, feats[lvl - 1])
        motion = MotionRefiner(
            channel_mid=pose_input.shape[-1], group_norm=False,
            dtype=self.dtype, name="refiner0",
        )(motion, pose_input)

        if self.learn_scale:
            init = 0.4 if self.scale_constraint == "softplus" else 0.01
            trans_scale = _constrained_scale(
                self.param("trans_scale", nn.initializers.constant(init), ()),
                self.scale_constraint,
            )
            rot_scale = _constrained_scale(
                self.param("rot_scale", nn.initializers.constant(init), ()),
                self.scale_constraint,
            )
            vec = jnp.concatenate([trans * trans_scale, rot * rot_scale], -1)
            motion = motion * trans_scale
        else:
            vec = jnp.concatenate([trans * 0.01, rot * 0.01], -1)
            motion = motion * 0.01

        if self.mask_motion:
            mag = jnp.sqrt(jnp.sum(motion**2, axis=-1, keepdims=True))
            motion = motion * (mag > jnp.mean(mag)).astype(motion.dtype)

        return pose_vec2mat(vec), motion * motion_weight
