"""Pose networks.

``PoseNet`` mirrors reference detectron2/modeling/pose_net/PoseNet.py:22-65
(SfmLearner-style 7-conv stack → global mean → 0.01× 6-DoF per context).
``GooglePoseNet``/``GoogleMotionNet`` mirror GooglePoseNet.py:30-208
(2-frame pose with learned rot/trans scales; dense residual motion decoder).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .build import POSE_NET_REGISTRY, compute_dtype
from .layers import ConvGNReLU
from ..geometry.pose import pose_vec2mat, euler2mat


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
        return jnp.maximum(raw, minval)
    if constraint == "clip_ste":
        # straight-through: forward clips, gradient passes through
        return raw + jax.lax.stop_gradient(jnp.maximum(raw, minval) - raw)
    if constraint == "softplus":
        return jax.nn.softplus(raw - 2.2) + minval
    raise ValueError(constraint)


@POSE_NET_REGISTRY.register()
class GooglePoseNet(nn.Module):
    """2-frame (optionally RGB-D) pose net with learned rot/trans scales
    (reference GooglePoseNet.py:30-86)."""

    input_channels: int = 6
    scale_constraint: str = "clip"
    dtype: Any = jnp.float32

    @classmethod
    def from_cfg(cls, cfg):
        pn = cfg.MODEL.POSE_NET
        with_depth = bool(pn.get("WITH_DEPTH", False))
        return cls(
            input_channels=(4 if with_depth else 3) * 2,
            scale_constraint=str(pn.get("SCALE_CONSTRAINT", "clip")),
            dtype=compute_dtype(cfg),
        )

    def _trunk(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        feats = [x]
        channels = (16, 32, 64, 128, 256, 256, 256)
        for i, ch in enumerate(channels):
            x = nn.Conv(
                ch, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name=f"conv{i + 1}"
            )(x)
            x = nn.relu(x)
            feats.append(x)
        return x, feats

    @nn.compact
    def __call__(self, pose_input: jnp.ndarray, train: bool = False):
        x, _ = self._trunk(pose_input)
        bottleneck = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)  # [B,1,1,C]
        raw = nn.Conv(6, (1, 1), use_bias=False, name="pose_head")(bottleneck)
        raw = raw[:, 0, 0, :] * 0.01  # [B,6]

        rot_scale = _constrained_scale(
            self.param("rot_scale", nn.initializers.constant(0.01), (1,)),
            self.scale_constraint,
        )
        trans_scale = _constrained_scale(
            self.param("trans_scale", nn.initializers.constant(0.01), (1,)),
            self.scale_constraint,
        )
        trans = raw[:, :3] * trans_scale
        rot = raw[:, 3:] * rot_scale
        return pose_vec2mat(jnp.concatenate([trans, rot], axis=1))


class MotionRefiner(nn.Module):
    """Refine a coarse translation field with features at one pyramid level
    (reference GooglePoseNet.py:89-141)."""

    out_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, motion: jnp.ndarray, feat: jnp.ndarray) -> jnp.ndarray:
        B, H, W, _ = feat.shape
        from ..geometry.camera import resize_img

        up = resize_img(motion, (H, W), mode="bilinear")
        combined = jnp.concatenate([up, feat], axis=-1)
        mid = max(4, feat.shape[-1] // 2)
        a = nn.relu(nn.Conv(mid, (3, 3), padding=1, dtype=self.dtype, name="conv1")(combined))
        b = nn.relu(nn.Conv(mid, (3, 3), padding=1, dtype=self.dtype, name="conv2")(a))
        delta = nn.Conv(
            self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="out"
        )(jnp.concatenate([a, b], axis=-1))
        return up + delta.astype(jnp.float32)


@POSE_NET_REGISTRY.register()
class GoogleMotionNet(nn.Module):
    """Pose head + dense residual motion-field decoder
    (reference GooglePoseNet.py:110-208).

    Returns (pose [B,4,4], motion_field [B,H,W,3] × motion_weight).
    ``motion_weight`` (the burn-in ramp) is a traced scalar input, not state.
    """

    input_channels: int = 8
    scale_constraint: str = "clip"
    motion_threshold: float = 0.0
    dtype: Any = jnp.float32

    @classmethod
    def from_cfg(cls, cfg):
        pn = cfg.MODEL.POSE_NET
        with_depth = bool(pn.get("WITH_DEPTH", True))
        return cls(
            input_channels=(4 if with_depth else 3) * 2,
            scale_constraint=str(pn.get("SCALE_CONSTRAINT", "clip")),
            motion_threshold=float(pn.get("MOTION_THRESHOLD", 0.0)),
            dtype=compute_dtype(cfg),
        )

    @nn.compact
    def __call__(
        self,
        pose_input: jnp.ndarray,
        motion_weight: jnp.ndarray | float = 1.0,
        train: bool = False,
    ):
        feats = [pose_input]
        x = pose_input
        channels = (16, 32, 64, 128, 256, 256, 256)
        for i, ch in enumerate(channels):
            x = nn.Conv(
                ch, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name=f"conv{i + 1}"
            )(x)
            x = nn.relu(x)
            feats.append(x)

        bottleneck = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        raw = nn.Conv(6, (1, 1), use_bias=False, name="pose_head")(bottleneck)
        raw = raw[:, 0, 0, :] * 0.01

        rot_scale = _constrained_scale(
            self.param("rot_scale", nn.initializers.constant(0.01), (1,)),
            self.scale_constraint,
        )
        trans_scale = _constrained_scale(
            self.param("trans_scale", nn.initializers.constant(0.01), (1,)),
            self.scale_constraint,
        )
        trans = raw[:, :3] * trans_scale
        rot = raw[:, 3:] * rot_scale
        pose = pose_vec2mat(jnp.concatenate([trans, rot], axis=1))

        # dense residual motion: start from the bottleneck translation,
        # refine through all pyramid levels coarse→fine
        motion = nn.Conv(3, (1, 1), use_bias=False, name="motion_seed")(bottleneck)
        motion = motion.astype(jnp.float32)
        for lvl in range(len(feats) - 1, -1, -1):
            motion = MotionRefiner(dtype=self.dtype, name=f"refine{lvl}")(motion, feats[lvl])
        motion = motion * trans_scale

        if self.motion_threshold > 0.0:
            mag = jnp.sqrt(jnp.sum(motion**2, axis=-1, keepdims=True))
            motion = jnp.where(mag > self.motion_threshold, motion, 0.0)

        return pose, motion * motion_weight
