"""MotionLearning meta-architecture: unsupervised depth + dense motion.

Behavioral equivalent of reference detectron2/modeling/meta_arch/
MotionLearning.py:28-291: two frames batched [2B] through the depth net,
bidirectional RGB-D pose/motion inference, per-scale occlusion-masked RGBD
consistency with depth-proximity-weighted SSIM, motion cycle consistency,
motion smoothness + L0.5 sparsity on normalized residual motion, optional
scale normalization and semantic-mask gating.

The reference's per-step module mutation (RandLayerNorm stddev ramp, motion
burn-in weight — projects/MotionLearning/train.py:105-114) arrives here as
traced batch scalars ``noise_stddev`` and ``motion_weight``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .build import META_ARCH_REGISTRY, build_depth_net, build_pose_net
from .meta_arch import normalize_image
from .pose_nets import GoogleMotionNet
from . import losses as L
from ..geometry.camera import (
    resize_img,
    resize_img_avgpool,
    scale_intrinsics,
    view_synthesis,
)
from ..ops.pool import max_pool
from ..ops.resample import const_image_warps


@META_ARCH_REGISTRY.register()
class MotionLearningModel(nn.Module):
    depth_net: nn.Module
    pose_net: nn.Module
    pixel_mean: Tuple[float, ...] = (0.485, 0.456, 0.406)
    pixel_std: Tuple[float, ...] = (0.229, 0.224, 0.225)
    num_scales: int = 1
    ssim_loss_w: float = 3.0
    C1: float = float("inf")
    C2: float = 9e-6
    clip_loss: float = 0.0
    depth_l1_loss_w: float = 0.0
    smooth_loss_w: float = 0.001
    sup_loss_w: float = 0.0
    var_loss_w: float = 0.0
    variance_focus: float = 0.85
    motion_smooth_loss_w: float = 1.0
    motion_sparsity_loss_w: float = 0.2
    rot_cycle_loss_w: float = 1e-3
    trans_cycle_loss_w: float = 5e-2
    scale_normalize: bool = False
    pose_use_depth: bool = True
    with_mask: bool = False
    mask_dilation: int = 8

    @classmethod
    def from_cfg(cls, cfg):
        loss = cfg.LOSS

        def f(key, default):
            v = loss.get(key, default)
            return float(v) if v != "inf" else float("inf")

        return cls(
            depth_net=build_depth_net(cfg),
            pose_net=build_pose_net(cfg),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            num_scales=int(loss.get("NUM_SCALES", 1)),
            ssim_loss_w=f("SSIM_WEIGHT", 3.0),
            C1=f("C1", float("inf")),
            C2=f("C2", 9e-6),
            clip_loss=f("CLIP", 0.0),
            depth_l1_loss_w=f("DEPTH_L1_WEIGHT", 0.0),
            smooth_loss_w=f("SMOOTHNESS_WEIGHT", 0.001),
            sup_loss_w=f("SUPERVISED_WEIGHT", 0.0),
            var_loss_w=f("VAR_LOSS_WEIGHT", 0.0),
            variance_focus=f("VARIANCE_FOCUS", 0.85),
            motion_smooth_loss_w=f("MOTION_SMOOTHNESS_WEIGHT", 1.0),
            motion_sparsity_loss_w=f("MOTION_SPARSITY_WEIGHT", 0.2),
            rot_cycle_loss_w=f("ROT_CYCLE_WEIGHT", 1e-3),
            trans_cycle_loss_w=f("TRANS_CYCLE_WEIGHT", 5e-2),
            scale_normalize=bool(loss.get("SCALE_NORMALIZE", False)),
            pose_use_depth=bool(cfg.MODEL.POSE_NET.get("USE_DEPTH", True)),
            with_mask=bool(cfg.MODEL.get("WITH_MASK", False)),
            mask_dilation=int(cfg.MODEL.get("MASK_DILATION", 8)),
        )

    def _rgbd_consistency(self, frame_A, frame_B, depth_A, depth_B, K, R_A2B, t_A2B):
        """Occlusion-masked RGBD photometric terms (reference
        MotionLearning.py:248-291). t_A2B: [B,H,W,3] dense."""
        out = {}
        rgbd_B = jnp.concatenate([frame_B, depth_B], -1)
        # No gradient ever flows through the warped OPERAND: frame_B is a
        # constant input frame, and every consumer of the sampled depth
        # detaches it or compares it — depth_l1 detaches sampled_depth_B
        # (reference MotionLearning.py:267), the proximity weight is
        # detached as a whole (:283), and the occlusion mask is a float()
        # comparison (:259). The coordinate gradients (through depth_A and
        # the pose/motion projection) are unaffected. Making that
        # structural zero explicit lets XLA DCE the warp's image-cotangent
        # gather-transpose, which was 8 scatter fusions × 83 ms = 86% of
        # the traced 774 ms step at 128×416 [2B=32] (docs/PERF.md round-5
        # MotionLearning decomposition) — computing exact zeros.
        rgbd_B = jax.lax.stop_gradient(rgbd_B)
        with const_image_warps():
            sampled, depth_in_B, coords, proj_mask = view_synthesis(
                rgbd_B, depth_A, K, R_A2B, t_A2B
            )
        out["coords_A_in_B"] = coords
        sampled_frame_B = sampled[..., :3]
        sampled_depth_B = sampled[..., 3:]

        proj_mask = proj_mask.astype(jnp.float32)
        occlusion_mask = (depth_in_B < sampled_depth_B).astype(jnp.float32) * proj_mask
        out["occlusion_mask"] = occlusion_mask

        normalizer = jnp.sum(occlusion_mask, axis=(1, 2, 3)) + 1.0

        if self.depth_l1_loss_w > 0:
            l1 = jnp.abs(jax.lax.stop_gradient(sampled_depth_B) - depth_in_B) * occlusion_mask
            out["depth_l1_loss"] = (
                jnp.mean(jnp.sum(l1, axis=(1, 2, 3)) / normalizer) * self.depth_l1_loss_w
            )

        rgb_l1 = jnp.abs(sampled_frame_B - frame_A) * occlusion_mask
        out["rgb_l1_loss"] = jnp.mean(rgb_l1)

        if self.ssim_loss_w > 0.0:
            depth_error = (depth_in_B - sampled_depth_B) ** 2
            second_moment = (
                jnp.sum(depth_error * occlusion_mask, axis=(1, 2, 3)) / normalizer
            ) + 1e-4
            second_moment = second_moment.reshape(-1, 1, 1, 1)
            proximity_weight = second_moment / (depth_error + second_moment)
            proximity_weight = jax.lax.stop_gradient(proximity_weight * proj_mask)

            ssim_map, avg_weight = L.weighted_ssim(
                sampled_frame_B, frame_A, proximity_weight, self.C1, self.C2
            )
            out["depth_proximity_weight"] = proximity_weight
            out["ssim_loss"] = jnp.mean(ssim_map * avg_weight) * self.ssim_loss_w * 0.5

        return out

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False) -> Dict[str, jnp.ndarray]:
        noise_stddev = batch.get("noise_stddev", 0.0)
        motion_weight = batch.get("motion_weight", 1.0)

        takes_noise = "noise_stddev" in type(self.depth_net).__call__.__annotations__ or hasattr(
            self.depth_net, "norm"
        )

        def run_depth(images, flip=None):
            kwargs = {"train": train}
            if takes_noise:
                kwargs["noise_stddev"] = noise_stddev
            if flip is not None:
                # the reference's depth net flips its input and unflips its
                # output under the batch flip flag (GoogleResNet.py:160-171);
                # boundary-padding asymmetry makes the net only APPROXIMATELY
                # flip-equivariant, so skipping this diverges ~3e-3 in the
                # losses (found by the ML trajectory-parity test)
                kwargs["flip"] = flip
            return self.depth_net(images, **kwargs)

        if not train:
            net_input = normalize_image(batch["img"], self.pixel_mean, self.pixel_std)
            return {"depth_pred": run_depth(net_input, batch.get("flip"))[0]}

        frame1 = batch["img"]
        frame2 = batch["ctx_img"][:, 0]
        B = frame1.shape[0]

        flip = batch.get("flip")
        flip2 = jnp.concatenate([flip, flip], 0) if flip is not None else None
        both = jnp.concatenate(
            [
                normalize_image(frame1, self.pixel_mean, self.pixel_std),
                normalize_image(frame2, self.pixel_mean, self.pixel_std),
            ],
            axis=0,
        )
        depth_pred = run_depth(both, flip2)  # list of [2B,h,w,1]
        depth1 = depth_pred[0][:B]
        depth2 = depth_pred[0][B:]

        pin1, pin2 = frame1, frame2
        if self.pose_use_depth:
            pin1 = jnp.concatenate([pin1, depth1], -1)
            pin2 = jnp.concatenate([pin2, depth2], -1)
        pose_input = jnp.concatenate(
            [jnp.concatenate([pin1, pin2], -1), jnp.concatenate([pin2, pin1], -1)],
            axis=0,
        )  # [2B, H, W, 2C]

        is_motion_net = isinstance(self.pose_net, GoogleMotionNet)
        if is_motion_net:
            pose, motion = self.pose_net(pose_input, motion_weight=motion_weight, train=train)
        else:
            pose = self.pose_net(pose_input, train=train)
            motion = None

        pose_1to2, pose_2to1 = pose[:B], pose[B:]
        motion_1to2 = motion_2to1 = None
        if motion is not None:
            motion_1to2, motion_2to1 = motion[:B], motion[B:]
            if self.with_mask:
                mask1 = (batch["mask"] > 0).astype(jnp.float32)
                mask2 = (batch["ctx_mask"][:, 0] > 0).astype(jnp.float32)
                if self.mask_dilation > 0:
                    pool_size = self.mask_dilation * 2 + 1
                    mask1 = max_pool(mask1, pool_size, 1, "SAME")
                    mask2 = max_pool(mask2, pool_size, 1, "SAME")
                motion_1to2 = motion_1to2 * mask1
                motion_2to1 = motion_2to1 * mask2

        H0, W0 = depth1.shape[1:3]
        losses: Dict[str, jnp.ndarray] = {}

        def add(key, value):
            losses[key] = losses.get(key, 0.0) + value

        for i in reversed(range(self.num_scales)):
            scale_w = 1.0 / 2**i
            H, W = int(H0 * scale_w), int(W0 * scale_w)

            rf1 = resize_img_avgpool(frame1, (H, W))
            rf2 = resize_img_avgpool(frame2, (H, W))
            rK = scale_intrinsics(batch["intrinsics"], scale_w, scale_w)
            rd1 = resize_img_avgpool(depth1, (H, W))
            rd2 = resize_img_avgpool(depth2, (H, W))

            R_1to2 = pose_1to2[:, :3, :3]
            R_2to1 = pose_2to1[:, :3, :3]
            t1 = pose_1to2[:, :3, 3]  # [B,3]
            t2 = pose_2to1[:, :3, 3]

            if motion is not None:
                rm_1to2 = resize_img_avgpool(motion_1to2, (H, W))
                rm_2to1 = resize_img_avgpool(motion_2to1, (H, W))
                t_1to2 = t1[:, None, None, :] + rm_1to2  # [B,H,W,3]
                t_2to1 = t2[:, None, None, :] + rm_2to1
            else:
                rm_1to2 = rm_2to1 = None
                t_1to2 = jnp.broadcast_to(t1[:, None, None, :], (B, H, W, 3))
                t_2to1 = jnp.broadcast_to(t2[:, None, None, :], (B, H, W, 3))

            if self.scale_normalize:
                depth_mean = jnp.mean(jnp.concatenate([rd1, rd2], 0))
                d1n, d2n = rd1 / depth_mean, rd2 / depth_mean
                t_1to2 = t_1to2 / depth_mean
                t_2to1 = t_2to1 / depth_mean
                if rm_1to2 is not None:
                    rm_1to2 = rm_1to2 / depth_mean
                    rm_2to1 = rm_2to1 / depth_mean
            else:
                d1n, d2n = rd1, rd2

            # Both directions batched through ONE warp + weighted-SSIM pass
            # ([2B]: first half 1→2, second half 2→1) — fewer, larger kernels
            # (PERF.md note 5). Each returned loss is the mean over the [2B]
            # batch, i.e. the AVERAGE of the two directions; the reference
            # sums them (MotionLearning.py:129-137), hence the ×2.
            R_fwd = jnp.concatenate([R_1to2, R_2to1], 0)
            t_fwd = jnp.concatenate([t_1to2, t_2to1], 0)
            out = self._rgbd_consistency(
                jnp.concatenate([rf1, rf2], 0),
                jnp.concatenate([rf2, rf1], 0),
                jnp.concatenate([d1n, d2n], 0),
                jnp.concatenate([d2n, d1n], 0),
                jnp.concatenate([rK, rK], 0),
                R_fwd,
                t_fwd,
            )
            for k, v in out.items():
                if "loss" in k:
                    add(k, 2.0 * v * scale_w)

            if self.rot_cycle_loss_w > 0 or self.trans_cycle_loss_w > 0:
                # batched cycle: half h pairs direction h with its reverse
                R_bwd = jnp.concatenate([R_2to1, R_1to2], 0)
                t_bwd = jnp.concatenate([t_2to1, t_1to2], 0)
                rot_loss, trans_loss = L.motion_consistency_loss(
                    out["coords_A_in_B"], out["occlusion_mask"],
                    R_fwd, R_bwd, t_fwd, t_bwd,
                )
                add("rot_loss", 2.0 * rot_loss * scale_w * self.rot_cycle_loss_w)
                add("trans_loss", 2.0 * trans_loss * scale_w * self.trans_cycle_loss_w)

            if motion is not None:
                t1_scale = jnp.mean(t_1to2**2, axis=(1, 2, 3), keepdims=True) * 3.0
                t2_scale = jnp.mean(t_2to1**2, axis=(1, 2, 3), keepdims=True) * 3.0
                m1n = rm_1to2 / jnp.sqrt(t1_scale + 1e-12)
                m2n = rm_2to1 / jnp.sqrt(t2_scale + 1e-12)
                if self.motion_smooth_loss_w > 0.0:
                    add(
                        "motion_smooth_loss",
                        (L.motion_smoothness_loss(m1n) + L.motion_smoothness_loss(m2n))
                        * scale_w * self.motion_smooth_loss_w,
                    )
                if self.motion_sparsity_loss_w > 0.0:
                    add(
                        "motion_sparsity_loss",
                        (L.motion_sparsity_loss(m1n) + L.motion_sparsity_loss(m2n))
                        * scale_w * self.motion_sparsity_loss_w,
                    )

            if self.sup_loss_w > 0.0:
                g1 = resize_img(batch["depth"], (H, W), mode="nearest")
                g2 = resize_img(batch["ctx_depth"][:, 0], (H, W), mode="nearest")
                add(
                    "sup_loss",
                    (
                        L.silog_loss(rd1, g1, self.variance_focus)
                        + L.silog_loss(rd2, g2, self.variance_focus)
                    )
                    * scale_w * self.sup_loss_w,
                )

            if self.smooth_loss_w > 0.0:
                add(
                    "smooth_loss",
                    (L.smoothness_loss(d1n, rf1) + L.smoothness_loss(d2n, rf2))
                    * scale_w * self.smooth_loss_w,
                )

            if self.var_loss_w > 0.0:
                add(
                    "var_loss",
                    (L.variance_loss(rd1) + L.variance_loss(rd2)) * scale_w * self.var_loss_w,
                )

        return losses
