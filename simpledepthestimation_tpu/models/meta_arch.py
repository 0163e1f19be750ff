"""Meta-architectures: the cfg-built top-level models.

Functional Flax re-designs of reference detectron2/modeling/meta_arch/:

- ``SupDepthModel`` (Supervised.py:17-49): normalize → depth net → multi-scale
  silog vs nearest-resized gt.
- ``MonoDepth2Model`` (MonoDepth2.py:20-151): depth net on target, pose net on
  concat(target, contexts), per-scale view-synthesis photometric loss with
  automasking (identity reprojection) and per-pixel min reduction, edge-aware
  smoothness, optional supervised/variance terms.

Interface: ``model.apply(variables, batch, train=...)`` where batch is a dict
of jnp arrays (NHWC). Training returns a dict of scalar losses; eval returns
{'depth_pred': [B,H,W,1]}. All reference python-side mutation (flip flags,
automask branching) is re-expressed as traced tensors (SURVEY.md §7).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .build import META_ARCH_REGISTRY, build_depth_net, build_pose_net
from . import losses as L
from ..geometry.camera import resize_img, scale_intrinsics, view_synthesis


def normalize_image(img: jnp.ndarray, mean, std) -> jnp.ndarray:
    mean = jnp.asarray(mean, img.dtype).reshape(1, 1, 1, -1)
    std = jnp.asarray(std, img.dtype).reshape(1, 1, 1, -1)
    return (img - mean) / std


@META_ARCH_REGISTRY.register()
class SupDepthModel(nn.Module):
    depth_net: nn.Module
    pixel_mean: Tuple[float, ...] = (0.485, 0.456, 0.406)
    pixel_std: Tuple[float, ...] = (0.229, 0.224, 0.225)
    variance_focus: float = 0.85

    @classmethod
    def from_cfg(cls, cfg):
        return cls(
            depth_net=build_depth_net(cfg),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            variance_focus=float(cfg.LOSS.get("VARIANCE_FOCUS", 0.85)),
        )

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False) -> Dict[str, jnp.ndarray]:
        net_input = normalize_image(batch["img"], self.pixel_mean, self.pixel_std)
        flip = batch.get("flip")
        depth_pred = self.depth_net(
            net_input, flip=flip, train=train, intrinsics=batch.get("intrinsics")
        )

        if not train:
            return {"depth_pred": depth_pred[0]}

        depth_gt = batch["depth"]
        sup_losses = []
        for pred in depth_pred:
            gt = resize_img(depth_gt, pred.shape[1:3], mode="nearest")
            sup_losses.append(L.silog_loss(pred, gt, self.variance_focus))
        return {"silog_loss": sum(sup_losses) / len(sup_losses)}


@META_ARCH_REGISTRY.register()
class MonoDepth2Model(nn.Module):
    depth_net: nn.Module
    pose_net: nn.Module
    pixel_mean: Tuple[float, ...] = (0.485, 0.456, 0.406)
    pixel_std: Tuple[float, ...] = (0.229, 0.224, 0.225)
    ssim_weight: float = 0.85
    C1: float = 1e-4
    C2: float = 9e-4
    clip_loss: float = 0.0
    automask: bool = True
    photometric_reduce: str = "min"
    smooth_loss_w: float = 0.001
    sup_loss_w: float = 0.0
    var_loss_w: float = 0.0
    variance_focus: float = 0.85
    pallas_photometric: bool = True

    @classmethod
    def from_cfg(cls, cfg):
        loss = cfg.LOSS
        return cls(
            depth_net=build_depth_net(cfg),
            pose_net=build_pose_net(cfg),
            pallas_photometric=bool(cfg.TPU.get("PALLAS_PHOTOMETRIC", True)),
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            ssim_weight=float(loss.get("SSIM_WEIGHT", 0.85)),
            C1=float(loss.get("C1", 1e-4)),
            C2=float(loss.get("C2", 9e-4)),
            clip_loss=float(loss.get("CLIP", 0.0)),
            automask=bool(loss.get("AUTOMASK", True)),
            photometric_reduce=str(loss.get("PHOTOMETRIC_REDUCE", "min")),
            smooth_loss_w=float(loss.get("SMOOTHNESS_WEIGHT", 0.001)),
            sup_loss_w=float(loss.get("SUPERVISED_WEIGHT", 0.0)),
            var_loss_w=float(loss.get("VAR_LOSS_WEIGHT", 0.0)),
            variance_focus=float(loss.get("VARIANCE_FOCUS", 0.85)),
        )

    def _photometric(self, frame_A, sampled_B, n_groups: int = 1):
        """α·SSIM + (1−α)·L1 per-pixel map with optional mean+λσ clip
        (reference MonoDepth2.py:130-151).

        ``n_groups``: the leading batch dim stacks that many independent maps
        (the batched per-scale evaluation); the clip statistics are computed
        per group to match the reference's per-map clipping."""
        if self.ssim_weight > 0.0 and self.pallas_photometric:
            # fused VMEM kernel (falls back to the jnp composition off-TPU
            # or above the kernel's shape budget — identical math)
            from ..ops.pallas_photometric import photometric_map_fused

            photo = photometric_map_fused(
                sampled_B, frame_A, self.ssim_weight, self.C1, self.C2
            )
        elif self.ssim_weight > 0.0:
            photo = jnp.mean(jnp.abs(sampled_B - frame_A), axis=-1, keepdims=True)
            s = jnp.mean(L.ssim(sampled_B, frame_A, self.C1, self.C2), axis=-1, keepdims=True)
            photo = s * self.ssim_weight + photo * (1.0 - self.ssim_weight)
        else:
            photo = jnp.mean(jnp.abs(sampled_B - frame_A), axis=-1, keepdims=True)
        if self.clip_loss > 0.0:
            grouped = photo.reshape((n_groups, -1))
            mean = jnp.mean(grouped, axis=1)
            std = jnp.std(grouped, axis=1, ddof=1)
            cap = (mean + self.clip_loss * std).reshape(
                (n_groups,) + (1,) * (photo.ndim - 1)
            )
            cap = jnp.repeat(cap, photo.shape[0] // n_groups, axis=0)
            photo = jnp.minimum(photo, cap)
        return photo

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False) -> Dict[str, jnp.ndarray]:
        net_input = normalize_image(batch["img"], self.pixel_mean, self.pixel_std)
        flip = batch.get("flip")
        depth_pred = self.depth_net(net_input, flip=flip, train=train)

        if not train:
            return {"depth_pred": depth_pred[0]}

        # pose net on the (jittered) target + contexts, channel-concat
        ctx = batch["ctx_img"]  # [B, N, H, W, 3]
        B, N, H, W, _ = ctx.shape
        pose_input = jnp.concatenate(
            [batch["img"]] + [ctx[:, j] for j in range(N)], axis=-1
        )
        poses = self.pose_net(pose_input, train=train)  # N × [B,4,4]

        image = batch["img_orig"]
        contexts_orig = batch["ctx_img_orig"]  # [B,N,H,W,3]
        intrinsics = batch["intrinsics"]

        num_scales = len(depth_pred)
        out: Dict[str, jnp.ndarray] = {}
        smooth_total = 0.0
        sup_total = 0.0
        var_total = 0.0
        photo_per_scale = []

        # TPU-first batching: per scale, all N context warps run as ONE
        # view_synthesis on an [N·B] batch, and all 2N photometric maps
        # (warped + identity-reprojection) as ONE SSIM pass on [2N·B] —
        # fewer, larger gathers/windows instead of the reference's python
        # loop of small ops (MonoDepth2.py:87-101).
        poses_cat = jnp.concatenate(poses, axis=0)  # [N·B, 4, 4]

        for i in range(num_scales):
            scale_w = 1.0 / 2 ** (num_scales - i - 1)
            h, w = depth_pred[i].shape[1:3]
            resized_image = resize_img(image, (h, w))
            resized_K = scale_intrinsics(intrinsics, w / W, h / H)

            # [N·B, h, w, 3]: context j occupies rows j·B:(j+1)·B (n-major,
            # matching poses_cat)
            resized_targets = resize_img(
                contexts_orig.transpose(1, 0, 2, 3, 4).reshape(N * B, H, W, 3),
                (h, w),
            )

            depth_rep = jnp.tile(depth_pred[i], (N, 1, 1, 1))
            K_rep = jnp.tile(resized_K, (N, 1, 1))
            sampled, _, _, _ = view_synthesis(
                resized_targets,
                depth_rep,
                K_rep,
                poses_cat[:, :3, :3],
                poses_cat[:, :3, 3:4],
            )

            if self.automask:
                candidates = jnp.concatenate([sampled, resized_targets], axis=0)
                ref = jnp.tile(resized_image, (2 * N, 1, 1, 1))
            else:
                candidates = sampled
                ref = jnp.tile(resized_image, (N, 1, 1, 1))

            n_groups = candidates.shape[0] // B
            photo = self._photometric(ref, candidates, n_groups=n_groups)  # [kN·B,h,w,1]
            maps = photo.reshape(-1, B, h, w, 1)  # [kN, B, h, w, 1]

            if self.photometric_reduce == "min":
                photo_per_scale.append(jnp.mean(jnp.min(maps, axis=0)))
            elif self.photometric_reduce == "mean":
                photo_per_scale.append(jnp.mean(maps))
            else:
                raise NotImplementedError(self.photometric_reduce)

            if self.smooth_loss_w > 0.0:
                smooth_total += (
                    L.smoothness_loss(depth_pred[i], resized_image)
                    * scale_w * self.smooth_loss_w / num_scales
                )
            if self.sup_loss_w > 0.0:
                gt = resize_img(batch["depth"], (h, w), mode="nearest")
                sup_total += (
                    L.silog_loss(depth_pred[i], gt, self.variance_focus)
                    * scale_w * self.sup_loss_w / num_scales
                )
            if self.var_loss_w > 0.0:
                var_total += L.variance_loss(depth_pred[i]) * scale_w * self.var_loss_w / num_scales

        out["rec_loss"] = sum(photo_per_scale) / num_scales
        if self.smooth_loss_w > 0.0:
            out["smooth_loss"] = smooth_total
        if self.sup_loss_w > 0.0:
            out["sup_loss"] = sup_total
        if self.var_loss_w > 0.0:
            out["var_loss"] = var_total
        return out
