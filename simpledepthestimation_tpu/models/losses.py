"""Depth-estimation losses as pure jnp functions (NHWC).

Behavioral parity with reference detectron2/modeling/losses/ —
losses.py (silog, variance), ssim_loss.py (SSIM, WeightedSSIM),
photometric_loss.py, smoothness_loss.py, motion_loss.py — re-designed
functionally for jit: boolean-mask indexing becomes fixed-shape
``where``-masked means (empty masks give 0, not NaN), module state becomes
function arguments, and all reductions are static-shape.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.pool import avg_pool_3x3_reflect, avg_pool_3x3_same
from ..ops.resample import resample_bilinear_image_grad


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None) -> jnp.ndarray:
    """Mean of x over positions where mask is True; 0 if mask is empty."""
    mask = mask.astype(x.dtype)
    total = jnp.sum(x * mask, axis=axis)
    count = jnp.sum(mask, axis=axis)
    return total / jnp.maximum(count, 1.0)


# ---------------------------------------------------------------------------
# supervised
# ---------------------------------------------------------------------------


def silog_loss(depth_est: jnp.ndarray, depth_gt: jnp.ndarray, variance_focus: float = 0.85) -> jnp.ndarray:
    """Scale-invariant log loss (reference losses.py:5-13).

    mask = gt > 1; sqrt(E[d²] − vf·E[d]²) × 10 with d = log(est) − log(gt).
    """
    mask = depth_gt > 1.0
    safe_est = jnp.maximum(depth_est, 1e-12)
    safe_gt = jnp.maximum(depth_gt, 1e-12)
    d = jnp.where(mask, jnp.log(safe_est) - jnp.log(safe_gt), 0.0)
    mean_d2 = masked_mean(d * d, mask)
    mean_d = masked_mean(d, mask)
    return jnp.sqrt(jnp.maximum(mean_d2 - variance_focus * mean_d**2, 1e-12)) * 10.0


def variance_loss(depth: jnp.ndarray) -> jnp.ndarray:
    """Inverse relative-variance penalty (reference losses.py:16-18)."""
    return 1.0 / jnp.mean((depth / jnp.mean(depth) - 1.0) ** 2)


# ---------------------------------------------------------------------------
# SSIM family
# ---------------------------------------------------------------------------


def ssim(x: jnp.ndarray, y: jnp.ndarray, C1: float = 1e-4, C2: float = 9e-4) -> jnp.ndarray:
    """SSIM *distance* in [0,1]: clamp((1 − ssim)/2, 0, 1)
    (reference ssim_loss.py:6-53: reflection pad 1 + 3×3 avg pool)."""
    mu_x = avg_pool_3x3_reflect(x)
    mu_y = avg_pool_3x3_reflect(y)

    mu_xy = mu_x * mu_y
    mu_x2 = mu_x * mu_x
    mu_y2 = mu_y * mu_y

    sigma_x = avg_pool_3x3_reflect(x * x) - mu_x2
    sigma_y = avg_pool_3x3_reflect(y * y) - mu_y2
    sigma_xy = avg_pool_3x3_reflect(x * y) - mu_xy

    v1 = 2 * sigma_xy + C2
    v2 = sigma_x + sigma_y + C2
    ssim_n = (2 * mu_xy + C1) * v1
    ssim_d = (mu_x2 + mu_y2 + C1) * v2
    return jnp.clip((1.0 - ssim_n / ssim_d) / 2.0, 0.0, 1.0)


def weighted_ssim(
    x: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray, C1: float = 1e-4, C2: float = 9e-4
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Proximity-weighted SSIM distance (reference ssim_loss.py:56-111).

    w: [B,H,W,1] weights. inf C1/C2 select the structure-only / mean-only
    special cases. Returns (distance, avg_w).
    """
    avg_w = avg_pool_3x3_same(w)
    w_eps = w + 1e-2
    inv_avg_w = 1.0 / (avg_w + 1e-2)

    def wpool(v):
        return avg_pool_3x3_reflect(v * w_eps) * inv_avg_w

    mu_x = wpool(x)
    mu_y = wpool(y)
    sigma_x = wpool(x * x) - mu_x**2
    sigma_y = wpool(y * y) - mu_y**2
    sigma_xy = wpool(x * y) - mu_x * mu_y

    if C1 == float("inf"):
        ssim_n = 2 * sigma_xy + C2
        ssim_d = sigma_x + sigma_y + C2
    elif C2 == float("inf"):
        ssim_n = 2 * mu_x * mu_y + C1
        ssim_d = mu_x**2 + mu_y**2 + C1
    else:
        ssim_n = (2 * sigma_xy + C2) * (2 * mu_x * mu_y + C1)
        ssim_d = (sigma_x + sigma_y + C2) * (mu_x**2 + mu_y**2 + C1)

    return jnp.clip((1.0 - ssim_n / ssim_d) / 2.0, 0.0, 1.0), avg_w


# ---------------------------------------------------------------------------
# photometric
# ---------------------------------------------------------------------------


def photometric_loss(
    real: jnp.ndarray,
    synthesized: jnp.ndarray,
    ssim_weight: float = 0.85,
    C1: float = 1e-4,
    C2: float = 9e-4,
    clip: float = 0.0,
) -> jnp.ndarray:
    """α·SSIM + (1−α)·L1 per-pixel photometric error [B,H,W,1]
    (reference photometric_loss.py:11-72 / MonoDepth2.py:130-151)."""
    l1 = jnp.mean(jnp.abs(synthesized - real), axis=-1, keepdims=True)
    if ssim_weight > 0.0:
        s = jnp.mean(ssim(synthesized, real, C1, C2), axis=-1, keepdims=True)
        loss = ssim_weight * s + (1.0 - ssim_weight) * l1
    else:
        loss = l1
    if clip > 0.0:
        mean = jnp.mean(loss)
        std = jnp.std(loss, ddof=1)
        loss = jnp.minimum(loss, mean + clip * std)
    return loss


# ---------------------------------------------------------------------------
# smoothness
# ---------------------------------------------------------------------------


def gradient_x(image: jnp.ndarray, reversed: bool = False) -> jnp.ndarray:
    """x-gradient of NHWC image → [B,H,W-1,C] (reference smoothness_loss.py:4-21)."""
    if reversed:
        return image[:, :, 1:, :] - image[:, :, :-1, :]
    return image[:, :, :-1, :] - image[:, :, 1:, :]


def gradient_y(image: jnp.ndarray, reversed: bool = False) -> jnp.ndarray:
    if reversed:
        return image[:, 1:, :, :] - image[:, :-1, :, :]
    return image[:, :-1, :, :] - image[:, 1:, :, :]


def smoothness_loss(depth: jnp.ndarray, image: jnp.ndarray, reversed: bool = False) -> jnp.ndarray:
    """Edge-aware smoothness on mean-normalized inverse depth
    (reference smoothness_loss.py:42-80)."""
    inv_depth = 1.0 / jnp.maximum(depth, 1e-6)
    mean_inv = jnp.mean(inv_depth, axis=(1, 2), keepdims=True)
    inv_norm = inv_depth / jnp.maximum(mean_inv, 1e-6)

    d_gx = gradient_x(inv_norm, reversed)
    d_gy = gradient_y(inv_norm, reversed)
    i_gx = gradient_x(image, reversed)
    i_gy = gradient_y(image, reversed)

    wx = jnp.exp(-jnp.mean(jnp.abs(i_gx), axis=-1, keepdims=True))
    wy = jnp.exp(-jnp.mean(jnp.abs(i_gy), axis=-1, keepdims=True))

    return jnp.mean(jnp.abs(d_gx * wx)) + jnp.mean(jnp.abs(d_gy * wy))


# ---------------------------------------------------------------------------
# motion (cycle consistency / smoothness / sparsity)
# ---------------------------------------------------------------------------


def motion_consistency_loss(
    coords_A_in_B: jnp.ndarray,
    mask: jnp.ndarray,
    R_A2B: jnp.ndarray,
    R_B2A: jnp.ndarray,
    t_A2B: jnp.ndarray,
    t_B2A: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cyclic rotation/translation consistency (reference motion_loss.py:7-48).

    coords_A_in_B: [B,H,W,2] normalized warp coords; mask: [B,H,W,1];
    R_*: [B,3,3]; t_*: [B,H,W,3] dense translation fields.
    """
    B, H, W, _ = t_A2B.shape

    # detached coords, differentiated image operand (the reference
    # backprops grid_sample into t_B2A, motion_loss.py:11-12) — route to
    # the gather path built for exactly that gradient structure
    coords = jax.lax.stop_gradient(coords_A_in_B)
    xs = (coords[..., 0] + 1.0) * (W - 1.0) / 2.0
    ys = (coords[..., 1] + 1.0) * (H - 1.0) / 2.0
    sampled_t_B2A = resample_bilinear_image_grad(t_B2A, xs, ys)

    R2R1 = R_A2B @ R_B2A  # [B,3,3]
    # rotate the sampled reverse translation into frame B: R_A2B @ t per pixel
    rot_t = jnp.einsum("bij,bhwj->bhwi", R_A2B, sampled_t_B2A)
    trans_zero = rot_t + t_A2B  # should be ~0 under cycle consistency

    eye = jnp.eye(3, dtype=R_A2B.dtype)[None]
    rot_error = jnp.mean((R2R1 - eye) ** 2, axis=(1, 2))
    rot1_scale = jnp.mean((R_A2B - eye) ** 2, axis=(1, 2))
    rot2_scale = jnp.mean((R_B2A - eye) ** 2, axis=(1, 2))
    rot_error = jnp.mean(rot_error / (rot1_scale + rot2_scale + 1e-24))

    trans_error = jnp.sum(trans_zero**2, axis=-1)  # [B,H,W]
    trans1_scale = jnp.sum(t_A2B**2, axis=-1)
    trans2_scale = jnp.sum(sampled_t_B2A**2, axis=-1)
    trans_error = trans_error / (trans1_scale + trans2_scale + 1e-24)
    trans_error = jnp.mean(mask[..., 0] * trans_error)

    return rot_error, trans_error


def motion_smoothness_loss(motion_field: jnp.ndarray) -> jnp.ndarray:
    """Sqrt-of-squared-gradients smoothness (reference motion_loss.py:51-55)."""
    gx = gradient_x(motion_field, reversed=True)[:, 1:, :, :]
    gy = gradient_y(motion_field, reversed=True)[:, :, 1:, :]
    return jnp.mean(jnp.sqrt(1e-24 + gx**2 + gy**2))


def motion_sparsity_loss(motion_map: jnp.ndarray) -> jnp.ndarray:
    """L0.5 sparsity on normalized residual motion (reference motion_loss.py:58-64)."""
    abs_motion = jnp.abs(motion_map)
    mean_abs = jax.lax.stop_gradient(
        jnp.mean(abs_motion, axis=(1, 2), keepdims=True)
    )
    return jnp.mean(2.0 * mean_abs * jnp.sqrt(abs_motion / (mean_abs + 1e-24) + 1.0))
