"""Loss parity tests vs hand-built torch implementations mirroring the
reference's formulas (ssim_loss.py / losses.py / smoothness_loss.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

import torch
import torch.nn as nn
import torch.nn.functional as F

from simpledepthestimation_tpu.models import losses as L


def torch_ssim(x, y, C1=1e-4, C2=9e-4):
    pool = nn.AvgPool2d(3, stride=1)
    pad = nn.ReflectionPad2d(1)
    x, y = pad(x), pad(y)
    mu_x, mu_y = pool(x), pool(y)
    mu_x_mu_y = mu_x * mu_y
    mu_x_sq, mu_y_sq = mu_x.pow(2), mu_y.pow(2)
    sigma_x = pool(x.pow(2)) - mu_x_sq
    sigma_y = pool(y.pow(2)) - mu_y_sq
    sigma_xy = pool(x * y) - mu_x_mu_y
    v1 = 2 * sigma_xy + C2
    v2 = sigma_x + sigma_y + C2
    ssim_n = (2 * mu_x_mu_y + C1) * v1
    ssim_d = (mu_x_sq + mu_y_sq + C1) * v2
    return torch.clamp((1.0 - ssim_n / ssim_d) / 2.0, 0.0, 1.0)


def test_ssim_parity(rng):
    x = rng.rand(2, 8, 10, 3).astype(np.float32)
    y = rng.rand(2, 8, 10, 3).astype(np.float32)
    ours = np.asarray(L.ssim(jnp.asarray(x), jnp.asarray(y)))
    ref = torch_ssim(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(y).permute(0, 3, 1, 2)
    )
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_weighted_ssim_parity(rng):
    x = rng.rand(1, 8, 10, 3).astype(np.float32)
    y = rng.rand(1, 8, 10, 3).astype(np.float32)
    w = rng.rand(1, 8, 10, 1).astype(np.float32)

    ours, ours_avg_w = L.weighted_ssim(jnp.asarray(x), jnp.asarray(y), jnp.asarray(w))

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    ty = torch.from_numpy(y).permute(0, 3, 1, 2)
    tw = torch.from_numpy(w).permute(0, 3, 1, 2)
    pool = nn.AvgPool2d(3, stride=1)
    pad = nn.ReflectionPad2d(1)

    avg_w = F.avg_pool2d(tw, kernel_size=3, stride=1, padding=1)
    w_eps = tw + 1e-2
    inv = 1.0 / (avg_w + 1e-2)

    def wpool(v):
        return pool(pad(v * w_eps)) * inv

    mu_x, mu_y = wpool(tx), wpool(ty)
    sigma_x = wpool(tx**2) - mu_x**2
    sigma_y = wpool(ty**2) - mu_y**2
    sigma_xy = wpool(tx * ty) - mu_x * mu_y
    ssim_n = (2 * sigma_xy + 9e-4) * (2 * mu_x * mu_y + 1e-4)
    ssim_d = (sigma_x + sigma_y + 9e-4) * (mu_x**2 + mu_y**2 + 1e-4)
    ref = torch.clamp((1 - ssim_n / ssim_d) / 2, 0, 1)

    np.testing.assert_allclose(np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ours_avg_w), avg_w.permute(0, 2, 3, 1).numpy(), atol=1e-6
    )


def test_silog_parity(rng):
    est = rng.uniform(0.5, 40, (2, 8, 10, 1)).astype(np.float32)
    gt = rng.uniform(0.0, 40, (2, 8, 10, 1)).astype(np.float32)
    vf = 0.85
    ours = float(L.silog_loss(jnp.asarray(est), jnp.asarray(gt), vf))

    test, tgt = torch.from_numpy(est), torch.from_numpy(gt)
    mask = tgt > 1.0
    d = torch.log(test[mask]) - torch.log(tgt[mask])
    ref = float(torch.sqrt((d**2).mean() - vf * d.mean() ** 2) * 10.0)
    assert abs(ours - ref) < 1e-3


def test_silog_empty_mask_no_nan():
    est = jnp.ones((1, 4, 4, 1)) * 5.0
    gt = jnp.zeros((1, 4, 4, 1))  # nothing above 1.0
    out = L.silog_loss(est, gt)
    assert np.isfinite(float(out))


def test_smoothness_parity(rng):
    depth = rng.uniform(1, 50, (2, 8, 10, 1)).astype(np.float32)
    img = rng.rand(2, 8, 10, 3).astype(np.float32)
    ours = float(L.smoothness_loss(jnp.asarray(depth), jnp.asarray(img)))

    td = torch.from_numpy(depth).permute(0, 3, 1, 2)
    ti = torch.from_numpy(img).permute(0, 3, 1, 2)
    inv = 1.0 / td.clamp(min=1e-6)
    mean_inv = inv.mean(2, True).mean(3, True)
    inv_n = inv / mean_inv.clamp(min=1e-6)
    gx = lambda im: im[:, :, :, :-1] - im[:, :, :, 1:]
    gy = lambda im: im[:, :, :-1, :] - im[:, :, 1:, :]
    wx = torch.exp(-torch.mean(torch.abs(gx(ti)), 1, keepdim=True))
    wy = torch.exp(-torch.mean(torch.abs(gy(ti)), 1, keepdim=True))
    ref = float((gx(inv_n) * wx).abs().mean() + (gy(inv_n) * wy).abs().mean())
    assert abs(ours - ref) < 1e-5


def test_photometric_loss_blend(rng):
    real = rng.rand(1, 8, 10, 3).astype(np.float32)
    synth = rng.rand(1, 8, 10, 3).astype(np.float32)
    out = np.asarray(L.photometric_loss(jnp.asarray(real), jnp.asarray(synth), ssim_weight=0.85))
    assert out.shape == (1, 8, 10, 1)
    l1 = np.asarray(
        L.photometric_loss(jnp.asarray(real), jnp.asarray(synth), ssim_weight=0.0)
    )
    np.testing.assert_allclose(
        l1, np.abs(synth - real).mean(-1, keepdims=True), atol=1e-6
    )


def test_photometric_clip(rng):
    real = rng.rand(1, 8, 10, 3).astype(np.float32)
    synth = real.copy()
    synth[0, 0, 0] += 10.0  # one outlier
    clipped = np.asarray(
        L.photometric_loss(jnp.asarray(real), jnp.asarray(synth), ssim_weight=0.0, clip=0.5)
    )
    unclipped = np.asarray(
        L.photometric_loss(jnp.asarray(real), jnp.asarray(synth), ssim_weight=0.0, clip=0.0)
    )
    assert clipped.max() < unclipped.max()


def test_variance_loss(rng):
    d = rng.uniform(1, 10, (1, 8, 8, 1)).astype(np.float32)
    ours = float(L.variance_loss(jnp.asarray(d)))
    ref = float(1.0 / (((torch.from_numpy(d) / torch.from_numpy(d).mean()) - 1.0) ** 2).mean())
    assert abs(ours - ref) / abs(ref) < 1e-4


def test_motion_smoothness_and_sparsity(rng):
    m = rng.randn(2, 8, 10, 3).astype(np.float32)
    s = float(L.motion_smoothness_loss(jnp.asarray(m)))
    sp = float(L.motion_sparsity_loss(jnp.asarray(m)))
    assert np.isfinite(s) and s > 0
    assert np.isfinite(sp) and sp > 0
    # constant field → smoothness ~0
    const = np.ones((1, 8, 10, 3), np.float32)
    assert float(L.motion_smoothness_loss(jnp.asarray(const))) < 1e-6


def test_motion_consistency_perfect_cycle(rng):
    """Perfect inverse motion → near-zero errors."""
    B, H, W = 1, 8, 10
    R = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    t = np.full((B, H, W, 3), 0.1, np.float32)
    # identity warp coords
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    gx = (2 * xs / (W - 1) - 1).astype(np.float32)
    gy = (2 * ys / (H - 1) - 1).astype(np.float32)
    coords = np.tile(np.stack([gx, gy], -1)[None], (B, 1, 1, 1))
    mask = np.ones((B, H, W, 1), np.float32)
    rot_err, trans_err = L.motion_consistency_loss(
        jnp.asarray(coords), jnp.asarray(mask), jnp.asarray(R), jnp.asarray(R),
        jnp.asarray(t), jnp.asarray(-t),
    )
    assert float(trans_err) < 1e-6
