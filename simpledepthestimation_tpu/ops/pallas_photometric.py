"""Fused photometric-error kernel (Pallas TPU).

Computes the MonoDepth2 per-pixel photometric map in ONE VMEM pass:

    photo = α · mean_c(clip((1 − SSIM(a,b))/2, 0, 1)) + (1−α) · mean_c(|a−b|)

where SSIM uses the reference's 3×3 reflect-padded window
(reference ssim_loss.py:6-53 + MonoDepth2.py:130-151). The unfused jnp
composition materializes ~12 HBM intermediates (6 window sums × 2 moments);
the kernel keeps everything in VMEM — per-batch-item grid, whole image block
(loss-scale images are ≤ 192×640×3 ≈ 1.4 MB, well inside VMEM).

Backward runs through the jnp reference implementation via ``jax.custom_vjp``
(same math, correctness over fusion in the reverse pass); the jnp path is
also the test oracle and the non-TPU fallback.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def photometric_map_reference(a: jnp.ndarray, b: jnp.ndarray, alpha: float,
                              C1: float, C2: float) -> jnp.ndarray:
    """Unfused jnp reference (oracle + fallback + backward)."""
    from ..models import losses as L

    l1 = jnp.mean(jnp.abs(a - b), axis=-1, keepdims=True)
    s = jnp.mean(L.ssim(a, b, C1, C2), axis=-1, keepdims=True)
    return alpha * s + (1.0 - alpha) * l1


def _kernel(a_ref, b_ref, out_ref, *, alpha: float, C1: float, C2: float):
    """Single-channel photometric contribution on a [1, H, W, 1] block.

    Per-(batch, channel) grid keeps VMEM residency at ~8 single-channel
    [H, W] f32 buffers (≈4 MB at 192×640) — the full-RGB variant overflowed
    the ~16 MB VMEM at the benchmark shape. Operands arrive [B, C, H, W]
    (Mosaic requires the trailing block dims to span the array dims)."""
    a = a_ref[0, 0].astype(jnp.float32)  # [H, W]
    b = b_ref[0, 0].astype(jnp.float32)
    H, W = a.shape

    def reflect_pad(x):
        # reflect by 1 on H and W using slices (no jnp.pad reflect in mosaic)
        x = jnp.concatenate([x[1:2], x, x[H - 2 : H - 1]], axis=0)
        return jnp.concatenate([x[:, 1:2], x, x[:, W - 2 : W - 1]], axis=1)

    def pool9(x):
        xp = reflect_pad(x)
        acc = None
        for dy in range(3):
            for dx in range(3):
                piece = xp[dy : dy + H, dx : dx + W]
                acc = piece if acc is None else acc + piece
        return acc / 9.0

    mu_a = pool9(a)
    mu_b = pool9(b)
    sig_a = pool9(a * a) - mu_a * mu_a
    sig_b = pool9(b * b) - mu_b * mu_b
    sig_ab = pool9(a * b) - mu_a * mu_b

    n = (2.0 * mu_a * mu_b + C1) * (2.0 * sig_ab + C2)
    d = (mu_a * mu_a + mu_b * mu_b + C1) * (sig_a + sig_b + C2)
    ssim_dist = jnp.clip((1.0 - n / d) * 0.5, 0.0, 1.0)

    out_ref[0, 0] = alpha * ssim_dist + (1.0 - alpha) * jnp.abs(a - b)


def _pallas_forward(a, b, alpha: float, C1: float, C2: float, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = a.shape
    a_cf = a.transpose(0, 3, 1, 2)  # [B, C, H, W]
    b_cf = b.transpose(0, 3, 1, 2)
    kernel = functools.partial(_kernel, alpha=alpha, C1=C1, C2=C2)
    per_channel = pl.pallas_call(
        kernel,
        grid=(B, C),
        in_specs=[
            pl.BlockSpec((1, 1, H, W), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H, W), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, H, W), lambda i, c: (i, c, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), jnp.float32),
        interpret=interpret,
    )(a_cf, b_cf)
    return jnp.mean(per_channel, axis=1)[..., None]  # [B, H, W, 1]


# largest per-channel plane that fits the Mosaic VMEM budget with all SSIM
# intermediates live (192×640 is marginal and crashes the v5e AOT compiler;
# 96×640 / 192×320 compile and run)
_MAX_PIXELS_FUSED = 96 * 640


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def photometric_map_fused(a, b, alpha: float = 0.85, C1: float = 1e-4, C2: float = 9e-4):
    """Fused photometric map [B,H,W,1]; falls back to the jnp composition on
    non-TPU backends and above the VMEM shape budget."""
    H, W = a.shape[1:3]
    if jax.default_backend() != "tpu" or H * W > _MAX_PIXELS_FUSED:
        return photometric_map_reference(a, b, alpha, C1, C2)
    return _pallas_forward(a, b, alpha, C1, C2)


def _fwd(a, b, alpha, C1, C2):
    return photometric_map_fused(a, b, alpha, C1, C2), (a, b)


def _bwd(alpha, C1, C2, residuals, g):
    a, b = residuals
    _, vjp = jax.vjp(lambda x, y: photometric_map_reference(x, y, alpha, C1, C2), a, b)
    return vjp(g)


photometric_map_fused.defvjp(_fwd, _bwd)
