"""Banded bilinear warp as MXU matmuls (Pallas TPU).

The self-supervised photometric losses warp context frames with
ego-motion-induced coordinates (reference detectron2/geometry/camera.py:196
rides CUDA texture units via ``F.grid_sample``).  On TPU the natural
formulation is a gather, but gathers pay a per-index scalar cost
(docs/PERF.md item 2) and are the measured flagship-step ceiling.  This
kernel removes the gather entirely by exploiting two structural facts:

1. **x-interpolation is a tiny-support linear map over the row**, so for an
   output row it can be written as ``band @ X`` where ``X[w, j] =
   (w==x0_j)(1-wx_j) + (w==x0_j+1)wx_j`` is built in VMEM from a 2-D iota
   compare (no gather, no scatter) and the matmul runs on the MXU.
2. **y-displacement is small for ego-motion warps** (the projection in
   view_synthesis clips coords into the image, poses are 0.01-scaled, and
   pitch/roll between adjacent frames is tiny), so each 8-row output tile
   only needs a BANDED window of input rows, DMA'd once per tile:
   the y-interpolation is an indicator-weighted sum over the band
   (iota compare again), not an index lookup.

Out-of-image corners never match any iota position, which reproduces
``padding_mode='zeros'`` semantics exactly with no clamping or masking.
Pixels whose (in-image) y-corner falls OUTSIDE the band cannot be computed
by the kernel; a per-tile violation flag is returned so the caller can
``lax.cond`` to the exact gather path (ops/resample.py) for that step.

Forward and the coordinate backward (the production gradient — the warped
operand is the constant context frame) are Pallas kernels; the image
cotangent is produced by the jnp gather-transpose and DCE'd by XLA when
unused.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

TILE_H = 8


def _dot_precision(dot_dtype):
    # f32 one-hot matmuls must not be silently demoted to one-pass bf16
    return (
        jax.lax.Precision.HIGHEST
        if dot_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _band_geometry(band_up: int, band_dn: int) -> int:
    tband = TILE_H + band_up + band_dn + 1
    if tband % 8 != 0:
        raise ValueError(
            f"band_up+band_dn must satisfy (8+up+dn+1) % 8 == 0, got {band_up}+{band_dn}"
        )
    return tband


def _row_terms(xr, yr, t, W, band_up, f32=jnp.float32):
    """Shared fwd/bwd per-row index math: weights, one-hot anchors, band rows."""
    x0f = jnp.floor(xr)
    y0f = jnp.floor(yr)
    wx = (xr - x0f).astype(f32)
    wy = (yr - y0f).astype(f32)
    x0 = x0f.astype(jnp.int32)
    # band row index of y0 inside this tile's window (may be out of [0, Tband))
    r0 = y0f.astype(jnp.int32) + band_up - t * TILE_H
    return x0, r0, wx, wy


def _build_X(x0, wx, W, dtype):
    """[W_in, W_out] x-interp matrix from iota compares (VPU, no gather)."""
    iow = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
    x0b = x0[None, :]
    return (
        (iow == x0b).astype(dtype) * (1.0 - wx)[None, :]
        + (iow == x0b + 1).astype(dtype) * wx[None, :]
    )


def _build_Y(r0, wy, tband, W, dtype):
    """[Tband, W_out] y-interp indicator weights."""
    ior = jax.lax.broadcasted_iota(jnp.int32, (tband, W), 0)
    r0b = r0[None, :]
    return (
        (ior == r0b).astype(dtype) * (1.0 - wy)[None, :]
        + (ior == r0b + 1).astype(dtype) * wy[None, :]
    )


def _fwd_kernel(
    img_hbm, x_ref, y_ref, out_ref, viol_ref, band, sem,
    *, band_up, band_dn, C, H, W, tband, dot_dtype,
):
    """Grid (B, H/TILE_H): one 8-row output tile per step.

    img_hbm: [B, C, H_pad, W] zero-padded by (band_up, band_dn+1) rows.
    band scratch: [C, Tband, W].  out: [B, C, H, W].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when((b == 0) & (t == 0))
    def _init():
        viol_ref[0, 0] = 0

    # 8-row-aligned DMA: padded rows [8t, 8t + Tband) = original rows
    # [8t - band_up, 8t + TILE_H + band_dn]
    cp = pltpu.make_async_copy(
        img_hbm.at[b, :, pl.ds(8 * t, tband), :], band, sem
    )
    cp.start()
    cp.wait()

    band_flat = band[...].reshape(C * tband, W).astype(dot_dtype)

    def row_body(ii, viol):
        xr = x_ref[0, ii, :]
        yr = y_ref[0, ii, :]
        x0, r0, wx, wy = _row_terms(xr, yr, t, W, band_up)

        X = _build_X(x0, wx, W, dot_dtype)
        G = jax.lax.dot(
            band_flat, X,
            precision=_dot_precision(dot_dtype),
            preferred_element_type=jnp.float32,
        )  # [C*Tband, W]
        Y = _build_Y(r0, wy, tband, W, jnp.float32)
        Gc = G.reshape(C, tband, W)
        out = jnp.sum(Gc * Y[None], axis=1)  # [C, W]
        out_ref[0, :, ii, :] = out

        # violation: an in-image y-corner outside the band window
        y0 = r0 - band_up + t * TILE_H
        v0 = (y0 >= 0) & (y0 <= H - 1) & ((r0 < 0) | (r0 > tband - 1))
        v1 = (y0 + 1 >= 0) & (y0 + 1 <= H - 1) & ((r0 + 1 < 0) | (r0 + 1 > tband - 1))
        return viol | jnp.any(v0 | v1).astype(jnp.int32)

    viol = jax.lax.fori_loop(0, TILE_H, row_body, jnp.int32(0))
    viol_ref[0, 0] = viol_ref[0, 0] | viol


def _bwd_kernel(
    img_hbm, x_ref, y_ref, ct_ref, dx_ref, dy_ref, band, sem,
    *, band_up, band_dn, C, H, W, tband, dot_dtype,
):
    """Coordinate cotangents for one 8-row tile.

    dx[j] = sum_c ct[c,j] * ((v01-v00)(1-wy) + (v11-v10)wy)
          = sum_w dX[w,j] * (1[w==x0+1] - 1[w==x0]),  dX = band^T @ dG
    dy[j] = sum_{c,r} ct[c,j] * G[c,r,j] * (1[r==r0+1] - 1[r==r0])
    with dG[(c,r),j] = Y[r,j] * ct[c,j].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    t = pl.program_id(1)

    cp = pltpu.make_async_copy(
        img_hbm.at[b, :, pl.ds(8 * t, tband), :], band, sem
    )
    cp.start()
    cp.wait()

    band_flat = band[...].reshape(C * tband, W).astype(dot_dtype)

    def row_body(ii, _):
        xr = x_ref[0, ii, :]
        yr = y_ref[0, ii, :]
        ct = ct_ref[0, :, ii, :].astype(jnp.float32)  # [C, W]
        x0, r0, wx, wy = _row_terms(xr, yr, t, W, band_up)

        X = _build_X(x0, wx, W, dot_dtype)
        G = jax.lax.dot(
            band_flat, X,
            precision=_dot_precision(dot_dtype),
            preferred_element_type=jnp.float32,
        )
        Gc = G.reshape(C, tband, W)  # [C, Tband, W]

        iow = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
        ior = jax.lax.broadcasted_iota(jnp.int32, (tband, W), 0)
        x0b = x0[None, :]
        r0b = r0[None, :]

        Y = _build_Y(r0, wy, tband, W, jnp.float32)
        dG = (Y[None] * ct[:, None, :]).reshape(C * tband, W).astype(dot_dtype)
        # dX[w, j] = sum_m band[m, w] * dG[m, j]
        dX = jax.lax.dot_general(
            band_flat, dG,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=_dot_precision(dot_dtype),
            preferred_element_type=jnp.float32,
        )  # [W_in, W_out]
        ddx = ((iow == x0b + 1).astype(jnp.float32) - (iow == x0b).astype(jnp.float32))
        dx = jnp.sum(dX * ddx, axis=0)  # [W]

        ddy = ((ior == r0b + 1).astype(jnp.float32) - (ior == r0b).astype(jnp.float32))
        ct_g = jnp.sum(Gc * ct[:, None, :], axis=0)  # [Tband, W]
        dy = jnp.sum(ct_g * ddy, axis=0)  # [W]

        dx_ref[0, ii, :] = dx
        dy_ref[0, ii, :] = dy
        return 0

    jax.lax.fori_loop(0, TILE_H, row_body, 0)


def _prep_image(image, band_up, band_dn):
    """[B,H,W,C] -> zero-padded channel-first [B, C, H_pad, W]."""
    img_cf = image.transpose(0, 3, 1, 2)
    return jnp.pad(img_cf, ((0, 0), (0, 0), (band_up, band_dn + 1), (0, 0)))


def _call_fwd(image, x, y, band_up, band_dn, dot_dtype, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = image.shape
    tband = _band_geometry(band_up, band_dn)
    img_pad = _prep_image(image, band_up, band_dn)
    kernel = functools.partial(
        _fwd_kernel, band_up=band_up, band_dn=band_dn,
        C=C, H=H, W=W, tband=tband, dot_dtype=dot_dtype,
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    coords_spec = pl.BlockSpec((1, TILE_H, W), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM)
    out, viol = pl.pallas_call(
        kernel,
        grid=(B, H // TILE_H),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            coords_spec,
            coords_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, C, TILE_H, W), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
            # single global violation scalar, OR-accumulated across the
            # (sequential) grid
            pl.BlockSpec((1, 1), lambda b, t: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, C, H, W), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, tband, W), image.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        **kwargs,
    )(img_pad, x, y)
    return out.transpose(0, 2, 3, 1), viol


def _call_bwd_coords(image, x, y, ct, band_up, band_dn, dot_dtype, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = image.shape
    tband = _band_geometry(band_up, band_dn)
    img_pad = _prep_image(image, band_up, band_dn)
    ct_cf = ct.transpose(0, 3, 1, 2)
    kernel = functools.partial(
        _bwd_kernel, band_up=band_up, band_dn=band_dn,
        C=C, H=H, W=W, tband=tband, dot_dtype=dot_dtype,
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    coords_spec = pl.BlockSpec((1, TILE_H, W), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM)
    dx, dy = pl.pallas_call(
        kernel,
        grid=(B, H // TILE_H),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            coords_spec,
            coords_spec,
            pl.BlockSpec((1, C, TILE_H, W), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[coords_spec, coords_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, tband, W), image.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        **kwargs,
    )(img_pad, x, y, ct_cf)
    return dx, dy


def eligible(image, x, y) -> bool:
    """Kernel applicability: a same-resolution warp (coords per output pixel
    of the input plane).  Alignment is NOT required — :func:`warp_banded`
    zero-pads rows to ×8 and lanes to ×128 (padded coords sample at −2.0,
    i.e. produce zeros that are sliced away)."""
    B, H, W, C = image.shape
    return x.shape == (B, H, W) and y.shape == (B, H, W)


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


def _pad_align(image, x, y):
    """Zero-pad (image, x, y) to TPU-aligned [B, H8, W128] shapes."""
    B, H, W, C = image.shape
    Hp, Wp = _ceil_to(H, TILE_H), _ceil_to(W, 128)
    if (Hp, Wp) == (H, W):
        return image, x, y
    image = jnp.pad(image, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    pad_c = ((0, 0), (0, Hp - H), (0, Wp - W))
    # -2.0 is fully outside the image: both corners miss every iota row/col,
    # so padded outputs are exact zeros and never raise the violation flag
    x = jnp.pad(x, pad_c, constant_values=-2.0)
    y = jnp.pad(y, pad_c, constant_values=-2.0)
    return image, x, y


def warp_banded_raw(image, x, y, band_up=24, band_dn=31, dot_dtype=jnp.float32,
                    interpret=False):
    """Kernel forward without the fallback: returns (sampled, viol_any).

    Exact ``resample_bilinear`` semantics whenever ``viol_any == 0``.
    """
    out, viol = _call_fwd(image, x, y, band_up, band_dn, dot_dtype, interpret)
    return out, jnp.any(viol > 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _warp_banded_prim(image, x, y, band_up, band_dn, dot_dtype, interpret):
    out, viol = _call_fwd(image, x, y, band_up, band_dn, dot_dtype, interpret)
    return out, jnp.any(viol > 0)


def _warp_banded_prim_fwd(image, x, y, band_up, band_dn, dot_dtype, interpret):
    out = _warp_banded_prim(image, x, y, band_up, band_dn, dot_dtype, interpret)
    return out, (image, x, y)


def _warp_banded_prim_bwd(band_up, band_dn, dot_dtype, interpret, res, cts):
    image, x, y = res
    ct_out, _ = cts  # the violation flag is non-differentiable
    ct_out = jnp.asarray(ct_out, jnp.float32)
    dx, dy = _call_bwd_coords(
        image, x, y, ct_out, band_up, band_dn, dot_dtype, interpret
    )
    # Image cotangent via the jnp gather-transpose (scatter-add).  In
    # production the warped operand is the constant context frame, so XLA
    # DCEs this entire branch; it exists for correctness/tests.
    from .resample import _resample_bilinear_4gather

    _, vjp_img = jax.vjp(
        lambda im: _resample_bilinear_4gather(im, x, y), image
    )
    (d_image,) = vjp_img(ct_out.astype(image.dtype))
    return d_image, dx, dy


_warp_banded_prim.defvjp(_warp_banded_prim_fwd, _warp_banded_prim_bwd)


def warp_banded(image, x, y, band_up=24, band_dn=31, dot_dtype=jnp.float32,
                interpret=False):
    """Gather-free banded bilinear warp with exact-gather escape hatch.

    Drop-in for ``ops.resample.resample_bilinear`` on same-resolution warps
    (x, y of shape [B, H, W]).  Runs the banded MXU kernel; if any in-image
    sample row falls outside the ``[row - band_up, row + band_dn + 1]``
    window (large vertical displacement — rare for ego-motion warps), a
    ``lax.cond`` recomputes the whole plane with the exact gather path so
    the result is ALWAYS exact, never approximated.
    """
    B, H, W, _ = image.shape
    imgp, xp, yp = _pad_align(image, x, y)
    out, viol_any = _warp_banded_prim(
        imgp, xp, yp, band_up, band_dn, dot_dtype, interpret
    )
    out = out[:, :H, :W].astype(image.dtype)

    # NOT resample_bilinear: that is the router that may route back here
    from .resample import _resample_gather_auto

    return jax.lax.cond(
        viol_any,
        lambda im, xx, yy, _o: _resample_gather_auto(im, xx, yy),
        lambda im, xx, yy, o: o,
        image, x, y, out,
    )
