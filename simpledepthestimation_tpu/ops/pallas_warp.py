"""Banded bilinear warp as MXU matmuls (Pallas TPU).

The self-supervised photometric losses warp context frames with
ego-motion-induced coordinates (reference detectron2/geometry/camera.py:196
rides CUDA texture units via ``F.grid_sample``).  On TPU the natural
formulation is a gather, but gathers pay a per-index scalar cost
(docs/PERF.md item 2) and were the measured flagship-step ceiling.  This
kernel removes the gather entirely by exploiting two structural facts:

1. **x-interpolation is a tiny-support linear map over the row**, so for an
   output row it can be written as ``band @ X`` where ``X[w, j] =
   (w==x0_j)(1-wx_j) + (w==x0_j+1)wx_j`` is built in VMEM from a 2-D iota
   compare (no gather, no scatter) and the matmul runs on the MXU.
2. **the y-coordinates of one 8-row output tile span a narrow window of
   input rows** for depth-warp fields (the field is smooth: displacement
   f·t_y/Z varies slowly within 8 consecutive rows, even when its absolute
   magnitude is large — e.g. at random init, depth is near-constant ≈0.2 m
   and every pixel displaces ~25 rows *coherently*).  Each tile therefore
   computes its own window start from min/max of its in-image sample rows
   and DMAs a STATIC-size window at that DYNAMIC (8-aligned) offset — the
   same halo-DMA pattern as ops/pallas_photometric.py.  The y-interpolation
   is an indicator-weighted sum over the window (iota compare again), not
   an index lookup.

Out-of-image corners either land in the zero-pad rows or match no iota
position, reproducing ``padding_mode='zeros'`` exactly with no clamping.
A tile whose in-image sample rows SPREAD wider than the window cannot be
computed; the cheap jnp-side predicate :func:`_window_violation` detects
this BEFORE any sampling work, and ``warp_banded``'s ``lax.cond`` then
runs either the kernel or the exact gather path (ops/resample.py) — never
both (two earlier designs lost the whole win here: a static band keyed on
absolute displacement fired at random init where depth≈0.2 m displaces
every row ~25 px, and an in-kernel violation flag meant violating steps
paid kernel + fallback; see docs/PERF.md round-2 log).  With window=64 the
spread budget is ~55 rows per 8-row tile — violated only by transient
early-training chaos, not by converged depth/ego-motion warps.

Forward and the coordinate backward (the production gradient — the warped
operand is usually the constant context frame) are Pallas kernels; the
image cotangent is produced by the jnp gather-transpose and DCE'd by XLA
when unused.

bf16 ``dot_dtype`` (the default used by the resample router) keeps the
one-hot structure exact and rounds only interp weights and image values:
max abs error ~4e-3 on [0,1) images = the uint8 quantization step of the
source frames, and below the bf16 compute policy of the surrounding step.
``banded_f32`` (3-pass f32 matmuls) is exact to ~2e-7 for strict parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

TILE_H = 8
PAD_TOP = 8  # zero rows above the image so y0 = -1 lands on a zero row


def _dot_precision(dot_dtype):
    # f32 one-hot matmuls must not be silently demoted to one-pass bf16
    return (
        jax.lax.Precision.HIGHEST
        if dot_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _check_window(window: int) -> None:
    if window % 8 != 0 or window < 2 * TILE_H:
        raise ValueError(f"window must be a multiple of 8 and >= 16, got {window}")


def _build_X(x0, wx, W, dtype):
    """[W_in, W_out] x-interp matrix from iota compares (VPU, no gather)."""
    iow = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
    x0b = x0[None, :]
    return (
        (iow == x0b).astype(dtype) * (1.0 - wx)[None, :]
        + (iow == x0b + 1).astype(dtype) * wx[None, :]
    )


def _build_Y(r0, wy, window, W, dtype):
    """[window, W_out] y-interp indicator weights."""
    ior = jax.lax.broadcasted_iota(jnp.int32, (window, W), 0)
    r0b = r0[None, :]
    return (
        (ior == r0b).astype(dtype) * (1.0 - wy)[None, :]
        + (ior == r0b + 1).astype(dtype) * wy[None, :]
    )


def _window_start(y_ref, H, Hpad, window):
    """Per-tile dynamic window: 8-aligned padded-row start covering the
    in-image sample rows (min-anchored).

    Only in-image corners drive the placement, so wildly out-of-image
    coordinates (which contribute zeros regardless) cannot skew the window.
    MUST stay formula-identical to :func:`_window_violation`, the jnp-side
    predicate the caller checks BEFORE invoking the kernel."""
    yt = y_ref[0]  # [TILE_H, W] f32
    y0c = jnp.clip(jnp.floor(yt), 0.0, float(H - 1))
    ymin = jnp.min(y0c).astype(jnp.int32)
    return jnp.clip((ymin + PAD_TOP) // 8, 0, (Hpad - window) // 8)


def _pad_geometry(H: int) -> int:
    """Hpad for an H-row (8-aligned) image — mirror of _prep_image."""
    return -(-(H + PAD_TOP + 8) // 8) * 8


def _window_violation(y, H, Hpad, window):
    """jnp-side predicate: does ANY 8-row tile's in-image sample-row range
    exceed the kernel window?  Evaluated BEFORE the kernel so the caller's
    ``lax.cond`` runs EITHER the exact gather OR the banded kernel — never
    both (an earlier design had the kernel itself report violations, which
    meant every violating step paid kernel + fallback).

    Formula-identical to the kernel's :func:`_window_start` placement.
    y: [B, H8, W] (8-aligned rows, e.g. the _pad_align output).
    """
    B, Hy, W = y.shape
    y0 = jnp.floor(y)
    y0c = jnp.clip(y0, 0.0, float(H - 1)).reshape(B, Hy // TILE_H, TILE_H, W)
    y1c = jnp.clip(y0 + 1.0, 0.0, float(H - 1)).reshape(B, Hy // TILE_H, TILE_H, W)
    ymin = jnp.min(y0c, axis=(2, 3)).astype(jnp.int32)
    ymax = jnp.max(y1c, axis=(2, 3)).astype(jnp.int32)
    idx = jnp.clip((ymin + PAD_TOP) // 8, 0, (Hpad - window) // 8)
    return jnp.any(ymax + PAD_TOP - 8 * idx > window - 1)


def _row_terms(xr, yr, start, f32=jnp.float32):
    """Shared fwd/bwd per-row index math: weights, anchors, window rows."""
    x0f = jnp.floor(xr)
    y0f = jnp.floor(yr)
    wx = (xr - x0f).astype(f32)
    wy = (yr - y0f).astype(f32)
    x0 = x0f.astype(jnp.int32)
    # window-local row of y0 (may be out of [0, window) for OOB corners)
    r0 = y0f.astype(jnp.int32) + PAD_TOP - start
    return x0, r0, wx, wy


def _fwd_kernel(
    img_hbm, x_ref, y_ref, out_ref, band, sem,
    *, C, H, W, Hpad, window, dot_dtype,
):
    """Grid (B, H/TILE_H): one 8-row output tile per step.

    img_hbm: [B, C, Hpad, W] zero-padded by (PAD_TOP, Hpad-H-PAD_TOP) rows.
    band scratch: [C, window, W].  out: [B, C, H, W].

    The caller guarantees (via the jnp-side :func:`_window_violation`
    pre-check) that every tile's in-image rows fit the window.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    t = pl.program_id(1)

    idx = _window_start(y_ref, H, Hpad, window)
    start = 8 * idx  # written as 8*idx so the DMA offset is provably aligned
    cp = pltpu.make_async_copy(
        img_hbm.at[b, :, pl.ds(start, window), :], band, sem
    )
    cp.start()
    cp.wait()

    band_flat = band[...].reshape(C * window, W).astype(dot_dtype)

    def row_body(ii, _):
        xr = x_ref[0, ii, :]
        yr = y_ref[0, ii, :]
        x0, r0, wx, wy = _row_terms(xr, yr, start)

        X = _build_X(x0, wx, W, dot_dtype)
        G = jax.lax.dot(
            band_flat, X,
            precision=_dot_precision(dot_dtype),
            preferred_element_type=jnp.float32,
        )  # [C*window, W]
        Y = _build_Y(r0, wy, window, W, jnp.float32)
        Gc = G.reshape(C, window, W)
        out_ref[0, :, ii, :] = jnp.sum(Gc * Y[None], axis=1)  # [C, W]
        return 0

    jax.lax.fori_loop(0, TILE_H, row_body, 0)


def _bwd_kernel(
    img_hbm, x_ref, y_ref, ct_ref, dx_ref, dy_ref, band, sem,
    *, C, H, W, Hpad, window, dot_dtype,
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

    idx = _window_start(y_ref, H, Hpad, window)
    start = 8 * idx
    cp = pltpu.make_async_copy(
        img_hbm.at[b, :, pl.ds(start, window), :], band, sem
    )
    cp.start()
    cp.wait()

    band_flat = band[...].reshape(C * window, W).astype(dot_dtype)

    def row_body(ii, _):
        xr = x_ref[0, ii, :]
        yr = y_ref[0, ii, :]
        ct = ct_ref[0, :, ii, :].astype(jnp.float32)  # [C, W]
        x0, r0, wx, wy = _row_terms(xr, yr, start)

        X = _build_X(x0, wx, W, dot_dtype)
        G = jax.lax.dot(
            band_flat, X,
            precision=_dot_precision(dot_dtype),
            preferred_element_type=jnp.float32,
        )
        Gc = G.reshape(C, window, W)

        iow = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
        ior = jax.lax.broadcasted_iota(jnp.int32, (window, W), 0)
        x0b = x0[None, :]
        r0b = r0[None, :]

        Y = _build_Y(r0, wy, window, W, jnp.float32)
        dG = (Y[None] * ct[:, None, :]).reshape(C * window, W).astype(dot_dtype)
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
        ct_g = jnp.sum(Gc * ct[:, None, :], axis=0)  # [window, W]
        dy = jnp.sum(ct_g * ddy, axis=0)  # [W]

        dx_ref[0, ii, :] = dx
        dy_ref[0, ii, :] = dy
        return 0

    jax.lax.fori_loop(0, TILE_H, row_body, 0)


def _prep_image(image, window):
    """[B,H,W,C] -> zero-padded channel-first [B, C, Hpad, W].

    Hpad: PAD_TOP zero rows above (absorbing y0 = -1 .. -PAD_TOP), >= 8
    below (absorbing y0+1 = H), rounded so Hpad % 8 == 0 and Hpad >= window
    (the clamped dynamic window must always fit)."""
    B, H, W, C = image.shape
    Hpad = max(_pad_geometry(H), window)
    img_cf = image.transpose(0, 3, 1, 2)
    return jnp.pad(
        img_cf, ((0, 0), (0, 0), (PAD_TOP, Hpad - H - PAD_TOP), (0, 0))
    ), Hpad


def _call_fwd(image, x, y, window, dot_dtype, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = image.shape
    _check_window(window)
    img_pad, Hpad = _prep_image(image, window)
    kernel = functools.partial(
        _fwd_kernel, C=C, H=H, W=W, Hpad=Hpad, window=window, dot_dtype=dot_dtype,
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    coords_spec = pl.BlockSpec((1, TILE_H, W), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, H // TILE_H),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            coords_spec,
            coords_spec,
        ],
        out_specs=pl.BlockSpec((1, C, TILE_H, W), lambda b, t: (b, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, window, W), image.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        **kwargs,
    )(img_pad, x, y)
    return out.transpose(0, 2, 3, 1)


def _call_bwd_coords(image, x, y, ct, window, dot_dtype, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = image.shape
    _check_window(window)
    img_pad, Hpad = _prep_image(image, window)
    ct_cf = ct.transpose(0, 3, 1, 2)
    kernel = functools.partial(
        _bwd_kernel, C=C, H=H, W=W, Hpad=Hpad, window=window, dot_dtype=dot_dtype,
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
            pltpu.VMEM((C, window, W), image.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        **kwargs,
    )(img_pad, x, y, ct_cf)
    return dx, dy


def eligible(image, x, y) -> bool:
    """Kernel applicability: a same-resolution warp (coords per output pixel
    of the input plane).  Alignment is NOT required — :func:`warp_banded`
    zero-pads rows to ×8 and lanes to ×128."""
    B, H, W, C = image.shape
    return x.shape == (B, H, W) and y.shape == (B, H, W)


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


def _pad_align(image, x, y):
    """Zero-pad (image, x, y) to TPU-aligned [B, H8, W128] shapes.

    x pads with -2.0 (fully outside: both corners miss every iota column,
    so padded outputs are exact zeros).  y pads EDGE-replicated so padded
    pixels' rows track their tile's real rows and cannot skew the dynamic
    window placement."""
    B, H, W, C = image.shape
    Hp, Wp = _ceil_to(H, TILE_H), _ceil_to(W, 128)
    if (Hp, Wp) == (H, W):
        return image, x, y
    image = jnp.pad(image, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    pad_c = ((0, 0), (0, Hp - H), (0, Wp - W))
    x = jnp.pad(x, pad_c, constant_values=-2.0)
    y = jnp.pad(y, pad_c, mode="edge")
    return image, x, y


def warp_banded_raw(image, x, y, window=64, dot_dtype=jnp.float32,
                    interpret=False):
    """Kernel forward without the fallback: returns (sampled, viol_any).

    ``viol_any`` is the jnp-side :func:`_window_violation` predicate; the
    sampled output has exact ``resample_bilinear`` semantics whenever it is
    False.  Requires aligned shapes (H % 8; W % 128 on hardware).
    """
    B, H, W, _ = image.shape
    out = _call_fwd(image, x, y, window, dot_dtype, interpret)
    viol = _window_violation(y, H, max(_pad_geometry(H), window), window)
    return out, viol


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _warp_banded_prim(image, x, y, window, dot_dtype, interpret):
    return _call_fwd(image, x, y, window, dot_dtype, interpret)


def _warp_banded_prim_fwd(image, x, y, window, dot_dtype, interpret):
    out = _warp_banded_prim(image, x, y, window, dot_dtype, interpret)
    return out, (image, x, y)


def _warp_banded_prim_bwd(window, dot_dtype, interpret, res, ct_out):
    image, x, y = res
    ct_out = jnp.asarray(ct_out, jnp.float32)
    dx, dy = _call_bwd_coords(image, x, y, ct_out, window, dot_dtype, interpret)
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


def warp_banded(image, x, y, window=64, dot_dtype=jnp.float32,
                interpret=False):
    """Gather-free banded bilinear warp with exact-gather escape hatch.

    Drop-in for ``ops.resample.resample_bilinear`` on same-resolution warps
    (x, y of shape [B, H, W]).  The jnp-side spread predicate
    (:func:`_window_violation`, ~1 ms) decides BEFORE any sampling work
    whether every 8-row tile's in-image sample rows fit the window; the
    ``lax.cond`` then runs EITHER the banded kernel OR the exact gather —
    never both — so the result is always exact and a violating step costs
    exactly the gather formulation, not kernel + gather.  Violations mean
    extreme vertical shear (> ~window-9 rows of spread inside one 8-row
    tile): transiently possible in early training when the depth map is
    still chaotic, not produced by converged depth/ego-motion warps.
    """
    B, H, W, _ = image.shape
    imgp, xp, yp = _pad_align(image, x, y)
    Hp = imgp.shape[1]
    viol_any = _window_violation(
        yp, Hp, max(_pad_geometry(Hp), window), window
    )

    def _banded(im, xx, yy, imp, xxp, yyp):
        out = _warp_banded_prim(imp, xxp, yyp, window, dot_dtype, interpret)
        return out[:, :H, :W].astype(im.dtype)

    def _gather(im, xx, yy, imp, xxp, yyp):
        # NOT resample_bilinear: that is the router that may route back here
        from .resample import _resample_gather_auto

        return _resample_gather_auto(im, xx, yy)

    return jax.lax.cond(viol_any, _gather, _banded, image, x, y, imgp, xp, yp)
