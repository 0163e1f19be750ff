"""Banded bilinear warp as MXU matmuls (Pallas TPU).

The self-supervised photometric losses warp context frames with
ego-motion-induced coordinates (reference detectron2/geometry/camera.py:196
rides CUDA texture units via ``F.grid_sample``).  On TPU the natural
formulation is a gather, but gathers pay a per-index scalar cost
(docs/PERF.md item 2) and were the measured flagship-step ceiling.  This
kernel removes the gather entirely:

1. **x-interpolation is a tiny-support linear map over the row**, so for an
   output row it can be written as ``band @ X`` where ``X[w, j] =
   (w==x0_j)(1-wx_j) + (w==x0_j+1)wx_j`` is built in VMEM from a 2-D iota
   compare (no gather, no scatter) and the matmul runs on the MXU.
2. **the y-coordinates of one 8-row output tile cluster into at most two
   narrow row ranges** for depth-warp fields: a coherent mid range (the
   warp field is smooth — even at random init, depth≈0.2 m displaces every
   row ~25 px *coherently*), plus border clusters where ``view_synthesis``
   clips off-image projections to rows 0 / H-1 (early training saturates
   both ends inside single tiles — observed as the window128 < window192
   bench anomaly, docs/PERF.md round-2 log).  Each tile therefore DMAs TWO
   half-windows at dynamic 8-aligned offsets — one anchored at its min
   sample row, one at its max — and the y-interpolation is an
   indicator-weighted sum over their union (iota compare again), not an
   index lookup.

Out-of-image corners either land in the zero-pad rows or match no iota
position, reproducing ``padding_mode='zeros'`` exactly with no clamping.
A tile whose in-image sample rows fit neither half-window cannot be
computed (three or more distant clusters / very wide mid spread).  The
cheap jnp-side predicate :func:`_window_violation` detects this BEFORE any
sampling work, and ``warp_banded``'s ``lax.cond`` then runs the same
kernel with a whole-plane window pair (never violable, ~Hpad/window times
the matmul cost) — each step runs exactly ONE kernel, and the gather path
survives only for ``TPU.WARP_IMPL: gather`` / PARITY.STRICT.  (Two earlier
designs lost most of the win here: a static band keyed on absolute
displacement fired at random init, and an in-kernel violation flag made
violating steps pay kernel + gather fallback; both found via xprof
hlo_stats — tools/trace_step.py.)

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
    if window % 16 != 0 or window < 16:
        raise ValueError(
            f"window must be a multiple of 16 (two 8-aligned half-windows), got {window}"
        )


def _build_X(x0, wx, W, dtype):
    """[W_in, W_out] x-interp matrix from iota compares (VPU, no gather)."""
    iow = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
    x0b = x0[None, :]
    return (
        (iow == x0b).astype(dtype) * (1.0 - wx)[None, :]
        + (iow == x0b + 1).astype(dtype) * wx[None, :]
    )


def _pad_geometry(H: int) -> int:
    """Hpad for an H-row (8-aligned) image — mirror of _prep_image."""
    return -(-(H + PAD_TOP + 8) // 8) * 8


def _tile_minmax(yt, H):
    """(min clipped y0, max clipped y0+1) over a tile's [..., W] y values."""
    y0 = jnp.floor(yt)
    ymin = jnp.min(jnp.clip(y0, 0.0, float(H - 1))).astype(jnp.int32)
    ymax = jnp.max(jnp.clip(y0 + 1.0, 0.0, float(H - 1))).astype(jnp.int32)
    return ymin, ymax


def _half_starts(ymin, ymax, Hpad, w):
    """Padded-row starts of the two half-windows (as 8-indices to multiply
    out, keeping DMA alignment provable): window1 anchored at the tile's
    min sample row, window2 ending at/after its max sample row + 1."""
    top = (Hpad - w) // 8
    i1 = jnp.clip((ymin + PAD_TOP) // 8, 0, top)
    i2 = jnp.clip((ymax + 1 + PAD_TOP) // 8 - w // 8 + 1, 0, top)
    return i1, i2


def _map_rows(y0p, s1, s2, w):
    """Padded corner row -> band-local row in [0, 2w), or -1 (no match:
    contributes zero, exactly grid_sample's zeros padding)."""
    in1 = (y0p >= s1) & (y0p < s1 + w)
    in2 = (y0p >= s2) & (y0p < s2 + w)
    return jnp.where(in1, y0p - s1, jnp.where(in2, w + (y0p - s2), -1))


def _window_violation(y, H, Hpad, window):
    """jnp-side predicate: does ANY 8-row tile have an in-image sample row
    outside BOTH of its half-windows?  Evaluated BEFORE the kernel so the
    caller's ``lax.cond`` runs exactly one kernel variant per step.

    Formula-identical to the kernel's placement (:func:`_half_starts`).
    y: [B, H8, W] (8-aligned rows, e.g. the _pad_align output).
    """
    B, Hy, W = y.shape
    w = window // 2
    y0 = jnp.floor(y).reshape(B, Hy // TILE_H, TILE_H, W)
    y0c = jnp.clip(y0, 0.0, float(H - 1))
    y1c = jnp.clip(y0 + 1.0, 0.0, float(H - 1))
    ymin = jnp.min(y0c, axis=(2, 3)).astype(jnp.int32)
    ymax = jnp.max(y1c, axis=(2, 3)).astype(jnp.int32)
    i1, i2 = _half_starts(ymin, ymax, Hpad, w)
    s1, s2 = (8 * i1)[:, :, None, None], (8 * i2)[:, :, None, None]

    def outside(c):
        p = c.astype(jnp.int32) + PAD_TOP
        in1 = (p >= s1) & (p < s1 + w)
        in2 = (p >= s2) & (p < s2 + w)
        in_img = (c >= 0) & (c <= H - 1)
        return in_img & ~(in1 | in2)

    return jnp.any(outside(y0) | outside(y0 + 1.0))


def never_violating_window(H: int) -> int:
    """Smallest valid window whose two half-windows always cover the whole
    padded plane (w1 + w2 >= Hpad with min/max anchoring ⇒ no violation
    possible)."""
    Hpad = _pad_geometry(H)
    return -(-Hpad // 16) * 16


def _row_terms(xr, yr, s1, s2, w, f32=jnp.float32):
    """Shared fwd/bwd per-row index math: weights, anchors, band rows."""
    x0f = jnp.floor(xr)
    y0f = jnp.floor(yr)
    wx = (xr - x0f).astype(f32)
    wy = (yr - y0f).astype(f32)
    x0 = x0f.astype(jnp.int32)
    y0p = y0f.astype(jnp.int32) + PAD_TOP
    t0 = _map_rows(y0p, s1, s2, w)
    t1 = _map_rows(y0p + 1, s1, s2, w)
    return x0, t0, t1, wx, wy


def _build_Y(t0, t1, wy, window, W, dtype):
    """[window, W_out] y-interp indicator weights over the window union."""
    ior = jax.lax.broadcasted_iota(jnp.int32, (window, W), 0)
    return (
        (ior == t0[None, :]).astype(dtype) * (1.0 - wy)[None, :]
        + (ior == t1[None, :]).astype(dtype) * wy[None, :]
    )


def _start_band_dma(img_hbm, y_ref, band, sem1, sem2, b, H, Hpad, w):
    """Compute the two half-window starts and kick off both DMAs."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ymin, ymax = _tile_minmax(y_ref[0], H)
    i1, i2 = _half_starts(ymin, ymax, Hpad, w)
    s1, s2 = 8 * i1, 8 * i2  # written as 8*idx: provably aligned DMA offsets
    cp1 = pltpu.make_async_copy(
        img_hbm.at[b, :, pl.ds(s1, w), :], band.at[:, 0:w, :], sem1
    )
    cp2 = pltpu.make_async_copy(
        img_hbm.at[b, :, pl.ds(s2, w), :], band.at[:, w : 2 * w, :], sem2
    )
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()
    return s1, s2


def _fwd_kernel(
    img_hbm, x_ref, y_ref, out_ref, band, sem1, sem2,
    *, C, H, W, Hpad, window, dot_dtype,
):
    """Grid (B, H/TILE_H): one 8-row output tile per step.

    img_hbm: [B, C, Hpad, W] zero-padded by (PAD_TOP, Hpad-H-PAD_TOP) rows.
    band scratch: [C, window, W] = the two stacked half-windows.
    out: [B, C, H, W].  The caller guarantees (via the jnp-side
    :func:`_window_violation` pre-check) every tile fits its windows.
    """
    from jax.experimental import pallas as pl

    b = pl.program_id(0)

    w = window // 2
    s1, s2 = _start_band_dma(img_hbm, y_ref, band, sem1, sem2, b, H, Hpad, w)
    band_flat = band[...].reshape(C * window, W).astype(dot_dtype)

    def row_body(ii, _):
        xr = x_ref[0, ii, :]
        yr = y_ref[0, ii, :]
        x0, t0, t1, wx, wy = _row_terms(xr, yr, s1, s2, w)

        X = _build_X(x0, wx, W, dot_dtype)
        G = jax.lax.dot(
            band_flat, X,
            precision=_dot_precision(dot_dtype),
            preferred_element_type=jnp.float32,
        )  # [C*window, W]
        Y = _build_Y(t0, t1, wy, window, W, jnp.float32)
        Gc = G.reshape(C, window, W)
        out_ref[0, :, ii, :] = jnp.sum(Gc * Y[None], axis=1)  # [C, W]
        return 0

    jax.lax.fori_loop(0, TILE_H, row_body, 0)


def _bwd_kernel(
    img_hbm, x_ref, y_ref, ct_ref, dx_ref, dy_ref, band, sem1, sem2,
    *, C, H, W, Hpad, window, dot_dtype,
):
    """Coordinate cotangents for one 8-row tile.

    dx[j] = sum_c ct[c,j] * ((v01-v00)(1-wy) + (v11-v10)wy)
          = sum_w dX[w,j] * (1[w==x0+1] - 1[w==x0]),  dX = band^T @ dG
    dy[j] = sum_{c,r} ct[c,j] * G[c,r,j] * (1[r==t1] - 1[r==t0])
    with dG[(c,r),j] = Y[r,j] * ct[c,j].
    """
    from jax.experimental import pallas as pl

    b = pl.program_id(0)

    w = window // 2
    s1, s2 = _start_band_dma(img_hbm, y_ref, band, sem1, sem2, b, H, Hpad, w)
    band_flat = band[...].reshape(C * window, W).astype(dot_dtype)

    def row_body(ii, _):
        xr = x_ref[0, ii, :]
        yr = y_ref[0, ii, :]
        ct = ct_ref[0, :, ii, :].astype(jnp.float32)  # [C, W]
        x0, t0, t1, wx, wy = _row_terms(xr, yr, s1, s2, w)

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

        Y = _build_Y(t0, t1, wy, window, W, jnp.float32)
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

        ddy = ((ior == t1[None, :]).astype(jnp.float32)
               - (ior == t0[None, :]).astype(jnp.float32))
        ct_g = jnp.sum(Gc * ct[:, None, :], axis=0)  # [window, W]
        dy = jnp.sum(ct_g * ddy, axis=0)  # [W]

        dx_ref[0, ii, :] = dx
        dy_ref[0, ii, :] = dy
        return 0

    jax.lax.fori_loop(0, TILE_H, row_body, 0)


def _prep_image(image, window):
    """[B,H,W,C] -> zero-padded channel-first [B, C, Hpad, W]."""
    B, H, W, C = image.shape
    Hpad = max(_pad_geometry(H), window // 2)
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


def warp_banded_raw(image, x, y, window=128, dot_dtype=jnp.float32,
                    interpret=False):
    """Kernel forward without the wide-window escape: returns
    (sampled, viol_any).

    ``viol_any`` is the jnp-side :func:`_window_violation` predicate; the
    sampled output has exact ``resample_bilinear`` semantics whenever it is
    False.  Requires aligned shapes (H % 8; W % 128 on hardware).
    """
    B, H, W, _ = image.shape
    out = _call_fwd(image, x, y, window, dot_dtype, interpret)
    Hpad = max(_pad_geometry(H), window // 2)
    viol = _window_violation(y, H, Hpad, window)
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


def warp_banded(image, x, y, window=128, dot_dtype=jnp.float32,
                interpret=False):
    """Gather-free banded bilinear warp, always exact.

    Drop-in for ``ops.resample.resample_bilinear`` on same-resolution warps
    (x, y of shape [B, H, W]).  The jnp-side spread predicate
    (:func:`_window_violation`, ~1 ms) decides BEFORE any sampling work
    whether every 8-row tile's in-image sample rows fit its two
    half-windows; the ``lax.cond`` then runs the kernel either with the
    fast ``window`` or with the whole-plane window pair (never violable,
    proportionally costlier matmuls) — exactly one kernel per step, no
    gather anywhere.
    """
    B, H, W, _ = image.shape
    imgp, xp, yp = _pad_align(image, x, y)
    Hp = imgp.shape[1]
    wide = never_violating_window(Hp)
    window = min(window, wide)
    Hpad = max(_pad_geometry(Hp), window // 2)
    viol_any = _window_violation(yp, Hp, Hpad, window)

    def _fast(imp, xxp, yyp):
        out = _warp_banded_prim(imp, xxp, yyp, window, dot_dtype, interpret)
        return out[:, :H, :W].astype(image.dtype)

    def _wide(imp, xxp, yyp):
        out = _warp_banded_prim(imp, xxp, yyp, wide, dot_dtype, interpret)
        return out[:, :H, :W].astype(image.dtype)

    if window == wide:
        return _fast(imgp, xp, yp)
    return jax.lax.cond(viol_any, _wide, _fast, imgp, xp, yp)
