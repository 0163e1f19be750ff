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

**Round 3 — the production path is the TILE-GRANULAR COLUMN-TILED kernel**
(``_tiled_fwd_kernel``/``_tiled_bwd_kernel``, W ≥ V2_MIN_W): xprof showed
the v1 kernel MXU-FLOP-bound with the x-interp matmul running over the
FULL row ([C·window, W] @ [W, W] per output row) — yet x-displacement is
just as coherent as y.  v2 bands BOTH dims: grid (B, H/tile_h, W/128)
(tile_h threaded from ``warp_banded(tile_h=...)``, default ``V2_TILE_H``),
two 128-aligned x half-windows (``xwin``) and two 8-aligned y half-windows
(``ywin``) per tile, and ALL tile_h rows of a tile in ONE dot
``[C·ywin, xwin] @ [xwin, tile_h·128]``.  Tiles whose corner spread exceeds the
windows are flagged by the jnp-side per-tile predicate
(:func:`_tile_violations_v2`) and take an in-kernel ``pl.when`` branch
with a whole-plane window pair instead (never violable) — the fallback is
PER TILE, not per call: at random init the depth net outputs ~0.2 m,
displacements reach ~170 px, and the round-2 whole-call predicate sent
EVERY bench step to the wide kernel (found via xprof: the round-2 'fast
window' sweep had been measuring the wide branch all along).  Measured at
[96,192,640] on v5e (real in-step coords): fwd+grad 166 ms (v1 wide) →
107 ms (tiled, ywin 96 / xwin 512).  The v1 row-banded kernel remains the
route for planes narrower than V2_MIN_W (its whole-row matmul beats v2's
512-wide windows there) and for ablation via ``TPU.WARP_XWIN: 0``; the
gather path survives only for ``TPU.WARP_IMPL: gather`` / PARITY.STRICT.
(History of designs that lost, all found via xprof hlo_stats /
tools/trace_step.py: a static band keyed on absolute displacement fired at
random init; an in-kernel violation flag made violating steps pay kernel +
fallback; a separate patch-kernel pass spent ~30 ms/step streaming coords
through a mostly-skipped second grid; an xwin of 256 flagged every tile
whose displacement straddles 0 — two 128-wide halves at 128-aligned starts
cannot cover a 128-col tile plus bidirectional spread.)

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
TILE_W = 128  # v2 output-column tile (one lane group)
# Default v2/tiled-path output tile height (multiple of 8: row starts stay
# 8·idx aligned).  16 doubles the per-dot output width [.., 2048] and halves
# the per-tile fixed overhead (DMA issue, minmax, window logic) at the cost
# of a tighter y-spread budget per tile (the tile spans 8 more rows).  The
# actual height is threaded through ``warp_banded(tile_h=...)`` — this
# constant is only the default, never mutated (a mutable global would bake
# stale values into already-traced functions).  v1 row kernels stay at
# TILE_H.
V2_TILE_H = 8
# Below this image width the v2 column windows can't undercut the v1
# whole-row matmul (xwin 512 vs W plus per-tile overhead): measured at the
# flagship's 320-wide scale-1 plane, v1-wide 21 ms vs v2 30 ms per step.
V2_MIN_W = 512
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


def _col_half_starts(xmin, xmax, W, xw2):
    """128-aligned starts of the two x half-windows (v2 column tiling):
    window1 anchored at the tile's min sample column, window2 the lowest
    aligned start whose window still contains the max sample column.  The
    ceil form matters here (unlike :func:`_half_starts`'s floor form):
    lane starts are 128-aligned while xw2 is itself only ~1-2 lane groups,
    so a floor-anchored window2 could exclude xmax entirely."""
    topx = (W - xw2) // TILE_W
    i1 = jnp.clip(xmin // TILE_W, 0, topx)
    i2 = jnp.clip((xmax + 1 - xw2 + TILE_W - 1) // TILE_W, 0, topx)
    return i1, i2


def _tile_violations_v2(x, y, H, W, Hpad, ywin, xwin, tile_h=V2_TILE_H):
    """jnp-side PER-TILE flags for the column-tiled kernel: tile (b, th, tw)
    is flagged when some corner with BOTH coordinates in-image has its row
    outside both y half-windows or its column outside both x half-windows.
    Returns [B, H/tile_h, W/128] bool (tile_h defaults to V2_TILE_H).

    Formula-identical to the v2 kernels' window placement
    (:func:`_half_starts` / :func:`_col_half_starts`).  Flagged tiles are
    recomputed by the whole-plane patch kernel and merged per tile — the
    fallback is tile-granular, so one wild tile no longer sends the whole
    call to the wide kernel (the round-2 design's cliff: at random init the
    depth net outputs ~0.2 m, displacements reach ~170 px, and EVERY step
    of the flagship bench ran the wide kernel)."""
    B, Hy, Wx = x.shape
    wy2, xw2 = ywin // 2, xwin // 2
    nh, nw = Hy // tile_h, Wx // TILE_W
    x0 = jnp.floor(x).reshape(B, nh, tile_h, nw, TILE_W)
    y0 = jnp.floor(y).reshape(B, nh, tile_h, nw, TILE_W)

    ymin = jnp.min(jnp.clip(y0, 0.0, float(H - 1)), axis=(2, 4)).astype(jnp.int32)
    ymax = jnp.max(jnp.clip(y0 + 1.0, 0.0, float(H - 1)), axis=(2, 4)).astype(jnp.int32)
    i1y, i2y = _half_starts(ymin, ymax, Hpad, wy2)
    s1y = (8 * i1y)[:, :, None, :, None]
    s2y = (8 * i2y)[:, :, None, :, None]

    xmin = jnp.min(jnp.clip(x0, 0.0, float(W - 1)), axis=(2, 4)).astype(jnp.int32)
    xmax = jnp.max(jnp.clip(x0 + 1.0, 0.0, float(W - 1)), axis=(2, 4)).astype(jnp.int32)
    i1x, i2x = _col_half_starts(xmin, xmax, W, xw2)
    s1x = (TILE_W * i1x)[:, :, None, :, None]
    s2x = (TILE_W * i2x)[:, :, None, :, None]

    def y_unmapped(cy):
        p = cy.astype(jnp.int32) + PAD_TOP
        return ~(((p >= s1y) & (p < s1y + wy2)) | ((p >= s2y) & (p < s2y + wy2)))

    def x_unmapped(cx):
        c = cx.astype(jnp.int32)
        return ~(((c >= s1x) & (c < s1x + xw2)) | ((c >= s2x) & (c < s2x + xw2)))

    bad_y = [((cy >= 0) & (cy <= H - 1), y_unmapped(cy)) for cy in (y0, y0 + 1.0)]
    viol = jnp.zeros((B, nh, tile_h, nw, TILE_W), bool)
    for cx in (x0, x0 + 1.0):
        in_x = (cx >= 0) & (cx <= W - 1)
        ux = x_unmapped(cx)
        for in_y, uy in bad_y:
            viol |= in_x & in_y & (ux | uy)
    return jnp.any(viol, axis=(2, 4))


def _window_violation_v2(x, y, H, W, Hpad, ywin, xwin):
    """Whole-call reduction of :func:`_tile_violations_v2` (tests)."""
    return jnp.any(_tile_violations_v2(x, y, H, W, Hpad, ywin, xwin))


def _patch_windows(Hpad, W):
    """Static whole-plane window pair per dim for the patch kernel: two y
    halves covering all Hpad rows, two x halves covering all W columns —
    never violable, any corner maps."""
    wy2 = _ceil_to(-(-Hpad // 2), 8)
    xw2 = _ceil_to(-(-W // 2), TILE_W)
    return wy2, xw2


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

    With out[c,j] = Σ_r Σ_w band[c·r,w] · X[w,j] · Y[r,j] and the a.e.
    derivatives ∂X/∂x = Xd[w,j] = 1[w==x0+1] − 1[w==x0],
    ∂Y/∂y = Yd[r,j] = 1[r==t1] − 1[r==t0]:

        dx[j] = Σ_c ct[c,j] · Σ_r Y[r,j]  · (band @ Xd)[c·r, j]
        dy[j] = Σ_c ct[c,j] · Σ_r Yd[r,j] · (band @ X )[c·r, j]

    Both matmuls share the stationary band LHS, so they run as ONE MXU dot
    ``band @ [X | Xd]`` ([C·window, 2W]); the rest is narrow [C, window, W]
    indicator-weighted reductions.  (An earlier formulation materialized
    the [W, W] dX = bandᵀ @ (Y·ct) via a second separately-dispatched
    dot_general and contracted it against a [W, W] iota-built ddx — ~4× the
    VPU work, yet xprof measures both at 2.0× the forward: the kernel is
    MXU-FLOP-bound, which is why the column-tiled v2 attacks the FLOP count
    itself.  This form is kept as the simpler/equal-speed one.)
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

        iow = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
        x0b = x0[None, :]
        hi = (iow == x0b + 1).astype(dot_dtype)
        lo = (iow == x0b).astype(dot_dtype)
        X = lo * (1.0 - wx.astype(dot_dtype))[None, :] + hi * wx.astype(dot_dtype)[None, :]
        Xd = hi - lo
        GG = jax.lax.dot(
            band_flat,
            jnp.concatenate([X, Xd], axis=1),  # [W, 2W]
            precision=_dot_precision(dot_dtype),
            preferred_element_type=jnp.float32,
        )  # [C*window, 2W]
        GG = GG.reshape(C, window, 2 * W)
        Gc, G2c = GG[..., :W], GG[..., W:]

        ior = jax.lax.broadcasted_iota(jnp.int32, (window, W), 0)
        rhi = (ior == t1[None, :]).astype(jnp.float32)
        rlo = (ior == t0[None, :]).astype(jnp.float32)
        Y = rlo * (1.0 - wy)[None, :] + rhi * wy[None, :]
        Yd = rhi - rlo

        dx = jnp.sum(jnp.sum(G2c * Y[None], axis=1) * ct, axis=0)  # [W]
        dy = jnp.sum(jnp.sum(Gc * Yd[None], axis=1) * ct, axis=0)  # [W]

        dx_ref[0, ii, :] = dx
        dy_ref[0, ii, :] = dy
        return 0

    jax.lax.fori_loop(0, TILE_H, row_body, 0)


def _quad_dma(img_hbm, band, sems, b, s1y, s2y, s1x, s2x, wy2, xw2):
    """Start four quadrant DMAs into the [C, 2·wy2, 2·xw2] band scratch from
    the given (row, column) half-window starts; returns the in-flight copies
    so the caller can overlap the VPU indicator build with the transfer and
    wait only at the first band read."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    copies = []
    for qi, (sy, oy) in enumerate(((s1y, 0), (s2y, wy2))):
        for qj, (sx, ox) in enumerate(((s1x, 0), (s2x, xw2))):
            cp = pltpu.make_async_copy(
                img_hbm.at[b, :, pl.ds(sy, wy2), pl.ds(sx, xw2)],
                band.at[:, oy : oy + wy2, ox : ox + xw2],
                sems[2 * qi + qj],
            )
            cp.start()
            copies.append(cp)
    return copies


def _quad_band_dma(img_hbm, x_ref, y_ref, band, sems, b, H, W, Hpad, wy2, xw2):
    """v2: dynamic window starts in BOTH dims + the four quadrant DMAs
    (started, not waited — see :func:`_quad_dma`).  Row starts are 8·idx,
    column starts TILE_W·idx — both provably aligned for Mosaic's DMA
    divisibility analysis."""
    ymin, ymax = _tile_minmax(y_ref[0], H)
    i1y, i2y = _half_starts(ymin, ymax, Hpad, wy2)
    s1y, s2y = 8 * i1y, 8 * i2y
    xmin, xmax = _tile_minmax(x_ref[0], W)
    i1x, i2x = _col_half_starts(xmin, xmax, W, xw2)
    s1x, s2x = TILE_W * i1x, TILE_W * i2x
    copies = _quad_dma(img_hbm, band, sems, b, s1y, s2y, s1x, s2x, wy2, xw2)
    return s1y, s2y, s1x, s2x, copies


def _tile_terms_v2(x_ref, y_ref, s1y, s2y, s1x, s2x, wy2, xw2):
    """Flattened [tile_h·TILE_W] per-pixel index math for one v2 tile (the
    tile height is read off the coord block shape, so the kernels follow
    whatever ``tile_h`` the wrapper threaded through)."""
    N = x_ref.shape[1] * x_ref.shape[2]
    xr = x_ref[0].reshape(N)
    yr = y_ref[0].reshape(N)
    x0f = jnp.floor(xr)
    y0f = jnp.floor(yr)
    wx = (xr - x0f).astype(jnp.float32)
    wy = (yr - y0f).astype(jnp.float32)
    x0 = x0f.astype(jnp.int32)
    y0p = y0f.astype(jnp.int32) + PAD_TOP
    m0 = _map_rows(x0, s1x, s2x, xw2)
    m1 = _map_rows(x0 + 1, s1x, s2x, xw2)
    t0 = _map_rows(y0p, s1y, s2y, wy2)
    t1 = _map_rows(y0p + 1, s1y, s2y, wy2)
    return m0, m1, t0, t1, wx, wy


def _v2_tile_fwd(band, x_ref, y_ref, out_ref, s1y, s2y, s1x, s2x, wy2, xw2,
                 C, dot_dtype, copies):
    """One tile_h×128 output tile from a loaded [C, 2·wy2, 2·xw2] band: the
    single MXU dot + indicator-weighted y reduction.  ``copies`` are the
    in-flight band DMAs (required — a call site that forgot them would read
    the band scratch before the transfer lands): the VPU indicator build
    needs only the coords, so it runs under the transfer; the wait lands
    just before the band read."""
    m0, m1, t0, t1, wx, wy = _tile_terms_v2(x_ref, y_ref, s1y, s2y, s1x, s2x,
                                            wy2, xw2)
    th = x_ref.shape[1]
    N = th * TILE_W
    iox = jax.lax.broadcasted_iota(jnp.int32, (2 * xw2, N), 0)
    X = (
        (iox == m0[None]).astype(dot_dtype) * (1.0 - wx).astype(dot_dtype)[None]
        + (iox == m1[None]).astype(dot_dtype) * wx.astype(dot_dtype)[None]
    )
    for cp in copies:
        cp.wait()
    band_flat = band[...].reshape(C * 2 * wy2, 2 * xw2).astype(dot_dtype)
    G = jax.lax.dot(
        band_flat, X,
        precision=_dot_precision(dot_dtype),
        preferred_element_type=jnp.float32,
    )  # [C*2wy2, N]
    ior = jax.lax.broadcasted_iota(jnp.int32, (2 * wy2, N), 0)
    Y = (
        (ior == t0[None]).astype(jnp.float32) * (1.0 - wy)[None]
        + (ior == t1[None]).astype(jnp.float32) * wy[None]
    )
    out = jnp.sum(G.reshape(C, 2 * wy2, N) * Y[None], axis=1)  # [C, N]
    out_ref[0] = out.reshape(C, th, TILE_W)


def _v2_tile_bwd(band, x_ref, y_ref, ct_ref, dx_ref, dy_ref,
                 s1y, s2y, s1x, s2x, wy2, xw2, C, dot_dtype, copies):
    """Coordinate cotangents for one tile: stacked ``band @ [X | Xd]``
    (see the v1 ``_bwd_kernel`` derivation) + two weighted reductions.
    ``copies``: in-flight band DMAs, waited at the band read (as in fwd;
    required for the same reason)."""
    m0, m1, t0, t1, wx, wy = _tile_terms_v2(x_ref, y_ref, s1y, s2y, s1x, s2x,
                                            wy2, xw2)
    th = x_ref.shape[1]
    N = th * TILE_W
    ct = ct_ref[0].reshape(C, N).astype(jnp.float32)
    iox = jax.lax.broadcasted_iota(jnp.int32, (2 * xw2, N), 0)
    hi = (iox == m1[None]).astype(dot_dtype)
    lo = (iox == m0[None]).astype(dot_dtype)
    X = lo * (1.0 - wx).astype(dot_dtype)[None] + hi * wx.astype(dot_dtype)[None]
    for cp in copies:
        cp.wait()
    band_flat = band[...].reshape(C * 2 * wy2, 2 * xw2).astype(dot_dtype)
    GG = jax.lax.dot(
        band_flat,
        jnp.concatenate([X, hi - lo], axis=1),  # [2xw2, 2N]
        precision=_dot_precision(dot_dtype),
        preferred_element_type=jnp.float32,
    ).reshape(C, 2 * wy2, 2 * N)
    Gc, G2c = GG[..., :N], GG[..., N:]
    ior = jax.lax.broadcasted_iota(jnp.int32, (2 * wy2, N), 0)
    rhi = (ior == t1[None]).astype(jnp.float32)
    rlo = (ior == t0[None]).astype(jnp.float32)
    Y = rlo * (1.0 - wy)[None] + rhi * wy[None]
    dx = jnp.sum(jnp.sum(G2c * Y[None], axis=1) * ct, axis=0)
    dy = jnp.sum(jnp.sum(Gc * (rhi - rlo)[None], axis=1) * ct, axis=0)
    dx_ref[0] = dx.reshape(th, TILE_W)
    dy_ref[0] = dy.reshape(th, TILE_W)


def _fwd_kernel_v2(
    img_hbm, x_ref, y_ref, out_ref, band, *sems,
    C, H, W, Hpad, ywin, xwin, dot_dtype,
):
    """Grid (B, H/tile_h, W/128): one tile_h×128 output tile per step (tile_h
    from the coord block shape), ALL its rows in ONE MXU dot.

    The v1 kernel's x-interp matmul runs over the full row (``[C·window, W]
    @ [W, W]`` per output row) — x-displacement is just as coherent as y,
    so v2 banding BOTH dims shrinks the dot to ``[C·ywin, xwin] @
    [xwin, tile_h·128]`` per tile: ~5× fewer FLOPs at the production shape
    for a kernel measured MXU-FLOP-bound (docs/PERF.md round 3)."""
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    wy2, xw2 = ywin // 2, xwin // 2
    s1y, s2y, s1x, s2x, copies = _quad_band_dma(
        img_hbm, x_ref, y_ref, band, sems, b, H, W, Hpad, wy2, xw2
    )
    _v2_tile_fwd(band, x_ref, y_ref, out_ref, s1y, s2y, s1x, s2x, wy2, xw2,
                 C, dot_dtype, copies)


def _bwd_kernel_v2(
    img_hbm, x_ref, y_ref, ct_ref, dx_ref, dy_ref, band, *sems,
    C, H, W, Hpad, ywin, xwin, dot_dtype,
):
    """v2 coordinate cotangents: same one-dot structure as the v2 forward
    with the stacked ``band @ [X | Xd]`` (see the v1 ``_bwd_kernel``
    derivation), at the column-tiled FLOP count."""
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    wy2, xw2 = ywin // 2, xwin // 2
    s1y, s2y, s1x, s2x, copies = _quad_band_dma(
        img_hbm, x_ref, y_ref, band, sems, b, H, W, Hpad, wy2, xw2
    )
    _v2_tile_bwd(band, x_ref, y_ref, ct_ref, dx_ref, dy_ref,
                 s1y, s2y, s1x, s2x, wy2, xw2, C, dot_dtype, copies)


def _call_fwd_v2(image, x, y, ywin, xwin, dot_dtype, interpret=False,
                 tile_h=V2_TILE_H):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = image.shape
    img_pad, Hpad = _prep_image(image, ywin)
    kernel = functools.partial(
        _fwd_kernel_v2, C=C, H=H, W=W, Hpad=Hpad, ywin=ywin, xwin=xwin,
        dot_dtype=dot_dtype,
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    coords_spec = pl.BlockSpec((1, tile_h, TILE_W), lambda b, t, u: (b, t, u),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, H // tile_h, W // TILE_W),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), coords_spec, coords_spec],
        out_specs=pl.BlockSpec((1, C, tile_h, TILE_W), lambda b, t, u: (b, 0, t, u),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C, ywin, xwin), image.dtype)]
        + [pltpu.SemaphoreType.DMA(())] * 4,
        interpret=interpret,
        **kwargs,
    )(img_pad, x, y)
    return out.transpose(0, 2, 3, 1)


def _call_bwd_coords_v2(image, x, y, ct, ywin, xwin, dot_dtype, interpret=False,
                        tile_h=V2_TILE_H):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = image.shape
    img_pad, Hpad = _prep_image(image, ywin)
    ct_cf = ct.transpose(0, 3, 1, 2)
    kernel = functools.partial(
        _bwd_kernel_v2, C=C, H=H, W=W, Hpad=Hpad, ywin=ywin, xwin=xwin,
        dot_dtype=dot_dtype,
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    coords_spec = pl.BlockSpec((1, tile_h, TILE_W), lambda b, t, u: (b, t, u),
                               memory_space=pltpu.VMEM)
    dx, dy = pl.pallas_call(
        kernel,
        grid=(B, H // tile_h, W // TILE_W),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            coords_spec,
            coords_spec,
            pl.BlockSpec((1, C, tile_h, TILE_W), lambda b, t, u: (b, 0, t, u),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[coords_spec, coords_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((C, ywin, xwin), image.dtype)]
        + [pltpu.SemaphoreType.DMA(())] * 4,
        interpret=interpret,
        **kwargs,
    )(img_pad, x, y, ct_cf)
    return dx, dy


def _tiled_fwd_kernel(
    flags_ref, img_hbm, x_ref, y_ref, out_ref, band_n, band_w, *sems,
    C, H, W, Hpad, ywin, xwin, wy2w, xw2w, dot_dtype,
):
    """Unified tile-granular forward: grid (B, H/tile_h, W/128), one
    tile_h×128 tile per step (tile_h from the coord block shape, threaded
    from ``warp_banded(tile_h=...)``, default V2_TILE_H).  Unflagged tiles
    take the NARROW branch (dynamic two-half
    windows per dim, the cheap dot); flagged tiles take the WHOLE-PLANE
    branch (static window pair per dim: y halves (0, Hpad-wy2w), x halves
    (0, W-xw2w) with 2*wy2w >= Hpad and 2*xw2w >= W, so every corner maps).
    One kernel, one grid, no separate patch pass / merge (an earlier
    two-kernel version spent ~30 ms/step streaming coords through a
    mostly-skipped patch grid, docs/PERF.md round 3)."""
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    th = pl.program_id(1)
    tw = pl.program_id(2)
    nh, nw = pl.num_programs(1), pl.num_programs(2)
    flag = flags_ref[(b * nh + th) * nw + tw]

    @pl.when(flag == 0)
    def _():
        wy2, xw2 = ywin // 2, xwin // 2
        s1y, s2y, s1x, s2x, copies = _quad_band_dma(
            img_hbm, x_ref, y_ref, band_n, sems, b, H, W, Hpad, wy2, xw2
        )
        _v2_tile_fwd(band_n, x_ref, y_ref, out_ref, s1y, s2y, s1x, s2x,
                     wy2, xw2, C, dot_dtype, copies)

    @pl.when(flag != 0)
    def _():
        s1y, s2y, s1x, s2x = 0, Hpad - wy2w, 0, W - xw2w
        copies = _quad_dma(img_hbm, band_w, sems, b, s1y, s2y, s1x, s2x,
                           wy2w, xw2w)
        _v2_tile_fwd(band_w, x_ref, y_ref, out_ref, s1y, s2y, s1x, s2x,
                     wy2w, xw2w, C, dot_dtype, copies)


def _tiled_bwd_kernel(
    flags_ref, img_hbm, x_ref, y_ref, ct_ref, dx_ref, dy_ref, band_n, band_w,
    *sems, C, H, W, Hpad, ywin, xwin, wy2w, xw2w, dot_dtype,
):
    from jax.experimental import pallas as pl

    b = pl.program_id(0)
    th = pl.program_id(1)
    tw = pl.program_id(2)
    nh, nw = pl.num_programs(1), pl.num_programs(2)
    flag = flags_ref[(b * nh + th) * nw + tw]

    @pl.when(flag == 0)
    def _():
        wy2, xw2 = ywin // 2, xwin // 2
        s1y, s2y, s1x, s2x, copies = _quad_band_dma(
            img_hbm, x_ref, y_ref, band_n, sems, b, H, W, Hpad, wy2, xw2
        )
        _v2_tile_bwd(band_n, x_ref, y_ref, ct_ref, dx_ref, dy_ref,
                     s1y, s2y, s1x, s2x, wy2, xw2, C, dot_dtype, copies)

    @pl.when(flag != 0)
    def _():
        s1y, s2y, s1x, s2x = 0, Hpad - wy2w, 0, W - xw2w
        copies = _quad_dma(img_hbm, band_w, sems, b, s1y, s2y, s1x, s2x,
                           wy2w, xw2w)
        _v2_tile_bwd(band_w, x_ref, y_ref, ct_ref, dx_ref, dy_ref,
                     s1y, s2y, s1x, s2x, wy2w, xw2w, C, dot_dtype, copies)


def _call_tiled_fwd(image, flags, x, y, ywin, xwin, dot_dtype, interpret=False,
                    tile_h=V2_TILE_H):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = image.shape
    img_pad, Hpad = _prep_image(image, ywin)
    wy2w, xw2w = _patch_windows(Hpad, W)
    kernel = functools.partial(
        _tiled_fwd_kernel, C=C, H=H, W=W, Hpad=Hpad, ywin=ywin, xwin=xwin,
        wy2w=wy2w, xw2w=xw2w, dot_dtype=dot_dtype,
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    coords_spec = pl.BlockSpec((1, tile_h, TILE_W), lambda b, t, u, *_: (b, t, u),
                               memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H // tile_h, W // TILE_W),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), coords_spec, coords_spec],
        out_specs=pl.BlockSpec((1, C, tile_h, TILE_W),
                               lambda b, t, u, *_: (b, 0, t, u),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((C, ywin, xwin), image.dtype),
            pltpu.VMEM((C, 2 * wy2w, 2 * xw2w), image.dtype),
        ]
        + [pltpu.SemaphoreType.DMA(())] * 4,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(flags.reshape(-1), img_pad, x, y)
    return out.transpose(0, 2, 3, 1)


def _call_tiled_bwd(image, flags, x, y, ct, ywin, xwin, dot_dtype,
                    interpret=False, tile_h=V2_TILE_H):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = image.shape
    img_pad, Hpad = _prep_image(image, ywin)
    wy2w, xw2w = _patch_windows(Hpad, W)
    ct_cf = ct.transpose(0, 3, 1, 2)
    kernel = functools.partial(
        _tiled_bwd_kernel, C=C, H=H, W=W, Hpad=Hpad, ywin=ywin, xwin=xwin,
        wy2w=wy2w, xw2w=xw2w, dot_dtype=dot_dtype,
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    coords_spec = pl.BlockSpec((1, tile_h, TILE_W), lambda b, t, u, *_: (b, t, u),
                               memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H // tile_h, W // TILE_W),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            coords_spec, coords_spec,
            pl.BlockSpec((1, C, tile_h, TILE_W),
                         lambda b, t, u, *_: (b, 0, t, u),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[coords_spec, coords_spec],
        scratch_shapes=[
            pltpu.VMEM((C, ywin, xwin), image.dtype),
            pltpu.VMEM((C, 2 * wy2w, 2 * xw2w), image.dtype),
        ]
        + [pltpu.SemaphoreType.DMA(())] * 4,
    )
    dx, dy = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        ],
        interpret=interpret,
        **kwargs,
    )(flags.reshape(-1), img_pad, x, y, ct_cf)
    return dx, dy


def _tiled_flags(image, x, y, ywin, xwin, tile_h=V2_TILE_H):
    H, W = image.shape[1], image.shape[2]
    Hpad = max(_pad_geometry(H), ywin // 2)
    return _tile_violations_v2(x, y, H, W, Hpad, ywin, xwin,
                               tile_h=tile_h).astype(jnp.int32)


def tile_flag_frac(image, x, y, ywin, xwin=512, tile_h=V2_TILE_H):
    """Fraction of v2 tiles whose corner spread would violate the
    (``ywin``, ``xwin``) windows on these warp coords — padding-identical
    to the production tiled route, so it predicts exactly which tiles a
    ``warp_banded`` call at that window would patch-recompute.  Cheap jnp
    (the same predicate the tiled kernel prefetches; ~1 ms at the flagship
    shape) — the adaptive-window policy's per-step signal
    (parallel/train_step.py)."""
    imgp, xp, yp = _pad_align(image, x, y, hmult=tile_h)
    Hp, Wp = imgp.shape[1], imgp.shape[2]
    wide = never_violating_window(Hp)
    flags = _tiled_flags(imgp, xp, yp, min(ywin, wide), min(xwin, 2 * Wp),
                         tile_h)
    return jnp.mean(flags.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _warp_tiled_prim(image, x, y, ywin, xwin, dot_dtype, interpret, tile_h,
                     bwd_ywin, image_grad):
    """Tile-granular warp: narrow windows everywhere, whole-plane windows on
    the per-tile-flagged spread violators, in ONE kernel.

    ``bwd_ywin`` (0 = same as ``ywin``): y-window for the coordinate-
    cotangent kernel only.  The bwd dot is the FLOP-dominant bucket (1.46×
    its forward, docs/PERF.md round 4) and its band is built from the same
    rows — a narrower bwd-only window halves its M-dim; tiles whose spread
    exceeds it are re-flagged at the bwd window and take the whole-plane
    patch branch, so the cotangents stay exact."""
    flags = _tiled_flags(image, x, y, ywin, xwin, tile_h)
    return _call_tiled_fwd(image, flags, x, y, ywin, xwin, dot_dtype,
                           interpret, tile_h)


def _warp_tiled_prim_fwd(image, x, y, ywin, xwin, dot_dtype, interpret, tile_h,
                         bwd_ywin, image_grad):
    flags = _tiled_flags(image, x, y, ywin, xwin, tile_h)
    out = _call_tiled_fwd(image, flags, x, y, ywin, xwin, dot_dtype,
                          interpret, tile_h)
    return out, (image, x, y, flags)


def _warp_tiled_prim_bwd(ywin, xwin, dot_dtype, interpret, tile_h, bwd_ywin,
                         image_grad, res, ct_out):
    image, x, y, flags = res
    ct_out = jnp.asarray(ct_out, jnp.float32)
    if bwd_ywin and bwd_ywin != ywin:
        ywin = bwd_ywin
        flags = _tiled_flags(image, x, y, ywin, xwin, tile_h)
    dx, dy = _call_tiled_bwd(image, flags, x, y, ct_out, ywin, xwin,
                             dot_dtype, interpret, tile_h)
    # image cotangent: jnp gather-transpose, DCE'd when unused (see v1);
    # image_grad=False skips it statically (caller stop-gradients the
    # operand)
    if not image_grad:
        return jnp.zeros_like(image), dx, dy
    from .resample import _resample_bilinear_4gather

    _, vjp_img = jax.vjp(
        lambda im: _resample_bilinear_4gather(im, x, y), image
    )
    (d_image,) = vjp_img(ct_out.astype(image.dtype))
    return d_image, dx, dy


_warp_tiled_prim.defvjp(_warp_tiled_prim_fwd, _warp_tiled_prim_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _warp_banded_prim_v2(image, x, y, ywin, xwin, dot_dtype, interpret):
    return _call_fwd_v2(image, x, y, ywin, xwin, dot_dtype, interpret)


def _warp_banded_prim_v2_fwd(image, x, y, ywin, xwin, dot_dtype, interpret):
    out = _warp_banded_prim_v2(image, x, y, ywin, xwin, dot_dtype, interpret)
    return out, (image, x, y)


def _warp_banded_prim_v2_bwd(ywin, xwin, dot_dtype, interpret, res, ct_out):
    image, x, y = res
    ct_out = jnp.asarray(ct_out, jnp.float32)
    dx, dy = _call_bwd_coords_v2(image, x, y, ct_out, ywin, xwin, dot_dtype, interpret)
    # image cotangent: jnp gather-transpose, DCE'd when unused (see v1)
    from .resample import _resample_bilinear_4gather

    _, vjp_img = jax.vjp(
        lambda im: _resample_bilinear_4gather(im, x, y), image
    )
    (d_image,) = vjp_img(ct_out.astype(image.dtype))
    return d_image, dx, dy


_warp_banded_prim_v2.defvjp(_warp_banded_prim_v2_fwd, _warp_banded_prim_v2_bwd)


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


# ---------------------------------------------------------------------------
# Image-cotangent kernel (round 5): the transpose of the banded warp as MXU
# matmuls — scatter-free d_image for warps differentiated w.r.t. their
# IMAGE operand at detached coords (MotionLearning's cycle loss warps the
# predicted translation field; the reference backprops F.grid_sample into
# it, motion_loss.py:11).  The jnp scatter-add transpose costs ~70 ns/index
# on v5e in EVERY formulation (tools/microbench_scatter.py: 4×C-wide 276 ms,
# 2×2C-wide 142 ms, 1×4C-wide 119 ms at [32,128,416,3]) — index-throughput-
# bound, like the forward gather study (docs/PERF.md item 2).  This kernel
# removes the scatter the same way the forward kernels removed the gather:
#
#   d_img[c, r, w] = Σ_{i,j} ct[c,i,j] · X_i[w,j] · Y_i[r,j]
#
# Grid over IMAGE-row tiles (B, Hin/8): for image tile rows [R, R+8), loop
# over output-row groups of G; each group contributes ONE dot
# ``A @ X_stack`` with A[c·r, i·W+j] = ct[c,i,j]·Y-indicator(R+r, y(i,j))
# and X_stack[i·W+j, w] the stacked x-one-hots — both built from iota
# compares in VMEM (no gather, no scatter).  Out-of-image corners match no
# iota position (zeros padding exact); padded output rows carry x = -2 and
# zero ct, contributing nothing.
# ---------------------------------------------------------------------------


def _img_ct_kernel(ct_ref, x_ref, y_ref, out_ref, acc, *, C, Ho, W, G,
                   dot_dtype):
    """One 8-row image tile of d_img: accumulate over all output rows.

    ct_ref: [1, C, Ho, W] (zero-padded); x/y: [1, Ho, W] (x pads -2.0);
    out: [1, C, 8, W] f32; acc scratch: [C*8, W] f32.
    """
    from jax.experimental import pallas as pl

    R = pl.program_id(1) * 8

    acc[...] = jnp.zeros_like(acc)

    def group_body(g, _):
        xr = x_ref[0, pl.ds(g * G, G), :]       # [G, W]
        yr = y_ref[0, pl.ds(g * G, G), :]
        ctg = ct_ref[0, :, pl.ds(g * G, G), :]  # [C, G, W]

        x0 = jnp.floor(xr)
        wx = (xr - x0).astype(dot_dtype)
        y0 = jnp.floor(yr)
        wy = (yr - y0).astype(jnp.float32)
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        # Y indicators for THIS image tile's 8 rows: [8, G, W]
        ior = jax.lax.broadcasted_iota(jnp.int32, (8, G, W), 0) + R
        Yl = (
            (ior == y0i[None]).astype(jnp.float32) * (1.0 - wy)[None]
            + (ior == y0i[None] + 1).astype(jnp.float32) * wy[None]
        )
        A = (ctg[:, None] * Yl[None]).reshape(C * 8, G * W)

        # stacked x-one-hots: [G*W, W]
        iow = jax.lax.broadcasted_iota(jnp.int32, (G * W, W), 1)
        x0f = x0i.reshape(G * W)[:, None]
        wxf = wx.reshape(G * W)[:, None]
        Xs = (
            (iow == x0f).astype(dot_dtype) * (1.0 - wxf)
            + (iow == x0f + 1).astype(dot_dtype) * wxf
        )
        acc[...] += jax.lax.dot(
            A.astype(dot_dtype), Xs,
            precision=_dot_precision(dot_dtype),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, Ho // G, group_body, 0)
    out_ref[0] = acc[...].reshape(C, 8, W)


def warp_image_cotangent(ct, x, y, Hin, dot_dtype=jnp.bfloat16,
                         interpret=False, group=8):
    """d_image of ``resample_bilinear(image, x, y)`` w.r.t. ``image``,
    contracted with cotangent ``ct`` — scatter-free (module section
    comment).

    ct: [B, Ho, Wo, C] output cotangent; x, y: [B, Ho, Wo] pixel coords
    into an image of shape [B, Hin, Wo, C].  Returns [B, Hin, Wo, C] f32.
    bf16 ``dot_dtype`` keeps the one-hot structure exact and rounds only
    interp weights / ct values (same argument as the forward kernels).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Ho, W, C = ct.shape
    G = group
    Wp = _ceil_to(W, 128)
    Hop = _ceil_to(Ho, G)
    Hp_in = _ceil_to(Hin, 8)

    ct_cf = ct.transpose(0, 3, 1, 2).astype(jnp.float32)  # [B, C, Ho, W]
    if (Hop, Wp) != (Ho, W):
        ct_cf = jnp.pad(ct_cf, ((0, 0), (0, 0), (0, Hop - Ho), (0, Wp - W)))
        pad_c = ((0, 0), (0, Hop - Ho), (0, Wp - W))
        x = jnp.pad(x, pad_c, constant_values=-2.0)
        y = jnp.pad(y, pad_c, mode="edge")

    kernel = functools.partial(
        _img_ct_kernel, C=C, Ho=Hop, W=Wp, G=G, dot_dtype=dot_dtype,
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    out = pl.pallas_call(
        kernel,
        grid=(B, Hp_in // 8),
        in_specs=[
            pl.BlockSpec((1, C, Hop, Wp), lambda b, t: (b, 0, 0, 0)),
            pl.BlockSpec((1, Hop, Wp), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, Hop, Wp), lambda b, t: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, C, 8, Wp), lambda b, t: (b, 0, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C, Hp_in, Wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C * 8, Wp), jnp.float32)],
        interpret=interpret,
        **kwargs,
    )(ct_cf, x, y)
    return out[:, :, :Hin, :W].transpose(0, 2, 3, 1)


def eligible(image, x, y) -> bool:
    """Kernel applicability: a same-resolution warp (coords per output pixel
    of the input plane).  Alignment is NOT required — :func:`warp_banded`
    zero-pads rows to ×8 and lanes to ×128."""
    B, H, W, C = image.shape
    return x.shape == (B, H, W) and y.shape == (B, H, W)


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


def _pad_align(image, x, y, hmult=TILE_H):
    """Zero-pad (image, x, y) to TPU-aligned [B, H·hmult, W128] shapes.

    x pads with -2.0 (fully outside: both corners miss every iota column,
    so padded outputs are exact zeros).  y pads EDGE-replicated so padded
    pixels' rows track their tile's real rows and cannot skew the dynamic
    window placement."""
    B, H, W, C = image.shape
    Hp, Wp = _ceil_to(H, hmult), _ceil_to(W, 128)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _warp_banded_prim(image, x, y, window, dot_dtype, interpret, image_grad):
    return _call_fwd(image, x, y, window, dot_dtype, interpret)


def _warp_banded_prim_fwd(image, x, y, window, dot_dtype, interpret,
                          image_grad):
    out = _warp_banded_prim(image, x, y, window, dot_dtype, interpret,
                            image_grad)
    return out, (image, x, y)


def _warp_banded_prim_bwd(window, dot_dtype, interpret, image_grad, res,
                          ct_out):
    image, x, y = res
    ct_out = jnp.asarray(ct_out, jnp.float32)
    dx, dy = _call_bwd_coords(image, x, y, ct_out, window, dot_dtype, interpret)
    # Image cotangent via the jnp gather-transpose (scatter-add).  When the
    # warped operand is a traced constant XLA usually DCEs this branch —
    # EXCEPT under the v1 whole-call ``lax.cond`` fallback, where the cond
    # transpose keeps every branch output alive (measured: 4 scatter
    # fusions × 83 ms of exact zeros per MotionLearning step,
    # docs/PERF.md round-5 decomposition).  ``image_grad=False`` (static,
    # from a caller that already stop-gradients the operand) skips it
    # explicitly.
    if not image_grad:
        return jnp.zeros_like(image), dx, dy
    from .resample import _resample_bilinear_4gather

    _, vjp_img = jax.vjp(
        lambda im: _resample_bilinear_4gather(im, x, y), image
    )
    (d_image,) = vjp_img(ct_out.astype(image.dtype))
    return d_image, dx, dy


_warp_banded_prim.defvjp(_warp_banded_prim_fwd, _warp_banded_prim_bwd)


def warp_banded(image, x, y, window=128, dot_dtype=jnp.float32,
                interpret=False, xwin=512, ywin=96, tile_h=V2_TILE_H,
                bwd_ywin=0, image_grad=True):
    """Gather-free banded bilinear warp, always exact.

    Drop-in for ``ops.resample.resample_bilinear`` on same-resolution warps
    (x, y of shape [B, H, W]).  Production path (``xwin``/``ywin`` ≥ the v2
    minima): the TILE-GRANULAR composite — the v2 column-tiled kernel (both
    dims banded, one MXU dot per 8×128 tile) everywhere, plus a whole-plane-
    window patch kernel that recomputes only the tiles whose corner spread
    exceeds the v2 windows (``pl.when``-gated per tile), merged per tile.
    No whole-call fallback cliff: a handful of wild tiles (border-clipped
    bimodal coords at random init) costs a handful of wide-window tiles,
    not a whole-plane wide kernel (docs/PERF.md round 3).

    ``xwin < 256`` / ``ywin < 16`` selects the legacy v1 row-banded kernel
    with its whole-call wide fallback (kept for ablation via
    TPU.WARP_XWIN=0).

    ``tile_h`` is the v2 output tile height (multiple of 8; see V2_TILE_H) —
    an explicit parameter so sweeps re-trace cleanly instead of mutating a
    module global.
    """
    if tile_h % 8 != 0 or tile_h < 8:
        raise ValueError(f"tile_h must be a positive multiple of 8, got {tile_h}")
    B, H, W, _ = image.shape
    use_v2 = xwin >= 256 and ywin >= 16 and W >= V2_MIN_W
    imgp, xp, yp = _pad_align(image, x, y,
                              hmult=tile_h if use_v2 else TILE_H)
    Hp, Wp = imgp.shape[1], imgp.shape[2]
    wide = never_violating_window(Hp)
    window = min(window, wide)
    Hpad = max(_pad_geometry(Hp), window // 2)
    if use_v2:
        # tile-granular: v2 column-tiled kernel + per-tile whole-plane patch,
        # no whole-call predicate / branch at all
        ywin = min(ywin, wide)
        xwin = min(xwin, 2 * Wp)
        if bwd_ywin:
            bwd_ywin = min(bwd_ywin, wide)
            if bwd_ywin < 16 or bwd_ywin == ywin:
                bwd_ywin = 0
        out = _warp_tiled_prim(imgp, xp, yp, ywin, xwin, dot_dtype, interpret,
                               tile_h, bwd_ywin, image_grad)
        return out[:, :H, :W].astype(image.dtype)

    def _fast(imp, xxp, yyp):
        out = _warp_banded_prim(imp, xxp, yyp, window, dot_dtype, interpret,
                                image_grad)
        return out[:, :H, :W].astype(image.dtype)

    def _wide(imp, xxp, yyp):
        out = _warp_banded_prim(imp, xxp, yyp, wide, dot_dtype, interpret,
                                image_grad)
        return out[:, :H, :W].astype(image.dtype)

    if window == wide:
        return _fast(imgp, xp, yp)
    viol_any = _window_violation(yp, Hp, Hpad, window)
    return jax.lax.cond(viol_any, _wide, _fast, imgp, xp, yp)
