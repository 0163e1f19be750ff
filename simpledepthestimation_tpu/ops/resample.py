"""Bilinear image resampling (the gather-heavy warp at the heart of
self-supervised depth training).

Exact semantics of ``torch.nn.functional.grid_sample(mode='bilinear',
padding_mode='zeros', align_corners=True)`` (used at reference
detectron2/geometry/camera.py:196) and of the TF-style gather resampler
(reference detectron2/geometry/resampler.py:65-122), re-designed for TPU:

- NHWC layout; the gather is a single-axis ``jnp.take`` on a
  batch-flattened operand with the batch offset folded into the indices
  (measured 1.54× faster on v5e than batched ``take_along_axis`` —
  tools/microbench_packed.py; the gather is per-INDEX-cost bound, not
  byte-bound).
- **Row-pair channel packing halves the index count again (measured 2.06×
  on v5e, tools/microbench_warp_packed.py)**: the image is packed to
  [B,H,W,2C] with its one-row-down shifted copy (a cheap fusable
  bandwidth op), so ONE gather per x-corner fetches both y-corners as a
  contiguous 2C-wide slice — 2 gathers per bilinear sample instead of 4.
  A 2×2-packed single-gather variant (4C slices) measured *slower* (0.76×)
  — 6-wide f32 slices amortize the per-index cost, 12-wide do not.
- Gradients flow through both the image (gather transpose = scatter-add,
  summed over the two packed copies by the pad/concat adjoint) and the
  coordinates (analytic bilinear weight derivative), matching
  grid_sample's autograd.
- A fused Pallas kernel for the photometric consumer lives in
  ops/pallas_photometric.py; the 4-gather composition is kept as
  ``_resample_bilinear_4gather`` (test oracle).
"""

from __future__ import annotations

import contextlib
import math

import jax
import jax.numpy as jnp

# Warp implementation selector (trace-time constant; set from cfg at model
# build via :func:`set_warp_impl`):
#   auto       — banded MXU kernel (bf16 one-hot matmuls) on TPU for
#                full-plane warps, size-routed gather otherwise
#   banded     — like auto (explicit)
#   banded_f32 — banded kernel with f32 (3-pass) matmuls: exact to 2e-7
#   gather     — pure gather formulations (PARITY.STRICT forces this)
_WARP_IMPL = "auto"
_WARP_IMPLS = ("auto", "gather", "banded", "banded_f32")

# Measured v5e crossover (tools/microbench_warp_scaling.py): the row-pair
# packed gather wins below ~2.5M indices (2.06x at 2.0M), loses above
# (0.69x at 5.9M — the 6-wide slices stop amortizing the per-index cost
# once the gather outgrows some on-chip resource).
_PACKED_MAX_INDICES = 2_500_000
# Below this width the banded kernel's per-tile overhead and pad-to-128
# waste outweigh the gather; every production warp plane is >= 320 wide.
_BANDED_MIN_W = 256


# Banded-kernel row window (cfg TPU.WARP_WINDOW): larger windows tolerate
# more vertical spread per 8-row tile (fewer exact-gather fallback steps in
# early training) at ~linear extra matmul cost.
_WARP_WINDOW = 128
# v2 column-tiled kernel windows (cfg TPU.WARP_XWIN / WARP_YWIN; 0 = v2 off).
_WARP_XWIN = 512
_WARP_YWIN = 96
# v2/tiled output tile height (cfg TPU.WARP_TILE_H; multiple of 8).
_WARP_TILE_H = 8
# Backward-only y-window (cfg TPU.WARP_YWIN_BWD; 0 = same as forward): the
# coordinate-cotangent kernel re-flags tiles at this window and runs its
# dots at the narrower band (docs/PERF.md round-5 warp-bwd-diet probe).
_WARP_YWIN_BWD = 0
# Adaptive narrow-window candidate (cfg TPU.WARP_YWIN_NARROW; 0 = off).
# The train step compiles a second executable at this y-window and switches
# to it per step once the per-tile flag predicate reports zero would-be
# violations (parallel/train_step.py policy; docs/PERF.md round 5).
_WARP_YWIN_NARROW = 48

# Trace-time tap: when a list, the v2-eligible warp calls append the
# would-be flag fraction at _WARP_FLAG_YWIN (see warp_trace_overrides).
_WARP_FLAG_TAP = None
_WARP_FLAG_YWIN = 0
# Trace-time const-image marker (see const_image_warps): banded warps
# traced inside the scope skip the image-cotangent gather-transpose.
_WARP_IMAGE_GRAD = True


@contextlib.contextmanager
def const_image_warps():
    """Trace-time scope: warps traced inside sample a CONSTANT operand (the
    caller stop-gradients it), so the banded kernels' custom-VJP skips the
    image-cotangent scatter statically.  Needed because the v1 kernel's
    whole-call ``lax.cond`` fallback defeats XLA's DCE of the (exactly
    zero) scatter — 4 fusions × 83 ms per MotionLearning step
    (docs/PERF.md round-5 decomposition).  Gather-path warps need no
    marker: plain JAX AD tracks the stop_gradient's activity exactly."""
    global _WARP_IMAGE_GRAD
    prev = _WARP_IMAGE_GRAD
    _WARP_IMAGE_GRAD = False
    try:
        yield
    finally:
        _WARP_IMAGE_GRAD = prev


def set_warp_impl(impl: str, window: int = None, xwin: int = None,
                  ywin: int = None, tile_h: int = None,
                  ywin_narrow: int = None, ywin_bwd: int = None) -> None:
    """Select the warp backend (module-level, read at trace time)."""
    global _WARP_IMPL, _WARP_WINDOW, _WARP_XWIN, _WARP_YWIN, _WARP_TILE_H
    global _WARP_YWIN_NARROW, _WARP_YWIN_BWD
    if impl not in _WARP_IMPLS:
        raise ValueError(f"warp impl {impl!r} not in {_WARP_IMPLS}")
    _WARP_IMPL = impl
    if window is not None:
        _WARP_WINDOW = int(window)
    if xwin is not None:
        _WARP_XWIN = int(xwin)
    if ywin is not None:
        _WARP_YWIN = int(ywin)
    if tile_h is not None:
        _WARP_TILE_H = int(tile_h)
    if ywin_narrow is not None:
        _WARP_YWIN_NARROW = int(ywin_narrow)
    if ywin_bwd is not None:
        _WARP_YWIN_BWD = int(ywin_bwd)


def configured_ywin() -> int:
    return _WARP_YWIN


def configured_narrow_ywin() -> int:
    """The adaptive narrow-window candidate, or 0 when the policy cannot
    apply (gather impl, narrow disabled, or narrow ≥ the configured wide
    window)."""
    if _WARP_IMPL == "gather":
        return 0
    if not (0 < _WARP_YWIN_NARROW < _WARP_YWIN):
        return 0
    return _WARP_YWIN_NARROW


@contextlib.contextmanager
def warp_trace_overrides(ywin: int = 0, flag_ywin: int = 0):
    """Trace-time warp-config scope: optionally override the v2 y-window
    (``ywin``) and/or collect per-call would-be flag fractions at a
    candidate window (``flag_ywin``).  Yields the tap list; v2-eligible
    :func:`resample_bilinear` calls traced inside the scope append one
    scalar tracer each.  Used by the train step to compile narrow/wide
    step variants and emit the adaptive policy's signal."""
    global _WARP_YWIN, _WARP_FLAG_TAP, _WARP_FLAG_YWIN
    prev = (_WARP_YWIN, _WARP_FLAG_TAP, _WARP_FLAG_YWIN)
    tap = []
    if ywin:
        _WARP_YWIN = int(ywin)
    if flag_ywin:
        _WARP_FLAG_TAP, _WARP_FLAG_YWIN = tap, int(flag_ywin)
    try:
        yield tap
    finally:
        _WARP_YWIN, _WARP_FLAG_TAP, _WARP_FLAG_YWIN = prev


def _gather_corner(
    flat_img: jnp.ndarray,
    base: jnp.ndarray,
    ix: jnp.ndarray,
    iy: jnp.ndarray,
    H: int,
    W: int,
):
    """Gather pixel values at integer (ix, iy), zero-filling out-of-bounds.

    flat_img: [B*H*W, C]; base: [B, 1] per-batch flat offsets (b·H·W);
    ix, iy: [B, N] int32. Returns values [B, N, C].
    """
    inb = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
    idx = base + jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
    vals = jnp.take(flat_img, idx.reshape(-1), axis=0, mode="clip").reshape(
        idx.shape + (flat_img.shape[-1],)
    )
    return vals * inb[..., None].astype(flat_img.dtype)


def _resample_bilinear_4gather(image, x, y):
    """The un-packed 4-corner formulation (oracle / fallback)."""
    B, H, W, C = image.shape
    out_shape = x.shape[1:]
    x = x.reshape(B, -1)
    y = y.reshape(B, -1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(image.dtype)[..., None]
    wy = (y - y0).astype(image.dtype)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = image.reshape(B * H * W, C)
    base = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None]
    v00 = _gather_corner(flat, base, x0i, y0i, H, W)
    v01 = _gather_corner(flat, base, x0i + 1, y0i, H, W)
    v10 = _gather_corner(flat, base, x0i, y0i + 1, H, W)
    v11 = _gather_corner(flat, base, x0i + 1, y0i + 1, H, W)

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy
    return out.reshape((B,) + out_shape + (C,))


def _resample_gather_auto(
    image: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """Gather-formulation warp, routed by index count (measured v5e
    crossover — module docstring)."""
    n_indices = image.shape[0] * math.prod(x.shape[1:])
    if n_indices > _PACKED_MAX_INDICES:
        return _resample_bilinear_4gather(image, x, y)
    return _resample_bilinear_packed(image, x, y)


def resample_bilinear(image: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of NHWC ``image`` at unnormalized pixel coords.

    image: [B, H, W, C]; x, y: [B, h, w] float pixel coordinates.
    Out-of-bounds contributions are zero (padding_mode='zeros'): every
    corner is masked individually, so partially-outside samples fade out
    exactly as grid_sample does — bit-compatible with the reference's
    ``F.grid_sample`` (detectron2/geometry/camera.py:196).

    Routing (see module docstring + :func:`set_warp_impl`): full-plane
    warps on TPU go to the banded MXU kernel (ops/pallas_warp.py, 3-5x the
    gathers at production shapes, exact-gather fallback on band violation);
    everything else to the measured-fastest gather formulation.
    """
    if _WARP_IMPL != "gather" and image.shape[2] >= _BANDED_MIN_W:
        from . import pallas_warp

        if pallas_warp.eligible(image, x, y) and jax.default_backend() == "tpu":
            if (
                _WARP_FLAG_TAP is not None
                and image.shape[2] >= pallas_warp.V2_MIN_W
                and _WARP_XWIN >= 256
                and _WARP_YWIN >= 16
            ):
                # same v2-eligibility as warp_banded: this call would run the
                # tiled kernel, so record its would-be flag fraction at the
                # narrow candidate window for the adaptive policy
                _WARP_FLAG_TAP.append(
                    pallas_warp.tile_flag_frac(
                        image, x, y, _WARP_FLAG_YWIN, _WARP_XWIN, _WARP_TILE_H
                    )
                )
            dd = jnp.float32 if _WARP_IMPL == "banded_f32" else jnp.bfloat16
            return pallas_warp.warp_banded(
                image, x, y, window=_WARP_WINDOW, dot_dtype=dd,
                xwin=_WARP_XWIN, ywin=_WARP_YWIN, tile_h=_WARP_TILE_H,
                bwd_ywin=_WARP_YWIN_BWD, image_grad=_WARP_IMAGE_GRAD,
            )
    return _resample_gather_auto(image, x, y)


def _resample_bilinear_packed(
    image: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """Row-pair packed formulation (2.06× the 4-gather at ≤2.5M indices on
    v5e — module docstring): gather (v_y0 | v_y1) per x-corner from the
    row-pair-packed image. The y anchor is clamped to [0, H−1]; an
    in-packed ``where`` repairs the top-edge clamp (y0 = −1 reads its y1
    corner from packed slot 0), the bottom zero pad covers y0 = H−1, and
    per-corner masks zero every out-of-bounds contribution.
    """
    B, H, W, C = image.shape
    out_shape = x.shape[1:]
    x = x.reshape(B, -1)
    y = y.reshape(B, -1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(image.dtype)[..., None]
    wy = (y - y0).astype(image.dtype)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    padded = jnp.pad(image, ((0, 0), (0, 1), (0, 0), (0, 0)))
    packed = jnp.concatenate([padded[:, :H], padded[:, 1:]], axis=-1)
    flat = packed.reshape(B * H * W, 2 * C)
    base = (jnp.arange(B, dtype=jnp.int32) * (H * W))[:, None]
    ay = jnp.clip(y0i, 0, H - 1)
    sel0 = (jnp.clip(y0i - ay, 0, 1) == 0)[..., None]
    sel1 = (jnp.clip(y0i + 1 - ay, 0, 1) == 0)[..., None]
    m_y0 = (y0i >= 0) & (y0i <= H - 1)
    m_y1 = (y0i + 1 >= 0) & (y0i + 1 <= H - 1)

    def col(cx):
        inb_x = (cx >= 0) & (cx <= W - 1)
        idx = base + ay * W + jnp.clip(cx, 0, W - 1)
        vals = jnp.take(flat, idx.reshape(-1), axis=0, mode="clip").reshape(
            idx.shape + (2 * C,)
        )
        g = vals.reshape(vals.shape[:-1] + (2, C))
        v0 = jnp.where(sel0, g[..., 0, :], g[..., 1, :])
        v1 = jnp.where(sel1, g[..., 0, :], g[..., 1, :])
        dt = flat.dtype
        return (
            v0 * (inb_x & m_y0)[..., None].astype(dt),
            v1 * (inb_x & m_y1)[..., None].astype(dt),
        )

    v00, v10 = col(x0i)
    v01, v11 = col(x0i + 1)

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy
    return out.reshape((B,) + out_shape + (C,))


@jax.custom_vjp
def _resample_const_coords_prim(image, x, y):
    return _resample_gather_auto(image, x, y)


def _resample_const_coords_fwd(image, x, y):
    out = _resample_gather_auto(image, x, y)
    return out, (x, y, image.shape, image.dtype)


def _resample_const_coords_bwd(res, ct):
    from . import pallas_warp

    x, y, shape, dtype = res
    ct = jnp.asarray(ct, jnp.float32)
    dd = jnp.float32 if _WARP_IMPL == "banded_f32" else jnp.bfloat16
    d_image = pallas_warp.warp_image_cotangent(ct, x, y, shape[1], dot_dtype=dd)
    # coords are detached by contract (the caller stop-gradients them);
    # their cotangents are structurally zero
    return d_image.astype(dtype), jnp.zeros_like(x), jnp.zeros_like(y)


_resample_const_coords_prim.defvjp(
    _resample_const_coords_fwd, _resample_const_coords_bwd
)


def resample_bilinear_image_grad(
    image: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """Bilinear sample for warps whose GRADIENT flows through the image
    operand while the coords are detached (MotionLearning's cycle loss —
    the reference backprops ``F.grid_sample`` into the sampled translation
    field, motion_loss.py:11-12).

    The banded coordinate-gradient kernel is the wrong tool here (its
    strength is gather-free dx/dy, never needed at detached coords, while
    its image cotangent was the scatter chain — 4 × 83 ms of a 441 ms
    MotionLearning step, docs/PERF.md round-5 decomposition).  Forward:
    the measured-fastest gather formulation.  Backward on TPU: the
    scatter-free banded image-cotangent kernel
    (ops/pallas_warp.warp_image_cotangent) — the jnp scatter-add transpose
    costs ~70 ns/index in every packing (tools/microbench_scatter.py);
    elsewhere: plain autodiff of the gather (its VJP scatter).

    Coords are stop-gradient'ed here to make the contract explicit: their
    cotangents are zero on this path."""
    x = jax.lax.stop_gradient(x)
    y = jax.lax.stop_gradient(y)
    if (
        _WARP_IMPL != "gather"
        and image.shape[2] >= _BANDED_MIN_W
        and jax.default_backend() == "tpu"
        and x.shape == y.shape
        and x.shape[0] == image.shape[0]
        and x.shape[-1] == image.shape[2]
    ):
        return _resample_const_coords_prim(image, x, y)
    return _resample_gather_auto(image, x, y)


def grid_sample_bilinear(image: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """``F.grid_sample`` parity: normalized [-1,1] grid, align_corners=True,
    bilinear, zeros padding.

    image: [B, H, W, C]; grid: [B, h, w, 2] with (x, y) in [-1, 1].
    """
    B, H, W, C = image.shape
    x = (grid[..., 0] + 1.0) * (W - 1) / 2.0
    y = (grid[..., 1] + 1.0) * (H - 1) / 2.0
    return resample_bilinear(image, x, y)


def resampler_with_unstacked_warp(
    image: jnp.ndarray, warp_x: jnp.ndarray, warp_y: jnp.ndarray, safe: bool = True
) -> jnp.ndarray:
    """TF-style resampler on unnormalized coords (reference resampler.py:65-122).

    Identical math to :func:`resample_bilinear`; kept as a named entry point
    for capability parity (used by view_synthesis_v2 paths).
    """
    del safe  # zero-fill OOB is always on, matching safe_gather_nd
    return resample_bilinear(image, warp_x, warp_y)
