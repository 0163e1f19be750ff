"""Tile-granular column-tiled warp kernel (round 3) vs the exact gather
oracle, interpret mode on CPU (the same kernels compile natively on TPU).

The production path for wide planes (W ≥ V2_MIN_W) is the unified tiled
kernel: narrow two-half windows in BOTH dims per 8×128 tile, with per-tile
``pl.when`` escape to a whole-plane window pair on the jnp-flagged spread
violators (ops/pallas_warp.py:_tiled_fwd_kernel).  These tests pin (a)
exact forward parity in every flag regime (all-narrow, all-wide, mixed),
(b) coordinate gradients vs the oracle, (c) the per-tile flag predicate's
consistency with the kernels' window placement, (d) zeros-padding corners.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simpledepthestimation_tpu.ops import pallas_warp as pw
from simpledepthestimation_tpu.ops.resample import _resample_bilinear_4gather

B, H, W, C = 1, 96, 640, 3
YWIN, XWIN = 96, 512


@pytest.fixture
def img(rng):
    return jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))


def _grid():
    xs = np.tile(np.arange(W, dtype=np.float32), (B, H, 1))
    ys = np.tile(np.arange(H, dtype=np.float32)[:, None], (B, 1, W))
    return xs, ys


def _flag_frac(x, y):
    flags = pw._tiled_flags(
        jnp.zeros((B, H, W, C), jnp.float32), x, y, YWIN, XWIN
    )
    return float(jnp.mean((flags != 0).astype(jnp.float32)))


CASES = {
    # (x, y builders) -> expected flag regime
    "coherent": lambda rng, xs, ys: (
        xs - 5.0 * rng.rand(B, H, W) + 2.0 * (rng.rand(B, H, W) - 0.5),
        ys + 3.0 * (rng.rand(B, H, W) - 0.5),
    ),
    "wild": lambda rng, xs, ys: (
        rng.rand(B, H, W) * (W - 1),
        rng.rand(B, H, W) * (H - 1),
    ),
    "bidirectional-large": lambda rng, xs, ys: (
        np.clip(xs + 170 * (rng.rand(B, H, W) - 0.5), 0, W - 1),
        np.clip(ys + 150 * (rng.rand(B, H, W) - 0.5), 0, H - 1),
    ),
    "oob-borders": lambda rng, xs, ys: (
        xs - 20 * rng.rand(B, H, W) + 10,  # spills past both x edges
        ys + 10 * (rng.rand(B, H, W) - 0.7),
    ),
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_tiled_matches_oracle(case, img, rng):
    xs, ys = _grid()
    x, y = CASES[case](rng, xs, ys)
    x = jnp.asarray(np.asarray(x, np.float32))
    y = jnp.asarray(np.asarray(y, np.float32))

    out = pw.warp_banded(img, x, y, dot_dtype=jnp.float32, interpret=True,
                         xwin=XWIN, ywin=YWIN)
    ref = _resample_bilinear_4gather(img, x, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-6)


def test_flag_regimes(img, rng):
    """Coherent coords run all-narrow; per-pixel-random coords all-wide."""
    xs, ys = _grid()
    x, y = CASES["coherent"](rng, xs, ys)
    assert _flag_frac(jnp.asarray(x.astype(np.float32)),
                      jnp.asarray(y.astype(np.float32))) == 0.0
    x, y = CASES["wild"](rng, xs, ys)
    assert _flag_frac(jnp.asarray(x.astype(np.float32)),
                      jnp.asarray(y.astype(np.float32))) == 1.0


def test_mixed_flags_merge(img, rng):
    """A single wild tile flags only itself; output still exact."""
    xs, ys = _grid()
    x, y = CASES["coherent"](rng, xs, ys)
    x = np.asarray(x, np.float32)
    # scatter one tile's columns across the full row: needs the wide branch
    x[:, 40:48, 256:384] = rng.rand(B, 8, 128).astype(np.float32) * (W - 1)
    x = jnp.asarray(x)
    y = jnp.asarray(np.asarray(y, np.float32))

    frac = _flag_frac(x, y)
    assert 0.0 < frac < 0.05, frac

    out = pw.warp_banded(img, x, y, dot_dtype=jnp.float32, interpret=True,
                         xwin=XWIN, ywin=YWIN)
    ref = _resample_bilinear_4gather(img, x, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-6)


def test_tiled_coord_gradients(img, rng):
    xs, ys = _grid()
    x, y = CASES["coherent"](rng, xs, ys)
    c = jnp.stack([jnp.asarray(x.astype(np.float32)),
                   jnp.asarray(y.astype(np.float32))])

    def loss_t(c):
        o = pw.warp_banded(img, c[0], c[1], dot_dtype=jnp.float32,
                           interpret=True, xwin=XWIN, ywin=YWIN)
        return jnp.sum(o ** 2)

    def loss_o(c):
        return jnp.sum(_resample_bilinear_4gather(img, c[0], c[1]) ** 2)

    gt = jax.grad(loss_t)(c)
    go = jax.grad(loss_o)(c)
    scale = max(1.0, float(jnp.abs(go).max()))
    np.testing.assert_allclose(np.asarray(gt), np.asarray(go),
                               atol=1e-5 * scale)


def test_tiled_image_gradients(img, rng):
    """The image cotangent (gather-transpose branch) matches the oracle."""
    xs, ys = _grid()
    x, y = CASES["coherent"](rng, xs, ys)
    x = jnp.asarray(x.astype(np.float32))
    y = jnp.asarray(y.astype(np.float32))

    def loss_t(im):
        o = pw.warp_banded(im, x, y, dot_dtype=jnp.float32, interpret=True,
                           xwin=XWIN, ywin=YWIN)
        return jnp.sum(o ** 2)

    def loss_o(im):
        return jnp.sum(_resample_bilinear_4gather(im, x, y) ** 2)

    gt = jax.grad(loss_t)(img)
    go = jax.grad(loss_o)(img)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(go), atol=1e-4)


@pytest.mark.parametrize("case", ["coherent", "bidirectional-large"])
def test_tiled_tile_h16(case, img, rng):
    """tile_h=16 (the sweepable v2 tile height, threaded as a parameter):
    forward and coordinate gradients stay oracle-exact — 16-row tiles halve
    the per-tile overhead but tighten the y-spread budget, so both a
    no-flag and a heavy-flag regime are pinned."""
    xs, ys = _grid()
    x, y = CASES[case](rng, xs, ys)
    c = jnp.stack([jnp.asarray(np.asarray(x, np.float32)),
                   jnp.asarray(np.asarray(y, np.float32))])

    out = pw.warp_banded(img, c[0], c[1], dot_dtype=jnp.float32,
                         interpret=True, xwin=XWIN, ywin=YWIN, tile_h=16)
    ref = _resample_bilinear_4gather(img, c[0], c[1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-6)

    def loss_t(c):
        o = pw.warp_banded(img, c[0], c[1], dot_dtype=jnp.float32,
                           interpret=True, xwin=XWIN, ywin=YWIN, tile_h=16)
        return jnp.sum(o ** 2)

    def loss_o(c):
        return jnp.sum(_resample_bilinear_4gather(img, c[0], c[1]) ** 2)

    gt = jax.grad(loss_t)(c)
    go = jax.grad(loss_o)(c)
    scale = max(1.0, float(jnp.abs(go).max()))
    np.testing.assert_allclose(np.asarray(gt), np.asarray(go),
                               atol=1e-5 * scale)


@pytest.mark.parametrize("case", ["coherent", "bidirectional-large"])
def test_tiled_bwd_ywin(case, img, rng):
    """Backward-only narrow window (TPU.WARP_YWIN_BWD): the coordinate
    cotangents stay oracle-exact when the bwd kernel runs at ywin 48 under
    a ywin-96 forward — tiles whose spread exceeds the narrower bwd budget
    are re-flagged at 48 and take the whole-plane patch branch.  Both a
    no-flag and a heavy-flag regime are pinned (the bidirectional case
    flags most tiles at 48)."""
    xs, ys = _grid()
    x, y = CASES[case](rng, xs, ys)
    c = jnp.stack([jnp.asarray(np.asarray(x, np.float32)),
                   jnp.asarray(np.asarray(y, np.float32))])

    def loss_t(c):
        o = pw.warp_banded(img, c[0], c[1], dot_dtype=jnp.float32,
                           interpret=True, xwin=XWIN, ywin=YWIN, bwd_ywin=48)
        return jnp.sum(o ** 2)

    def loss_o(c):
        return jnp.sum(_resample_bilinear_4gather(img, c[0], c[1]) ** 2)

    gt = jax.grad(loss_t)(c)
    go = jax.grad(loss_o)(c)
    scale = max(1.0, float(jnp.abs(go).max()))
    np.testing.assert_allclose(np.asarray(gt), np.asarray(go),
                               atol=1e-5 * scale)


def test_image_grad_flag(img, rng):
    """``image_grad=False`` (the const-operand marker MotionLearning sets
    after stop-gradienting its warped RGBD): coordinate gradients stay
    oracle-exact and the image cotangent is exactly zero."""
    xs, ys = _grid()
    x, y = CASES["coherent"](rng, xs, ys)
    c = jnp.stack([jnp.asarray(x.astype(np.float32)),
                   jnp.asarray(y.astype(np.float32))])

    def loss_t(im, c):
        o = pw.warp_banded(im, c[0], c[1], dot_dtype=jnp.float32,
                           interpret=True, xwin=XWIN, ywin=YWIN,
                           image_grad=False)
        return jnp.sum(o ** 2)

    (gi, gc) = jax.grad(loss_t, argnums=(0, 1))(img, c)
    go = jax.grad(lambda c: jnp.sum(
        _resample_bilinear_4gather(img, c[0], c[1]) ** 2))(c)
    assert float(jnp.abs(gi).max()) == 0.0
    scale = max(1.0, float(jnp.abs(go).max()))
    np.testing.assert_allclose(np.asarray(gc), np.asarray(go),
                               atol=1e-5 * scale)


@pytest.mark.parametrize("case", sorted(CASES))
def test_image_cotangent_kernel(case, img, rng):
    """Scatter-free image-cotangent kernel vs the autodiff oracle
    (``jax.vjp`` of the exact 4-gather): every coord regime, f32 dots."""
    xs, ys = _grid()
    x, y = CASES[case](rng, xs, ys)
    x = jnp.asarray(np.asarray(x, np.float32))
    y = jnp.asarray(np.asarray(y, np.float32))
    ct = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))

    _, vjp = jax.vjp(lambda im: _resample_bilinear_4gather(im, x, y), img)
    (want,) = vjp(ct)
    got = pw.warp_image_cotangent(ct, x, y, H, dot_dtype=jnp.float32,
                                  interpret=True)
    # rtol covers f32 accumulation-order noise on heavily-collided pixels
    # (wild coords concentrate hundreds of contributions onto one pixel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-5)


def test_image_cotangent_kernel_unaligned(rng):
    """Unaligned Ho/W and Ho != Hin: padding must contribute zeros."""
    Ho, Hin, Wn = 52, 44, 300
    img = jnp.asarray(rng.rand(2, Hin, Wn, 3).astype(np.float32))
    x = jnp.asarray((rng.rand(2, Ho, Wn) * (Wn + 6) - 3).astype(np.float32))
    y = jnp.asarray((rng.rand(2, Ho, Wn) * (Hin + 6) - 3).astype(np.float32))
    ct = jnp.asarray(rng.rand(2, Ho, Wn, 3).astype(np.float32))

    _, vjp = jax.vjp(lambda im: _resample_bilinear_4gather(im, x, y), img)
    (want,) = vjp(ct)
    got = pw.warp_image_cotangent(ct, x, y, Hin, dot_dtype=jnp.float32,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-5)


def test_small_width_routes_v1(rng):
    """Below V2_MIN_W the router keeps the v1 row-banded path (measured
    faster at 320-wide planes) and stays exact."""
    Wn = 384
    img = jnp.asarray(rng.rand(B, H, Wn, C).astype(np.float32))
    xs = np.tile(np.arange(Wn, dtype=np.float32), (B, H, 1))
    ys = np.tile(np.arange(H, dtype=np.float32)[:, None], (B, 1, Wn))
    x = jnp.asarray((xs - 4 * rng.rand(B, H, Wn)).astype(np.float32))
    y = jnp.asarray((ys + 2 * rng.rand(B, H, Wn)).astype(np.float32))
    out = pw.warp_banded(img, x, y, window=64, dot_dtype=jnp.float32,
                         interpret=True)
    ref = _resample_bilinear_4gather(img, x, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-6)
