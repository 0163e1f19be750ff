"""Banded MXU warp kernel vs the exact gather oracle (interpret mode on CPU;
the same kernel compiles natively on TPU).

The kernel replaces the gather at the heart of view_synthesis (reference
detectron2/geometry/camera.py:196 ``F.grid_sample``) with one-hot matmuls
over two dynamically-placed half-windows; these tests pin (a) exact
forward parity including zeros-padding corners, (b) coordinate and image
gradients vs the oracle, (c) bimodal (border-clip) coverage, (d) the
violation predicate + whole-plane-window escape.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simpledepthestimation_tpu.ops.pallas_warp import (
    eligible,
    warp_banded,
    warp_banded_raw,
)
from simpledepthestimation_tpu.ops.resample import _resample_bilinear_4gather

BAND = dict(window=32)


def ego_coords(rng, B, H, W, dy=4.0, dx=6.0, oob_x=False):
    """Near-diagonal coordinates like an ego-motion warp produces."""
    xs = np.tile(np.arange(W, dtype=np.float32), (B, H, 1))
    ys = np.tile(np.arange(H, dtype=np.float32)[:, None], (B, 1, W))
    x = xs + dx * (rng.rand(B, H, W).astype(np.float32) - 0.5)
    y = ys + dy * (rng.rand(B, H, W).astype(np.float32) - 0.5)
    if oob_x:
        x[:, :, :2] = -1.5  # fades out via zeros padding
        x[:, :, -2:] = W + 0.25
    return jnp.asarray(x), jnp.asarray(y)


def test_forward_matches_oracle_interpret(rng):
    B, H, W, C = 2, 16, 32, 3
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    x, y = ego_coords(rng, B, H, W, oob_x=True)
    ref = np.asarray(_resample_bilinear_4gather(img, x, y))
    out, viol = warp_banded_raw(img, x, y, interpret=True, **BAND)
    assert not bool(viol)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_top_bottom_edge_zeros_padding(rng):
    """y corners just outside the image (but inside the band window) must
    fade to zero exactly as grid_sample's zeros padding."""
    B, H, W, C = 1, 16, 32, 2
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    xs = np.tile(np.arange(W, dtype=np.float32), (B, H, 1))
    ys = np.tile(np.arange(H, dtype=np.float32)[:, None], (B, 1, W))
    y = ys.copy()
    y[:, 0] = -0.75   # top row samples above the image
    y[:, -1] = H - 0.5  # bottom row samples below
    x, y = jnp.asarray(xs), jnp.asarray(y)
    ref = np.asarray(_resample_bilinear_4gather(img, x, y))
    out, viol = warp_banded_raw(img, x, y, interpret=True, **BAND)
    assert not bool(viol)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_gradients_match_oracle(rng):
    B, H, W, C = 2, 16, 32, 3
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    x, y = ego_coords(rng, B, H, W)

    def loss_banded(im, xx, yy):
        return jnp.sum(warp_banded(im, xx, yy, interpret=True, **BAND) ** 2)

    def loss_oracle(im, xx, yy):
        return jnp.sum(_resample_bilinear_4gather(im, xx, yy) ** 2)

    g = jax.grad(loss_banded, argnums=(0, 1, 2))(img, x, y)
    g_ref = jax.grad(loss_oracle, argnums=(0, 1, 2))(img, x, y)
    for got, ref, name in zip(g, g_ref, ("image", "x", "y")):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-4, err_msg=name
        )


def test_bimodal_border_clip_no_violation(rng):
    """The early-training clip regime: one tile samples rows clipped to
    both image borders (bimodal). The two half-windows must cover both
    clusters — no violation, exact result (a single min-anchored window
    cannot span this without paying the whole-plane cost)."""
    B, H, W, C = 1, 64, 32, 3
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    x, y = ego_coords(rng, B, H, W)
    y = y.at[0, 8:16, ::2].set(0.0)       # clipped to the top border
    y = y.at[0, 8:16, 1::2].set(H - 1.0)  # clipped to the bottom border
    ref = np.asarray(_resample_bilinear_4gather(img, x, y))
    out, viol = warp_banded_raw(img, x, y, interpret=True, **BAND)
    assert not bool(viol)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_violation_routes_to_wide_window(rng):
    """THREE distant row clusters in one tile overwhelm both half-windows:
    the predicate must fire, and warp_banded must escape to the whole-plane
    window pair with identical output and gradients."""
    B, H, W, C = 1, 64, 32, 3
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    x, y = ego_coords(rng, B, H, W)
    y = y.at[0, :8, ::3].set(2.0)
    y = y.at[0, :8, 1::3].set(30.0)
    y = y.at[0, :8, 2::3].set(60.0)

    _, viol = warp_banded_raw(img, x, y, interpret=True, **BAND)
    assert bool(viol)

    out = warp_banded(img, x, y, interpret=True, **BAND)
    ref = _resample_bilinear_4gather(img, x, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    g = jax.grad(
        lambda xx: jnp.sum(warp_banded(img, xx, y, interpret=True, **BAND) ** 2)
    )(x)
    g_ref = jax.grad(
        lambda xx: jnp.sum(_resample_bilinear_4gather(img, xx, y) ** 2)
    )(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=2e-4)


def test_large_uniform_displacement_no_violation(rng):
    """The random-init regime: depth ~0.2m everywhere displaces every pixel
    ~25+ rows COHERENTLY. The dynamic window must follow the displacement
    (no violation, exact result) — the static-band variant fell back to the
    gather here and silently doubled the step cost."""
    B, H, W, C = 1, 64, 32, 3
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    xs = np.tile(np.arange(W, dtype=np.float32), (B, H, 1))
    ys = np.tile(np.arange(H, dtype=np.float32)[:, None], (B, 1, W))
    x = jnp.asarray(xs + rng.randn(B, H, W).astype(np.float32))
    y = jnp.asarray(np.clip(ys + 30.0 + 0.5 * rng.randn(B, H, W), 0, H - 1
                            ).astype(np.float32))
    ref = np.asarray(_resample_bilinear_4gather(img, x, y))
    out, viol = warp_banded_raw(img, x, y, interpret=True, **BAND)
    assert not bool(viol)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_bf16_dot_is_close(rng):
    """bf16 one-hot matmuls: indicators are exact in bf16; only the interp
    weights lose mantissa, bounding the error at ~1e-2 of the value scale."""
    B, H, W, C = 1, 16, 32, 3
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    x, y = ego_coords(rng, B, H, W)
    ref = np.asarray(_resample_bilinear_4gather(img, x, y))
    out, viol = warp_banded_raw(
        img, x, y, dot_dtype=jnp.bfloat16, interpret=True, **BAND
    )
    assert not bool(viol)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-2)


def test_unaligned_shapes_are_padded(rng):
    """H not ×8 / W not ×128 goes through the zero-pad path (the 416-wide
    MotionLearning plane case) and still matches the oracle, incl. grads."""
    B, H, W, C = 1, 12, 40, 3
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    x, y = ego_coords(rng, B, H, W)
    ref = np.asarray(_resample_bilinear_4gather(img, x, y))
    out = warp_banded(img, x, y, interpret=True, **BAND)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    g = jax.grad(
        lambda yy: jnp.sum(warp_banded(img, x, yy, interpret=True, **BAND) ** 2)
    )(y)
    g_ref = jax.grad(
        lambda yy: jnp.sum(_resample_bilinear_4gather(img, x, yy) ** 2)
    )(y)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=2e-4)


def test_router_gather_paths(rng, monkeypatch):
    """resample_bilinear routes by index count and honors set_warp_impl."""
    from simpledepthestimation_tpu.ops import resample

    B, H, W, C = 2, 8, 16, 3
    img = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    x, y = ego_coords(rng, B, H, W, dy=2.0, dx=2.0)
    ref = np.asarray(_resample_bilinear_4gather(img, x, y))

    # below threshold: packed; above (forced): 4gather — identical results
    for thresh in (10**9, 1):
        monkeypatch.setattr(resample, "_PACKED_MAX_INDICES", thresh)
        got = np.asarray(resample.resample_bilinear(img, x, y))
        np.testing.assert_allclose(got, ref, atol=1e-6)

    resample.set_warp_impl("gather")
    try:
        got = np.asarray(resample.resample_bilinear(img, x, y))
        np.testing.assert_allclose(got, ref, atol=1e-6)
    finally:
        resample.set_warp_impl("auto")

    with pytest.raises(ValueError):
        resample.set_warp_impl("texture_units")


def test_strict_parity_forces_gather_impl():
    from simpledepthestimation_tpu.config import get_cfg
    from simpledepthestimation_tpu.models import build_model
    from simpledepthestimation_tpu.ops import resample

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "SupDepthModel"
    cfg.MODEL.DEPTH_NET.NAME = "DepthResNet"
    cfg.MODEL.DEPTH_NET.ENCODER_NAME = "18"
    cfg.PARITY.STRICT = True
    try:
        build_model(cfg)
        assert resample._WARP_IMPL == "gather"
    finally:
        resample.set_warp_impl("auto")


def test_eligibility():
    img = jnp.zeros((2, 16, 128, 3))
    ok = jnp.zeros((2, 16, 128))
    assert eligible(img, ok, ok)
    assert not eligible(img, jnp.zeros((2, 8, 128)), ok)  # resolution mismatch
    # alignment is no longer an eligibility concern (padded internally)
    assert eligible(jnp.zeros((2, 12, 100, 3)), jnp.zeros((2, 12, 100)),
                    jnp.zeros((2, 12, 100)))
