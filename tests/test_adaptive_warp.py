"""Adaptive warp-window policy (round 5, TPU.WARP_YWIN_NARROW).

The train step compiles wide/narrow v2-warp variants and switches on the
per-step would-be flag fraction at the narrow candidate window
(parallel/train_step.py).  These tests pin (a) the pure policy transitions
(hysteresis: 3 flag-free steps → narrow, any flagged step → wide),
(b) the config gating (gather impl / narrow ≥ wide disables), (c) the
trace-time override/tap scope restore, and (d) the end-to-end step loop on
the CPU mesh with the policy forced on: the metric is emitted every step
and the controller flips to the narrow executable after
(streak + lag) steps.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simpledepthestimation_tpu.ops import pallas_warp, resample
from simpledepthestimation_tpu.parallel import train_step as TS


def test_policy_transitions():
    adapt = {"narrow": False, "streak": 0, "seq": 0}
    for _ in range(TS._ADAPT_DOWN_STREAK - 1):
        TS._adapt_update(adapt, 0.0)
        assert not adapt["narrow"]
    TS._adapt_update(adapt, 0.0)
    assert adapt["narrow"]
    # stays narrow while flag-free
    TS._adapt_update(adapt, 0.0)
    assert adapt["narrow"]
    # a single flagged step retreats immediately and resets the streak
    TS._adapt_update(adapt, 0.01)
    assert not adapt["narrow"] and adapt["streak"] == 0


def test_configured_narrow_gating():
    try:
        resample.set_warp_impl("auto", ywin=96, ywin_narrow=48)
        assert resample.configured_narrow_ywin() == 48
        resample.set_warp_impl("auto", ywin_narrow=0)
        assert resample.configured_narrow_ywin() == 0
        resample.set_warp_impl("auto", ywin=48, ywin_narrow=48)
        assert resample.configured_narrow_ywin() == 0  # narrow >= wide
        resample.set_warp_impl("gather", ywin=96, ywin_narrow=48)
        assert resample.configured_narrow_ywin() == 0  # gather path
    finally:
        resample.set_warp_impl("auto", ywin=96, ywin_narrow=48)


def test_trace_overrides_restore():
    base = resample._WARP_YWIN
    with resample.warp_trace_overrides(ywin=48, flag_ywin=48) as tap:
        assert resample._WARP_YWIN == 48
        assert resample._WARP_FLAG_TAP is tap
        assert resample._WARP_FLAG_YWIN == 48
    assert resample._WARP_YWIN == base
    assert resample._WARP_FLAG_TAP is None
    # exception-safe restore
    with pytest.raises(RuntimeError):
        with resample.warp_trace_overrides(ywin=32):
            raise RuntimeError("boom")
    assert resample._WARP_YWIN == base


def test_flag_frac_regimes(rng):
    B, H, W = 2, 192, 640
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    x = jnp.broadcast_to(xx, (B, H, W))
    y = jnp.broadcast_to(yy, (B, H, W))
    img = jnp.ones((B, H, W, 3))
    assert float(pallas_warp.tile_flag_frac(img, x, y, 48, 512)) == 0.0
    ywild = jnp.asarray(rng.rand(B, H, W).astype(np.float32)) * (H - 1)
    assert float(pallas_warp.tile_flag_frac(img, x, ywild, 48, 512)) > 0.5


def test_step_loop_switches_to_narrow():
    """End-to-end on the CPU mesh with the policy forced on: the CPU
    backend takes the gather warp (no v2-eligible call → empty tap), so
    the policy must stay OFF by itself (a narrow variant would be an
    identical recompile); with the trace-time v2 marker forced, the
    controller must flip to the narrow executable after streak+lag steps —
    proving the metric plumbing, the lagged signal consumption, and that
    both compiled variants run the same model."""
    from simpledepthestimation_tpu.config import get_cfg
    from simpledepthestimation_tpu.models import build_model
    from simpledepthestimation_tpu.parallel import (
        build_mesh, create_train_state, make_train_step,
    )
    from simpledepthestimation_tpu.solver import build_optimizer

    cfg = get_cfg()
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.MODEL.META_ARCHITECTURE = "MonoDepth2Model"
    cfg.MODEL.DEPTH_NET.NAME = "DepthResNet"
    cfg.MODEL.DEPTH_NET.ENCODER_NAME = "18"
    cfg.MODEL.POSE_NET.NAME = "PoseNet"
    cfg.MODEL.POSE_NET.NUM_CONTEXTS = 2
    cfg.LOSS.NUM_SCALES = 1

    B, H, W = 2, 64, 96
    rng = np.random.RandomState(3)
    batch = {
        "img": rng.rand(B, H, W, 3).astype(np.float32),
        "img_orig": rng.rand(B, H, W, 3).astype(np.float32),
        "ctx_img": rng.rand(B, 2, H, W, 3).astype(np.float32),
        "ctx_img_orig": rng.rand(B, 2, H, W, 3).astype(np.float32),
        "intrinsics": np.tile(
            np.array([[[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]]],
                     np.float32),
            (B, 1, 1),
        ),
    }
    model = build_model(cfg)
    optimizer, _ = build_optimizer(cfg, steps_per_epoch=10)
    mesh = build_mesh(("data",), (len(jax.devices()),))
    state = create_train_state(model, optimizer, batch, jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer, mesh, donate=False,
                           adaptive_ywin=48)
    key = jax.random.PRNGKey(1)
    losses = []
    # no v2-eligible warp on the CPU path: the policy must not engage
    state, m = step(state, batch, jax.random.fold_in(key, 0))
    assert not step.had_v2["v"]
    for i in range(1, TS._ADAPT_DOWN_STREAK + TS._ADAPT_LAG + 2):
        state, m = step(state, batch, jax.random.fold_in(key, i))
    assert not step.adapt["narrow"] and step.adapt["seq"] == 0

    # force the trace-time v2 marker: the very next call must dispatch the
    # narrow executable once (it is exact in every regime — flagged tiles
    # take the whole-plane patch branch — so the second compile lands in
    # warmup territory, never mid-run), and the constantly-zero signal,
    # fetched by the daemon thread (a synchronous per-step device_get
    # halved flagship throughput over the tunnel), must then flip the
    # controller to keep dispatching it.
    import time

    step.had_v2["v"] = True
    narrow_key = tuple(
        sorted((k, v.shape, str(v.dtype)) for k, v in batch.items())
    ) + (48,)
    state, m = step(state, batch, jax.random.fold_in(key, 100))
    losses.append(float(m["total_loss"]))
    assert "warp_narrow_frac" in m and float(m["warp_narrow_frac"]) == 0.0
    assert narrow_key in step.cache  # the one-time narrow dispatch compiled it
    deadline = time.time() + 120
    i = 0
    while time.time() < deadline and not step.adapt["narrow"]:
        state, m = step(state, batch, jax.random.fold_in(key, 101 + i))
        i += 1
        losses.append(float(m["total_loss"]))
        time.sleep(0.05)
    assert step.adapt["narrow"], step.adapt
    # dispatch leg: with the policy narrow, the next call routes to the
    # narrow executable
    calls = []
    real = step.cache[narrow_key]
    step.cache[narrow_key] = lambda *a: (calls.append(1), real(*a))[1]
    state, m = step(state, batch, jax.random.fold_in(key, 999))
    assert calls == [1]
    losses.append(float(m["total_loss"]))
    assert all(np.isfinite(l) for l in losses)
    # the frac metric must not leak into the summed total
    assert "total_loss" in m and float(m["total_loss"]) == pytest.approx(
        sum(float(m[k]) for k in m if k.endswith("loss") and k != "total_loss"),
        rel=1e-5,
    )
