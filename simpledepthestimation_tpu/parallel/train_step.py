"""SPMD train/eval step builders.

The TPU-native replacement for the reference's DDP step (reference
detectron2/engine/train_loop.py:217-249 + torch DDP gradient all-reduce):
one jitted function over a device mesh. The batch is sharded on the 'data'
axis, parameters are replicated; XLA derives the gradient ``psum`` over ICI
from the shardings — there is no explicit collective in user code.

Buffer donation (``TPU.DONATE``) makes the state update in-place in HBM.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from .mesh import data_sharding, replicated


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model, optimizer, sample_batch, rng, train: bool = True) -> TrainState:
    """Initialize parameters/batch-stats from a sample batch.

    ``train=False`` initializes through the inference path (eval-only /
    predictor entries, whose sample batches lack training-only keys like
    depth/ctx_img)."""
    variables = model.init(
        {"params": rng, "noise": jax.random.fold_in(rng, 1)}, sample_batch, train=train
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
    )


# Adaptive-window policy constants (docs/PERF.md round 5): switch to the
# narrow executable after this many consecutive flag-free steps, back to
# wide on the first flagged step.  The flag signals are consumed by a
# DAEMON THREAD (blocking device_get off the dispatch path): on the
# tunneled chip a single host↔device round trip costs ~0.4 s, and a
# first-design synchronous read 2 steps behind the front halved the
# flagship bench (152.8 → 69.4 img/s measured) — the policy must cost the
# step loop nothing.  The same thread eagerly compiles the narrow
# executable so the switch never stalls the training stream.
_ADAPT_LAG = 2
_ADAPT_DOWN_STREAK = 3


def _adapt_update(adapt: dict, frac: float) -> None:
    """One adaptive-window policy transition from an observed narrow-window
    flag fraction: any flagged tile retreats to wide immediately (a flagged
    step under narrow pays whole-plane patch tiles); ``_ADAPT_DOWN_STREAK``
    consecutive flag-free steps switch to narrow."""
    if frac > 0.0:
        adapt["streak"] = 0
        adapt["narrow"] = False
    else:
        adapt["streak"] += 1
        if adapt["streak"] >= _ADAPT_DOWN_STREAK:
            adapt["narrow"] = True


def make_train_step(
    model,
    optimizer,
    mesh,
    donate: bool = True,
    grad_clip: float = 0.0,
    remat: bool = False,
    adaptive_ywin: int = -1,
):
    """Build the jitted SPMD train step.

    Returned fn: ``(state, batch, step_rng) -> (state, metrics)`` where batch
    is data-sharded and metrics is a dict of replicated scalars (total loss,
    each loss term, grad norm). Per-step scalar schedules (MotionLearning
    noise stddev / motion burn-in weight — reference
    projects/MotionLearning/train.py:105-114) ride in the batch dict as
    traced scalars; ``batch_sharding`` replicates them automatically.

    ``adaptive_ywin``: narrow v2 warp y-window candidate for the adaptive
    window policy (−1 = read cfg-configured ``TPU.WARP_YWIN_NARROW`` from
    the resample module, 0 = off).  When active (TPU only), the step is
    compiled at both the wide (configured) and narrow y-window; every step
    emits ``warp_narrow_frac`` — the fraction of warp tiles that would
    violate the NARROW window on that step's coords (cheap jnp predicate,
    computed identically in both variants) — and the host switches to the
    narrow executable after ``_ADAPT_DOWN_STREAK`` consecutive flag-free
    steps, back to wide on the first flagged one (hysteresis, read
    ``_ADAPT_LAG`` steps behind).  Narrow halves the warp dot's M-dim
    (+8.5% measured at the flagship shape in the flag-free regime); a
    flagged step under narrow pays per-tile whole-plane patches, hence the
    immediate retreat (docs/PERF.md round-4/5 ywin measurements).
    """
    from ..ops import resample

    if adaptive_ywin < 0:
        # auto: cfg-configured narrow window, TPU only (the banded kernel —
        # and therefore the window choice — exists only on the TPU backend;
        # an explicit adaptive_ywin > 0 is honored anywhere for tests)
        adaptive_ywin = (
            resample.configured_narrow_ywin()
            if jax.default_backend() == "tpu"
            else 0
        )
    adaptive = adaptive_ywin > 0

    def make_step_fn(ywin_active: int):
        """Step variant traced at ``ywin_active`` (0 = module default)."""

        def apply_model(params, batch_stats, batch, step_rng):
            variables = {"params": params}
            mutable = []
            if batch_stats:
                variables["batch_stats"] = batch_stats
                mutable = ["batch_stats"]
            with resample.warp_trace_overrides(
                ywin=ywin_active, flag_ywin=adaptive_ywin if adaptive else 0
            ) as tap:
                outputs, new_vars = model.apply(
                    variables,
                    batch,
                    train=True,
                    mutable=mutable,
                    rngs={"noise": step_rng},
                )
            if tap:
                # trace-time side channel: the policy only runs when the
                # step actually contains a v2-eligible warp — otherwise the
                # "narrow" variant would be an identical recompile for a
                # constant-zero signal
                had_v2_warp["v"] = True
            if adaptive:
                outputs = dict(outputs)
                # max over warp calls: the policy must stay wide if ANY
                # v2-eligible plane would flag at the narrow window
                outputs["warp_narrow_frac"] = (
                    jnp.max(jnp.stack(tap)) if tap else jnp.zeros((), jnp.float32)
                )
            return outputs, new_vars

        if remat:
            # trade FLOPs for HBM: recompute the forward during backprop
            # (cfg TPU.REMAT; the jax.checkpoint analog of activation
            # checkpointing)
            apply_model = jax.checkpoint(apply_model, static_argnums=())

        def loss_fn(params, batch_stats, batch, step_rng):
            outputs, new_vars = apply_model(params, batch_stats, batch, step_rng)
            total = jnp.sum(
                jnp.stack([v for k, v in outputs.items() if "loss" in k])
            )
            new_stats = new_vars.get("batch_stats", batch_stats) if batch_stats else batch_stats
            return total, (outputs, new_stats)

        def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], step_rng) -> Tuple[TrainState, Dict]:
            (total, (loss_dict, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, batch, step_rng)

            grad_norm = optax.global_norm(grads)
            if grad_clip > 0.0:
                scale = jnp.minimum(1.0, grad_clip / (grad_norm + 1e-12))
                grads = jax.tree_util.tree_map(lambda g: g * scale, grads)

            updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)

            new_state = TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt_state,
            )
            metrics = {"total_loss": total, "grad_norm": grad_norm}
            metrics.update(loss_dict)
            return new_state, metrics

        return step_fn

    rep = replicated(mesh)
    dsh = data_sharding(mesh)

    def batch_sharding(batch):
        n = mesh.shape.get("data", 1)
        return {
            k: (dsh if (hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] % n == 0) else rep)
            for k, v in batch.items()
        }

    def compile_for(batch, ywin_active: int = 0):
        return jax.jit(
            make_step_fn(ywin_active),
            in_shardings=(rep, batch_sharding(batch), rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,) if donate else (),
        )

    # cache one compiled step per (batch structure, active window)
    _cache: Dict[Tuple, Callable] = {}

    # host-side adaptive state (shared across batch structures: the signal
    # is per-trajectory, not per-shape)
    adapt = {"narrow": False, "streak": 0, "seq": 0}
    # set during tracing of the first (wide) variant; the policy stays off
    # for models whose step never takes the v2 tiled-warp route (supervised
    # families, planes narrower than V2_MIN_W)
    had_v2_warp = {"v": False}
    worker = {"queue": None, "thread": None}

    def _signal_worker(q):
        """Daemon loop draining flag signals.  Signals are COALESCED: the
        tunnel fetch (~0.4 s) can be slower than a step, so each cycle
        drops all but the newest queued signal — the hysteresis then
        counts drain cycles rather than exact steps, which only makes
        switching more conservative."""
        import queue as _queue

        while True:
            payload = q.get()
            if payload is None:
                return
            try:
                while True:
                    payload = q.get_nowait()
            except _queue.Empty:
                pass
            try:
                _adapt_update(adapt, float(jax.device_get(payload)))
            except Exception:
                pass  # fetch raced an invalidated buffer: skip

    def _ensure_worker():
        if worker["thread"] is None:
            import queue as _queue
            import threading

            worker["queue"] = _queue.Queue()
            worker["thread"] = threading.Thread(
                target=_signal_worker, args=(worker["queue"],), daemon=True,
                name="adaptive-warp-signals",
            )
            worker["thread"].start()

    def run(state, batch, step_rng):
        # strip host-only entries (metadata lists etc.) before tracing
        batch = {k: v for k, v in batch.items() if hasattr(v, "shape")}
        base_key = tuple(
            sorted((k, v.shape, str(v.dtype)) for k, v in batch.items())
        )
        ywin_active = 0
        if adaptive and had_v2_warp["v"]:
            narrow_key = base_key + (adaptive_ywin,)
            if narrow_key not in _cache:
                # Dispatch the narrow variant ONCE, now: it is exact in
                # every coord regime (flagged tiles take the whole-plane
                # patch branch), so this is a normal training step that
                # happens to compile the second executable — the compile
                # lands at call 2 (warmup territory for the benches, the
                # startup phase for do_train), never mid-run.  From then
                # on switching is free.
                ywin_active = adaptive_ywin
            elif adapt["narrow"]:
                ywin_active = adaptive_ywin
        key = base_key + (ywin_active,)
        if key not in _cache:
            _cache[key] = compile_for(batch, ywin_active)
        out_state, metrics = _cache[key](state, batch, step_rng)
        if adaptive and had_v2_warp["v"]:
            _ensure_worker()
            worker["queue"].put(metrics["warp_narrow_frac"])
            adapt["seq"] += 1
        return out_state, metrics

    run.adapt = adapt  # introspection (tests, bench instrumentation)
    run.had_v2 = had_v2_warp
    run.cache = _cache
    return run


def make_eval_step(model, mesh):
    """Jitted eval forward: ``(state, batch) -> depth_pred``.

    Batched eval (``TEST.IMS_PER_BATCH`` ≥ mesh size) shards the batch over
    the data axis so every chip computes its shard; the reference's bs=1
    protocol (reference data/build.py:130-132) falls back to replicated
    execution. One compiled executable is cached per batch structure
    (exposed as ``run.cache``), so periodic eval across epochs and repeated
    ``do_test`` calls reuse the same executable without retracing."""
    rep = replicated(mesh)
    dsh = data_sharding(mesh)
    n = mesh.shape.get("data", 1)

    def eval_fn(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, batch, train=False)
        return out["depth_pred"]

    cache: Dict[Tuple, Callable] = {}

    def run(state: TrainState, batch):
        batch = {k: v for k, v in batch.items() if hasattr(v, "shape")}
        key = tuple(sorted((k, tuple(v.shape), str(v.dtype)) for k, v in batch.items()))
        if key not in cache:
            bsh = {
                k: (dsh if (v.ndim >= 1 and v.shape[0] % n == 0) else rep)
                for k, v in batch.items()
            }
            cache[key] = jax.jit(eval_fn, in_shardings=(rep, rep, bsh))
        return cache[key](state.params, state.batch_stats, batch)

    run.cache = cache
    return run


def make_precise_bn_fn(model):
    """Build the (cacheable) jitted one-batch stats update for
    :func:`compute_precise_bn_stats`. Params are a traced argument — not a
    closure capture — so the caller can reuse one compiled function across
    eval periods without retracing or baking parameters in as constants."""

    @jax.jit
    def stats_after(params, stats, batch, key):
        _, mut = model.apply(
            {"params": params, "batch_stats": stats},
            batch,
            train=True,
            mutable=["batch_stats"],
            rngs={"noise": key},
        )
        return mut["batch_stats"]

    return stats_after


def compute_precise_bn_stats(model, state: TrainState, batches, rng=None, stats_after=None):
    """True-average BatchNorm statistics over ``batches`` (the functional
    analog of fvcore's ``update_bn_stats`` used by the reference PreciseBN
    hook, reference detectron2/engine/hooks.py:381-450).

    Flax BN updates are EMAs ``new = m·old + (1−m)·B`` with a per-module
    momentum ``m`` fixed at construction. Rather than threading momenta out
    of every module, recover them elementwise with two calibration applies
    on the same batch: from zeroed stats ``z = (1−m)·B`` and from all-ones
    stats ``o = m + (1−m)·B``, so ``m = o − z``. Each batch applied from
    zeroed stats then yields ``B_i = z_i / (1−m)``, and the true average is
    ``mean_i(z_i) / (1−m)``.

    Leaves that never update (FrozenBatchNorm / BN_NO_TRACK read their
    stored stats in the forward pass) must NOT be perturbed — zeroing them
    would corrupt activations feeding downstream tracking BNs. A first apply
    from the true stats identifies the updating leaves; only those are
    calibrated. Frozen leaves then pass through every apply unchanged
    (``m = 0``, ``z_i = s0``), so the average returns exactly their current
    values.

    ``batches`` is consumed as a stream (one batch of host memory at a
    time — fvcore's ``update_bn_stats`` streams the same way); only the
    first batch is retained for the calibration applies. ``stats_after``
    (from :func:`make_precise_bn_fn`) can be passed in to reuse one
    compiled update across calls. Returns the new batch_stats tree; caller
    swaps it into the train state.
    """
    stats0 = state.batch_stats
    if not stats0:
        return stats0
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if stats_after is None:
        stats_after = make_precise_bn_fn(model)

    tmap = jax.tree_util.tree_map

    def clean(batch):
        return {k: v for k, v in batch.items() if hasattr(v, "shape")}

    it = iter(batches)
    try:
        first = clean(next(it))
    except StopIteration:
        return stats0

    params = state.params
    n1 = stats_after(params, stats0, first, rng)
    updating = tmap(lambda a, b: jnp.any(a != b), stats0, n1)
    zeros = tmap(lambda u, s: jnp.where(u, jnp.zeros_like(s), s), updating, stats0)
    ones = tmap(lambda u, s: jnp.where(u, jnp.ones_like(s), s), updating, stats0)

    z0 = stats_after(params, zeros, first, rng)
    o0 = stats_after(params, ones, first, rng)
    momentum = tmap(lambda a, b: b - a, z0, o0)  # 0 on frozen leaves

    total = z0
    n = 1
    for batch in it:
        zi = stats_after(params, zeros, clean(batch), jax.random.fold_in(rng, n))
        total = tmap(jnp.add, total, zi)
        n += 1

    return tmap(
        lambda t, m, s0, u: jnp.where(
            u & (1.0 - m > 1e-6), (t / float(n)) / jnp.maximum(1.0 - m, 1e-6), s0
        ),
        total,
        momentum,
        stats0,
        updating,
    )


def place_replicated(tree, mesh):
    """Place every leaf of a pytree replicated on the mesh (used after a
    checkpoint restore, which yields host/single-device arrays, and to
    globalize the freshly-initialized state at world > 1 — init is
    seed-deterministic, so every process holds the same host-local value)."""
    from .mesh import is_multiprocess_mesh

    rep = replicated(mesh)
    if is_multiprocess_mesh(mesh):
        from jax.experimental import multihost_utils
        from jax.sharding import PartitionSpec as P

        return jax.tree_util.tree_map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, P()
            ),
            tree,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x) if not hasattr(x, "devices") else x, rep),
        tree,
    )


def host_local_tree(tree):
    """Fetch every leaf to host memory. Replicated global (multi-process)
    arrays resolve to their local replica — the inverse of
    :func:`place_replicated`, used to hand a global train state to per-rank
    local computations (multi-host eval, checkpoint templates)."""

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return np.asarray(x.addressable_data(0))
        return np.asarray(x) if hasattr(x, "shape") else x

    return jax.tree_util.tree_map(fetch, tree)
