"""Hook library.

Parity with reference detectron2/engine/hooks.py:23-450: CallbackHook,
IterationTimer (hook-overhead-excluding step timing with warmup),
PeriodicWriter, PeriodicCheckpointer-as-hook, LRScheduler (logs the schedule
value), EvalHook (every N epochs + final), PreciseBN (functional
true-average BN statistics recompute), and the profiler hook —
``JaxProfiler`` wraps ``jax.profiler`` trace collection (Perfetto/XProf)
replacing torch's AutogradProfiler Chrome traces.
"""

from __future__ import annotations

import datetime
import logging
import os
import time
from typing import Callable

from .train_loop import HookBase
from ..utils import comm

logger = logging.getLogger(__name__)


class CallbackHook(HookBase):
    def __init__(self, *, before_train=None, after_train=None, before_step=None, after_step=None):
        self._before_train = before_train
        self._after_train = after_train
        self._before_step = before_step
        self._after_step = after_step

    def before_train(self):
        if self._before_train:
            self._before_train(self.trainer)

    def after_train(self):
        if self._after_train:
            self._after_train(self.trainer)

    def before_step(self):
        if self._before_step:
            self._before_step(self.trainer)

    def after_step(self):
        if self._after_step:
            self._after_step(self.trainer)


class IterationTimer(HookBase):
    """Per-step time excluding other hooks' overhead, with warmup exclusion
    and an end-of-training summary (reference hooks.py:77-147)."""

    def __init__(self, warmup_iter: int = 3):
        self._warmup_iter = warmup_iter
        self._start_time = time.perf_counter()
        self._total_timer_sum = 0.0
        self._step_timer = 0.0
        self._steps_done = 0

    def before_train(self):
        self._start_time = time.perf_counter()
        self._total_timer_sum = 0.0
        self._steps_done = 0

    def after_train(self):
        total_time = time.perf_counter() - self._start_time
        num_iter = self.trainer.iter + 1 - self.trainer.start_iter - self._warmup_iter
        if num_iter > 0 and self._total_timer_sum > 0:
            logger.info(
                "Overall training speed: {} iterations in {} ({:.4f} s / it)".format(
                    num_iter,
                    str(datetime.timedelta(seconds=int(self._total_timer_sum))),
                    self._total_timer_sum / num_iter,
                )
            )
        logger.info(
            "Total training time: {}".format(
                str(datetime.timedelta(seconds=int(total_time)))
            )
        )

    def before_step(self):
        self._step_timer = time.perf_counter()

    def after_step(self):
        sec = time.perf_counter() - self._step_timer
        iter_done = self.trainer.iter - self.trainer.start_iter + 1
        if iter_done > self._warmup_iter:
            self._total_timer_sum += sec
            self.trainer.storage.put_scalars(time=sec)


class PeriodicWriter(HookBase):
    """Write events every ``period`` steps and after the last
    (reference hooks.py:149-180)."""

    def __init__(self, writers, period: int = 20):
        self._writers = writers
        self._period = period

    def after_step(self):
        if (self.trainer.iter + 1) % self._period == 0 or (
            self.trainer.iter == self.trainer.max_iter - 1
        ):
            if hasattr(self.trainer, "drain_all"):
                self.trainer.drain_all()
            for writer in self._writers:
                writer.write()

    def after_train(self):
        for writer in self._writers:
            writer.write()
            writer.close()


class LRSchedulerHook(HookBase):
    """Log the LR from an optax schedule fn (reference hooks.py:202-254
    summarizes the best param group; here the schedule is explicit)."""

    def __init__(self, schedule: Callable):
        self._schedule = schedule

    def after_step(self):
        lr = float(self._schedule(self.trainer.iter))
        self.trainer.storage.put_scalar("lr", lr, smoothing_hint=False)


class PeriodicCheckpointerHook(HookBase):
    """Epoch-period checkpointing driven from iteration counts."""

    def __init__(self, periodic_checkpointer, steps_per_epoch: int):
        self._pc = periodic_checkpointer
        self._steps_per_epoch = max(steps_per_epoch, 1)

    def after_step(self):
        it = self.trainer.iter + 1
        if it % self._steps_per_epoch == 0:
            epoch = it // self._steps_per_epoch - 1
            self._pc.step(epoch, self.trainer.state)


class PreciseBN(HookBase):
    """Recompute true-average BatchNorm statistics over ``num_iter`` train
    batches on the same schedule as eval, so evaluation runs on exact
    (non-EMA) statistics (reference detectron2/engine/hooks.py:381-450).

    Registered before EvalHook so the refreshed stats land in the same-step
    evaluation. The stats swap happens functionally: the recomputed tree
    replaces ``trainer.state.batch_stats``.
    """

    def __init__(self, period_epochs: int, steps_per_epoch: int, loader, num_iter: int):
        self._period = period_epochs
        self._steps_per_epoch = max(steps_per_epoch, 1)
        self._loader = loader
        self._num_iter = num_iter
        self._disabled = False
        self._stats_after = None  # compiled update, reused across firings

    def _update_stats(self):
        if self._disabled:
            return
        import itertools

        import jax

        from ..parallel import compute_precise_bn_stats, make_precise_bn_fn

        state = self.trainer.state
        if not state.batch_stats:
            logger.info("PreciseBN: model has no batch_stats; hook disabled")
            self._disabled = True
            return
        if self._stats_after is None:
            self._stats_after = make_precise_bn_fn(self.trainer.model)
        logger.info(
            f"PreciseBN: recomputing statistics over {self._num_iter} batches"
        )
        # stream, don't materialize: one host batch in flight at a time
        batches = itertools.islice(iter(self._loader), self._num_iter)
        new_stats = compute_precise_bn_stats(
            self.trainer.model, state, batches, stats_after=self._stats_after
        )
        if comm.get_world_size() > 1:
            # each process computed stats over its own loader shard; average
            # across hosts so replicated batch_stats stay bit-identical
            import numpy as np

            gathered = comm.all_gather(
                jax.tree_util.tree_map(lambda x: np.asarray(x), new_stats)
            )
            new_stats = jax.tree_util.tree_map(
                lambda *xs: np.mean(np.stack(xs), axis=0), *gathered
            )
        self.trainer.state = state.replace(batch_stats=new_stats)

    def after_step(self):
        if self._period <= 0:
            return
        it = self.trainer.iter + 1
        is_final = it == self.trainer.max_iter
        if is_final or it % (self._period * self._steps_per_epoch) == 0:
            self._update_stats()


class EvalHook(HookBase):
    """Run eval_fn every ``eval_period`` epochs and after training
    (reference hooks.py:321-378); results go into EventStorage."""

    def __init__(self, eval_period_epochs: int, steps_per_epoch: int, eval_fn: Callable):
        self._period = eval_period_epochs
        self._steps_per_epoch = max(steps_per_epoch, 1)
        self._eval_fn = eval_fn

    def _do_eval(self):
        results = self._eval_fn()
        if results:
            flat = {}
            for task, metrics in results.items():
                if isinstance(metrics, dict):
                    for k, v in metrics.items():
                        flat[f"{task}/{k}"] = float(v)
            if flat:
                self.trainer.storage.put_scalars(**flat, smoothing_hint=False)
        comm.synchronize()

    def after_step(self):
        if self._period <= 0:
            return
        it = self.trainer.iter + 1
        if it % (self._period * self._steps_per_epoch) == 0 and it != self.trainer.max_iter:
            self._do_eval()

    def after_train(self):
        if self._period > 0 and self.trainer.iter == self.trainer.max_iter:
            self._do_eval()


class JaxProfiler(HookBase):
    """Collect a device trace over predicate-selected iterations
    (reference AutogradProfiler, hooks.py:257-318). Output is viewable in
    Perfetto / XProf / TensorBoard's profile plugin."""

    def __init__(self, enable_predicate: Callable[["HookBase"], bool], output_dir: str):
        self._enable_predicate = enable_predicate
        self._output_dir = output_dir
        self._active = False

    def before_step(self):
        if self._enable_predicate(self.trainer):
            import jax

            trace_dir = os.path.join(
                self._output_dir, f"profiler-trace-iter{self.trainer.iter}"
            )
            os.makedirs(trace_dir, exist_ok=True)
            jax.profiler.start_trace(trace_dir)
            self._active = True

    def after_step(self):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            logger.info(f"Saved profiler trace for iteration {self.trainer.iter}")
