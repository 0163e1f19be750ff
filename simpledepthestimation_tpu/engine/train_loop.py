"""Hook protocol and trainer loop.

Parity with reference detectron2/engine/train_loop.py:18-341: ``HookBase``
(before/after train/step), ``TrainerBase`` (the iteration loop inside an
EventStorage context), and ``SimpleTrainer`` (one optimizer step per
iteration, per-process metric reduction, FloatingPointError on non-finite
loss). TPU adaptation: the step is a single jitted SPMD function; metric
device→host fetches are deferred a few steps so the accelerator pipeline is
never drained (the reference's per-step ``.item()`` sync has no analog cost
here). AMP is subsumed by bf16 compute dtype (``TPU.COMPUTE_DTYPE``) rather
than a separate AMPTrainer.
"""

from __future__ import annotations

import logging
import time
import weakref
from collections import deque
from typing import Callable, Dict, List, Optional

import jax
import numpy as np

from ..utils.events import EventStorage, get_event_storage

logger = logging.getLogger(__name__)


class HookBase:
    """before_train / after_train / before_step / after_step with a weakref
    back-pointer to the trainer (reference train_loop.py:18-75)."""

    trainer: "TrainerBase" = None

    def before_train(self):
        pass

    def after_train(self):
        pass

    def before_step(self):
        pass

    def after_step(self):
        pass


class TrainerBase:
    def __init__(self):
        self._hooks: List[HookBase] = []
        self.iter: int = 0
        self.start_iter: int = 0
        self.max_iter: int = 0
        self.storage: Optional[EventStorage] = None

    def register_hooks(self, hooks) -> None:
        hooks = [h for h in hooks if h is not None]
        for h in hooks:
            assert isinstance(h, HookBase)
            h.trainer = weakref.proxy(self)
        self._hooks.extend(hooks)

    def train(self, start_iter: int, max_iter: int) -> None:
        logger.info(f"Starting training from iteration {start_iter}")
        self.iter = self.start_iter = start_iter
        self.max_iter = max_iter

        with EventStorage(start_iter) as self.storage:
            try:
                self.before_train()
                for self.iter in range(start_iter, max_iter):
                    self.before_step()
                    self.run_step()
                    self.after_step()
                self.iter += 1
            except Exception:
                logger.exception("Exception during training:")
                raise
            finally:
                self.after_train()

    def before_train(self):
        for h in self._hooks:
            h.before_train()

    def after_train(self):
        self.storage.iter = self.iter
        for h in self._hooks:
            h.after_train()

    def before_step(self):
        self.storage.iter = self.iter
        for h in self._hooks:
            h.before_step()

    def after_step(self):
        for h in self._hooks:
            h.after_step()

    def run_step(self):
        raise NotImplementedError


class SimpleTrainer(TrainerBase):
    """One SPMD optimizer step per iteration.

    ``train_step_fn(state, host_batch, step) -> (state, metrics)`` owns
    device placement and the jitted computation; this loop owns data
    fetching, deferred metric draining, and the finite-loss watchdog.
    """

    def __init__(
        self,
        train_step_fn: Callable,
        data_iter,
        state,
        metric_lag: int = 8,
    ):
        super().__init__()
        self.train_step_fn = train_step_fn
        self._data_iter = iter(data_iter)
        self.state = state
        self._metric_lag = metric_lag
        self._pending: deque = deque()

    def run_step(self):
        start = time.perf_counter()
        batch = next(self._data_iter)
        data_time = time.perf_counter() - start

        self.state, metrics = self.train_step_fn(self.state, batch, self.iter)
        self._pending.append((self.iter, data_time, metrics))
        if len(self._pending) > self._metric_lag:
            self._drain_one()

    def _drain_one(self):
        it, data_time, metrics = self._pending.popleft()
        metrics = jax.device_get(metrics)
        self._write_metrics(it, data_time, metrics)

    def drain_all(self):
        while self._pending:
            self._drain_one()

    def _write_metrics(self, it: int, data_time: float, metrics: Dict[str, np.ndarray]):
        storage = get_event_storage()
        storage.iter = it
        total = float(metrics.get("total_loss", 0.0))
        if not np.isfinite(total):
            self.drain_all()
            raise FloatingPointError(
                f"Loss became infinite or NaN at iteration={it}! metrics={metrics}"
            )
        storage.put_scalar("data_time", data_time)
        for k, v in metrics.items():
            storage.put_scalar(k, float(v))
        storage.iter = self.iter

    def after_train(self):
        self.drain_all()
        super().after_train()
