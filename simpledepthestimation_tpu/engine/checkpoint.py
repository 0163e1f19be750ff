"""Checkpoint save/resume via Orbax.

TPU-native replacement for the reference's fvcore Checkpointer stack
(reference detectron2/checkpoint/checkpoint.py:9-45 +
engine/defaults.py:325-349): process-0-coordinated async-capable saves of
the full train state (params + batch_stats + optimizer + counters), a
``last_checkpoint``-style latest pointer (Orbax step dirs), weights-only
loading for MODEL.WEIGHTS, and periodic per-epoch stepping.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from ..parallel.train_step import TrainState

logger = logging.getLogger(__name__)


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 100):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False
        )
        self.manager = ocp.CheckpointManager(self.directory, options=options)

    # -- save --------------------------------------------------------------
    def save(self, epoch: int, state: TrainState, extra: Optional[Dict[str, Any]] = None):
        payload = {"state": state, "meta": {"epoch": epoch, **(extra or {})}}
        self.manager.save(epoch, args=ocp.args.StandardSave(payload))
        self.manager.wait_until_finished()
        logger.info(f"Saved checkpoint at epoch {epoch} to {self.directory}")

    # -- load --------------------------------------------------------------
    def has_checkpoint(self) -> bool:
        return self.manager.latest_step() is not None

    def resume_or_load(
        self, weights_path: str, state: TrainState, resume: bool = True
    ):
        """Mirror of reference resume_or_load: with ``resume`` and an existing
        checkpoint, restore everything + the epoch counter; otherwise load
        ``weights_path`` weights-only (params/batch_stats). Returns
        (state, start_epoch)."""
        if resume and self.has_checkpoint():
            step = self.manager.latest_step()
            template = {"state": state, "meta": {"epoch": 0}}
            restored = self.manager.restore(
                step, args=ocp.args.StandardRestore(template)
            )
            logger.info(f"Resumed from checkpoint epoch {step}")
            return restored["state"], int(restored["meta"]["epoch"]) + 1

        if weights_path:
            state = load_weights(weights_path, state)
        return state, 0


def load_weights(path: str, state: TrainState) -> TrainState:
    """Weights-only load (params + batch_stats) from an Orbax checkpoint dir
    or a saved-state directory."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = {"state": state, "meta": {"epoch": 0}}
    try:
        restored = ckptr.restore(path, template)
        new_state = restored["state"]
    except BaseException:
        # maybe it's a bare state directory
        restored = ckptr.restore(path, state)
        new_state = restored
    logger.info(f"Loaded weights from {path}")
    return state.replace(params=new_state.params, batch_stats=new_state.batch_stats)


class PeriodicCheckpointer:
    """Save every ``period`` epochs + always at the final epoch
    (reference fvcore PeriodicCheckpointer semantics)."""

    def __init__(self, checkpointer: Checkpointer, period: int, max_epoch: int):
        self.checkpointer = checkpointer
        self.period = max(int(period), 1)
        self.max_epoch = max_epoch

    def step(self, epoch: int, state: TrainState, **extra):
        if (epoch + 1) % self.period == 0 or (epoch + 1) >= self.max_epoch:
            if jax.process_index() == 0 or jax.process_count() > 1:
                # orbax coordinates multi-host saves internally; all processes
                # must participate
                self.checkpointer.save(epoch, state, extra)
