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
        (state, start_epoch).

        Non-strict like the reference's fvcore Checkpointer: when the live
        state's tree differs from the stored one (e.g. ``--eval`` of a
        self-supervised run initializes through the inference path, which has
        no pose_net), the restore falls back to loading the intersection and
        logs the missing/unexpected keys."""
        if resume and self.has_checkpoint():
            step = self.manager.latest_step()
            template = {"state": state, "meta": {"epoch": 0}}
            try:
                restored = self.manager.restore(
                    step, args=ocp.args.StandardRestore(template)
                )
                logger.info(f"Resumed from checkpoint epoch {step}")
                return restored["state"], int(restored["meta"]["epoch"]) + 1
            except (ValueError, KeyError, TypeError) as e:
                # tree/structure mismatch (e.g. --eval init lacking pose_net):
                # fall back to an intersection restore. I/O faults or
                # corruption raise other types and propagate — silently
                # resetting optimizer state mid-resume would alter training.
                logger.warning(
                    "Strict checkpoint restore failed "
                    f"({type(e).__name__}); retrying as a partial "
                    "(intersection) restore"
                )
            raw = self.manager.restore(step)
            new_state = _partial_state_restore(state, raw.get("state", raw))
            meta = raw.get("meta", {})
            logger.info(f"Partially resumed from checkpoint epoch {step}")
            return new_state, int(meta.get("epoch", step)) + 1

        if weights_path:
            state = load_weights(weights_path, state)
        return state, 0


def _merge_tree(template, restored, path: str, missing, unexpected):
    """Recursive intersection merge: values present in both trees with
    matching shapes come from the checkpoint; template-only, wrong-shaped,
    or structurally-mismatched keys keep their (freshly initialized) values
    and are reported missing; checkpoint-only keys are reported unexpected
    (fvcore non-strict load semantics — 'Skip loading parameter ... shape
    mismatch', reference checkpoint/checkpoint.py:22-31)."""
    t_is_dict = isinstance(template, dict)
    r_is_dict = isinstance(restored, dict)
    if t_is_dict != r_is_dict:
        # leaf vs subtree structural mismatch: keep the template
        missing.append(f"{path[:-1]} (structure mismatch)")
        return template
    if not t_is_dict:
        t_shape = getattr(template, "shape", None)
        r_shape = getattr(restored, "shape", None)
        if t_shape != r_shape:
            missing.append(f"{path[:-1]} (shape {r_shape} vs expected {t_shape})")
            return template
        return restored
    out = {}
    for k, v in template.items():
        if k in restored:
            out[k] = _merge_tree(v, restored[k], f"{path}{k}.", missing, unexpected)
        else:
            missing.append(f"{path}{k}")
            out[k] = v
    for k in restored:
        if k not in template:
            unexpected.append(f"{path}{k}")
    return out


def _partial_state_restore(state: TrainState, raw_state) -> TrainState:
    """Merge a raw (templateless) restored state dict into ``state`` by tree
    intersection. Only params/batch_stats are merged — a mismatched tree
    means the architecture views differ (e.g. eval-path init), so optimizer
    state is left at its template values."""
    missing, unexpected = [], []
    params = _merge_tree(
        dict(state.params), dict(raw_state.get("params", {})), "params.", missing, unexpected
    )
    batch_stats = _merge_tree(
        dict(state.batch_stats) if state.batch_stats else {},
        dict(raw_state.get("batch_stats", {}) or {}),
        "batch_stats.",
        missing,
        unexpected,
    )
    if missing:
        logger.warning(
            f"Keys in the model but not the checkpoint (kept at init): {missing[:20]}"
            + (" ..." if len(missing) > 20 else "")
        )
    if unexpected:
        logger.info(
            f"Checkpoint keys unused by this model: {unexpected[:20]}"
            + (" ..." if len(unexpected) > 20 else "")
        )
    return state.replace(params=params, batch_stats=batch_stats)


def load_weights(path: str, state: TrainState) -> TrainState:
    """Weights-only load (params + batch_stats) from an Orbax checkpoint dir
    or a saved-state directory. Non-strict: falls back to an intersection
    merge when the trees differ."""
    path = os.path.abspath(path)
    # A Checkpointer/CheckpointManager directory (numeric step subdirs) —
    # the same path type restore_inference_state/demo/export accept for
    # MODEL.WEIGHTS: restore the latest step, weights-only.
    if os.path.isdir(path) and any(
        d.isdigit() and os.path.isdir(os.path.join(path, d)) for d in os.listdir(path)
    ):
        ck = Checkpointer(path)
        if ck.has_checkpoint():
            restored, _ = ck.resume_or_load("", state, resume=True)
            logger.info(f"Loaded weights (latest step) from manager dir {path}")
            return state.replace(
                params=restored.params, batch_stats=restored.batch_stats
            )
    ckptr = ocp.StandardCheckpointer()
    template = {"state": state, "meta": {"epoch": 0}}
    # weights-only load: the partial/intersection path is acceptable here
    # (unlike resume, there is no optimizer state to silently reset), but
    # I/O faults (missing dir, unreadable files) still propagate.
    try:
        restored = ckptr.restore(path, template)
        new_state = restored["state"]
    except (ValueError, KeyError, TypeError):
        try:
            # maybe it's a bare state directory
            restored = ckptr.restore(path, state)
            new_state = restored
        except (ValueError, KeyError, TypeError):
            raw = ckptr.restore(path)
            logger.warning(
                "Strict weights load failed; using partial (intersection) load"
            )
            new_state = _partial_state_restore(state, raw.get("state", raw))
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
