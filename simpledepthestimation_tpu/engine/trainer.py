"""DefaultTrainer: the cfg-driven, hook-based training assembly.

Parity with reference detectron2/engine/defaults.py:241-636: builds the
model/optimizer/loaders from cfg, wires the default hook set (timer, LR
logging, periodic checkpointing on process 0, periodic eval, periodic
writers), supports ``auto_scale_workers`` (linear-scaling rule when world
size differs from SOLVER.REFERENCE_WORLD_SIZE), and runs the iteration loop
via SimpleTrainer. The per-project plain loops in engine/runtime.py are the
other (reference-projects-style) path; this one is the extensible hooks
path used by tools/train_net.py.

``DefaultPredictor`` is the single-image inference wrapper
(reference defaults.py:180-238).
"""

from __future__ import annotations

import logging
from typing import Dict

import numpy as np

import jax

from ..config import CfgNode
from ..data import build_train_loader, build_test_loader
from ..models import build_model
from ..parallel import create_train_state, make_train_step, make_eval_step, place_replicated
from ..solver import build_optimizer
from ..evaluation import build_evaluator, DatasetEvaluators, inference_on_dataset
from ..utils import comm
from .train_loop import SimpleTrainer
from . import hooks as hooks_lib
from .checkpoint import Checkpointer, PeriodicCheckpointer
from .defaults import default_writers
from .runtime import build_mesh_from_cfg

logger = logging.getLogger(__name__)


class DefaultTrainer(SimpleTrainer):
    def __init__(self, cfg: CfgNode):
        cfg = DefaultTrainer.auto_scale_workers(cfg, comm.get_world_size())
        self.cfg = cfg
        self.mesh = build_mesh_from_cfg(cfg)
        self.model = build_model(cfg)

        seed = cfg.SEED if cfg.SEED >= 0 else 0
        self.loader = build_train_loader(cfg, seed=seed)
        self.steps_per_epoch = len(self.loader)
        max_epochs = int(cfg.SOLVER.MAX_EPOCHS)
        self._max_iter = self.steps_per_epoch * max_epochs

        self.optimizer, self.lr_schedule = build_optimizer(cfg, self.steps_per_epoch)

        sample = {
            k: v for k, v in next(iter(self.loader)).items() if hasattr(v, "shape")
        }
        state = create_train_state(
            self.model, self.optimizer, sample, jax.random.PRNGKey(seed)
        )

        step_fn = make_train_step(
            self.model,
            self.optimizer,
            self.mesh,
            donate=bool(cfg.TPU.DONATE),
            grad_clip=float(cfg.SOLVER.get("GRAD_CLIP", 0.0)),
        )

        self.checkpointer = Checkpointer(cfg.OUTPUT_DIR)
        state, self.start_epoch = self.checkpointer.resume_or_load(
            cfg.MODEL.WEIGHTS, state, resume=False
        )

        base_key = jax.random.PRNGKey(seed + 777)

        def epoch_iter():
            epoch = self.start_epoch
            while True:
                self.loader.set_epoch(epoch)
                yield from self.loader
                epoch += 1

        def wrapped_step(state, batch, it):
            return step_fn(state, batch, jax.random.fold_in(base_key, it))

        self._eval_step = None  # lazily built, shared across periodic evals
        super().__init__(wrapped_step, epoch_iter(), state)
        self.register_hooks(self.build_hooks())

    def resume_or_load(self, resume: bool = True):
        self.state, self.start_epoch = self.checkpointer.resume_or_load(
            self.cfg.MODEL.WEIGHTS, self.state, resume=resume
        )
        if resume or self.cfg.MODEL.WEIGHTS:
            self.state = place_replicated(self.state, self.mesh)

    def build_hooks(self):
        cfg = self.cfg
        ret = [
            hooks_lib.IterationTimer(),
            hooks_lib.LRSchedulerHook(self.lr_schedule),
        ]
        # PreciseBN must run BEFORE the checkpointer so epoch-end checkpoints
        # carry the same precise statistics the same-step eval uses
        # (reference defaults.py:351-397 registration order)
        precise_bn = cfg.TEST.get("PRECISE_BN", {})
        if bool(precise_bn.get("ENABLED", False)) and int(cfg.TEST.EVAL_PERIOD) > 0:
            ret.append(
                hooks_lib.PreciseBN(
                    int(cfg.TEST.EVAL_PERIOD),
                    self.steps_per_epoch,
                    self.loader,
                    int(precise_bn.get("NUM_ITER", 200)),
                )
            )
        if comm.is_main_process():
            pc = PeriodicCheckpointer(
                self.checkpointer,
                int(cfg.SOLVER.CHECKPOINT_PERIOD),
                int(cfg.SOLVER.MAX_EPOCHS),
            )
            ret.append(hooks_lib.PeriodicCheckpointerHook(pc, self.steps_per_epoch))
        if int(cfg.TEST.EVAL_PERIOD) > 0:
            ret.append(
                hooks_lib.EvalHook(
                    int(cfg.TEST.EVAL_PERIOD), self.steps_per_epoch, self._eval
                )
            )
        profile_iters = set(int(i) for i in cfg.TPU.get("PROFILE_ITERS", ()))
        if profile_iters:
            ret.append(
                hooks_lib.JaxProfiler(
                    lambda trainer: trainer.iter in profile_iters, cfg.OUTPUT_DIR
                )
            )
        if comm.is_main_process():
            ret.append(
                hooks_lib.PeriodicWriter(
                    default_writers(cfg.OUTPUT_DIR, self._max_iter),
                    period=int(cfg.LOG_PERIOD),
                )
            )
        return ret

    def _eval(self) -> Dict:
        # reuse one compiled eval executable across periodic evals (the
        # same _eval_step the VIS_PERIOD hook uses)
        if self._eval_step is None:
            self._eval_step = make_eval_step(self.model, self.mesh)
        return self.test(
            self.cfg, self.state, mesh=self.mesh, model=self.model,
            eval_step=self._eval_step,
        )

    def train(self):
        super().train(self.start_epoch * self.steps_per_epoch, self._max_iter)

    @classmethod
    def test(cls, cfg, state, mesh=None, model=None, eval_step=None) -> Dict:
        mesh = mesh or build_mesh_from_cfg(cfg)
        model = model or build_model(cfg)
        loader = build_test_loader(cfg)
        if loader is None:
            return {}
        if eval_step is None:
            eval_step = make_eval_step(model, mesh)

        def eval_fn(inputs):
            batch = {k: v for k, v in inputs.items() if hasattr(v, "shape")}
            return eval_step(state, batch)

        evaluators = DatasetEvaluators(build_evaluator(cfg, cfg.OUTPUT_DIR))
        return inference_on_dataset(eval_fn, loader, evaluators)

    @staticmethod
    def auto_scale_workers(cfg: CfgNode, num_workers: int) -> CfgNode:
        """Linear-scaling rule (reference defaults.py:553-622): when the world
        size differs from SOLVER.REFERENCE_WORLD_SIZE, rescale batch / LR /
        epochs-invariant periods to keep per-worker batch constant."""
        old_world = int(cfg.SOLVER.get("REFERENCE_WORLD_SIZE", 0))
        if old_world == 0 or old_world == num_workers:
            return cfg
        cfg = cfg.clone()
        was_frozen = cfg.is_frozen()
        cfg.defrost()

        assert cfg.SOLVER.IMS_PER_BATCH % old_world == 0
        scale = num_workers / old_world
        cfg.SOLVER.IMS_PER_BATCH = int(round(cfg.SOLVER.IMS_PER_BATCH * scale))
        cfg.SOLVER.DEPTH_LR = cfg.SOLVER.DEPTH_LR * scale
        if "POSE_LR" in cfg.SOLVER:
            cfg.SOLVER.POSE_LR = cfg.SOLVER.POSE_LR * scale
        cfg.SOLVER.REFERENCE_WORLD_SIZE = num_workers
        logger.info(
            f"auto_scale_workers: {old_world} → {num_workers} workers; "
            f"IMS_PER_BATCH={cfg.SOLVER.IMS_PER_BATCH}, DEPTH_LR={cfg.SOLVER.DEPTH_LR}"
        )
        if was_frozen:
            cfg.freeze()
        return cfg


class DefaultPredictor:
    """Single-image inference: cfg → model + checkpoint + test preprocess;
    call with an HWC uint8 RGB image, get the depth map in the original frame
    (reference defaults.py:180-238, completed — the reference's was stale)."""

    def __init__(self, cfg: CfgNode):
        from ..data.preprocess import build_preprocess

        self.cfg = cfg
        self.mesh = build_mesh_from_cfg(cfg)
        self.model = build_model(cfg)
        self.preprocesses = [
            build_preprocess(p)
            for p in cfg.DATASETS.TEST.get("PREPROCESS", [])
            if p["NAME"] not in ("LoadImg", "LoadDepth", "LoadMask", "LoadLidar")
        ]
        self._eval_step = None
        self.state = None

    def _ensure_state(self, batch):
        if self.state is None:
            from .runtime import restore_inference_state

            self.state, _ = restore_inference_state(
                self.cfg, self.model, batch, mesh=self.mesh
            )
            self._eval_step = make_eval_step(self.model, self.mesh)

    def __call__(self, image: np.ndarray) -> np.ndarray:
        data = {"metadata": {}, "img": image}
        for op in self.preprocesses:
            data = op.forward(data, np.random.default_rng(0))
        img = data["img"].astype(np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        batch = {"img": img[None]}
        self._ensure_state(batch)
        pred = np.asarray(self._eval_step(self.state, batch))[0, ..., 0]
        data["depth_pred"] = pred
        for op in self.preprocesses[::-1]:
            data = op.backward(data)
        return data["depth_pred"]
