#!/usr/bin/env python
"""Hook-driven training runner using DefaultTrainer.

Counterpart of reference tools/train_net.py (which was stale in the
reference tree — SURVEY.md §2.6); this one works: cfg-driven assembly with
the default hook set (timer, LR logging, periodic checkpoint/eval/writers).

Usage:
  python tools/train_net.py --cfg projects/Supervised/configs/resnet18.yaml
  python tools/train_net.py --cfg ... --eval MODEL.WEIGHTS <ckpt_dir>
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from simpledepthestimation_tpu.engine import (
    default_argument_parser,
    assemble_cfg,
    default_setup,
)
from simpledepthestimation_tpu.engine.defaults import maybe_init_distributed
from simpledepthestimation_tpu.engine.trainer import DefaultTrainer


def main():
    args = default_argument_parser().parse_args()
    maybe_init_distributed(args)
    cfg = assemble_cfg(args)
    default_setup(cfg, args)

    if args.eval:
        import jax
        from simpledepthestimation_tpu.data import build_test_loader
        from simpledepthestimation_tpu.models import build_model
        from simpledepthestimation_tpu.parallel import create_train_state, place_replicated
        from simpledepthestimation_tpu.solver import build_optimizer
        from simpledepthestimation_tpu.engine.checkpoint import Checkpointer
        from simpledepthestimation_tpu.engine.runtime import build_mesh_from_cfg

        from simpledepthestimation_tpu.engine.runtime import restore_inference_state

        mesh = build_mesh_from_cfg(cfg)
        model = build_model(cfg)
        loader = build_test_loader(cfg)
        sample = {k: v for k, v in next(iter(loader)).items() if hasattr(v, "shape")}
        state, _ = restore_inference_state(cfg, model, sample, mesh=mesh)
        results = DefaultTrainer.test(cfg, state, mesh=mesh, model=model)
        print(results)
        return results

    trainer = DefaultTrainer(cfg)
    trainer.resume_or_load(resume=args.resume)
    trainer.train()


if __name__ == "__main__":
    main()
