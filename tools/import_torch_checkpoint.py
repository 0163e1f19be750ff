#!/usr/bin/env python
"""Import a reference (PyTorch) checkpoint into an Orbax train-state
checkpoint usable by this framework.

Users migrating from the reference framework (zzzxxxttt/SimpleDepthEstimation)
can bring their trained models: the converter
(``simpledepthestimation_tpu.models.torch_import``) maps every reference
model family's ``state_dict`` (DepthResNet / BtsModel / PackNet01 /
GoogleResNet + PoseNet / GooglePoseNet / GoogleMotionNet under any
meta-arch) into our Flax trees with a strict shape/coverage check, and the
result is saved as a standard checkpoint directory for ``--resume`` /
``MODEL.WEIGHTS`` / eval / export. Numerical equivalence of the conversion
is proven by tests/test_reference_parity.py.

The torch optimizer state is NOT transferable (different optimizer
implementations); the saved state carries a fresh optimizer init.

Usage:
  python tools/import_torch_checkpoint.py --cfg projects/MonoDepth2/configs/resnet18.yaml \
      --weights model_0019.pth --output output/imported [--epoch 19] [KEY VALUE ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def fabricate_batch(cfg, batch_size: int = 1):
    """A shape-correct synthetic training batch for ``model.init`` (the
    values never matter — init only traces shapes)."""
    H = int(cfg.DATASETS.TRAIN.IMG_HEIGHT)
    W = int(cfg.DATASETS.TRAIN.IMG_WIDTH)
    rng = np.random.RandomState(0)
    meta = str(cfg.MODEL.META_ARCHITECTURE)
    n_ctx = int(cfg.MODEL.POSE_NET.get("NUM_CONTEXTS", 2)) if meta != "MotionLearningModel" else 1
    batch = {
        "img": rng.rand(batch_size, H, W, 3).astype(np.float32),
        "intrinsics": np.tile(
            np.array([[[0.58 * W, 0, W / 2], [0, 0.58 * W, H / 2], [0, 0, 1]]], np.float32),
            (batch_size, 1, 1),
        ),
    }
    if meta == "SupDepthModel":
        batch["depth"] = rng.uniform(1, 60, (batch_size, H, W, 1)).astype(np.float32)
    else:
        ctx = rng.rand(batch_size, n_ctx, H, W, 3).astype(np.float32)
        batch.update(
            {
                "img_orig": batch["img"],
                "ctx_img": ctx,
                "ctx_img_orig": ctx,
                "flip": np.zeros((batch_size,), bool),
            }
        )
    if meta == "MotionLearningModel":
        batch["motion_weight"] = np.float32(1.0)
        batch["noise_stddev"] = np.float32(0.0)
        batch.pop("flip", None)
    return batch


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cfg", required=True)
    p.add_argument("--weights", required=True, help="reference .pth checkpoint")
    p.add_argument("--output", required=True, help="output checkpoint directory")
    p.add_argument(
        "--epoch", type=int, default=0,
        help="epoch number to record (for --resume continuation)",
    )
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()
    args.resume = False

    import jax

    # conversion needs no accelerator (only model.init); honor JAX_PLATFORMS
    # explicitly — some TPU plugins (axon) ignore the env var
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from simpledepthestimation_tpu.engine.defaults import assemble_cfg
    from simpledepthestimation_tpu.engine.checkpoint import Checkpointer
    from simpledepthestimation_tpu.models import build_model
    from simpledepthestimation_tpu.models.torch_import import apply_torch_checkpoint
    from simpledepthestimation_tpu.parallel import create_train_state
    from simpledepthestimation_tpu.solver import build_optimizer

    import torch

    cfg = assemble_cfg(args)

    sd = torch.load(args.weights, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd and hasattr(sd["model"], "items"):
        sd = sd["model"]

    model = build_model(cfg)
    optimizer, _ = build_optimizer(cfg, steps_per_epoch=1)
    batch = fabricate_batch(cfg)
    state = create_train_state(model, optimizer, batch, jax.random.PRNGKey(0))

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    variables = apply_torch_checkpoint(variables, sd, cfg)

    state = state.replace(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", state.batch_stats),
    )
    ckptr = Checkpointer(args.output)
    # meta must be numeric (orbax StandardSave rejects strings)
    ckptr.save(args.epoch, state)
    print(f"imported {args.weights} -> {os.path.abspath(args.output)} (epoch {args.epoch})")


if __name__ == "__main__":
    main()
