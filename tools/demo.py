#!/usr/bin/env python
"""Single-image / directory depth inference demo.

Counterpart of reference tools/demo.py:33-107: build the test preprocess
pipeline, run the model per image, invert the preprocess to the original
frame, colormap with magma, and optionally write an mp4.

Usage:
  python tools/demo.py --cfg <config.yaml> --input img_or_dir --output out_dir \
      MODEL.WEIGHTS <ckpt_dir>
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--input", required=True, help="image file or directory")
    p.add_argument("--output", default="demo_out")
    p.add_argument("--video", action="store_true", help="also write an mp4")
    p.add_argument("--fps", type=int, default=10)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return p.parse_args()


def main():
    import cv2
    import matplotlib.cm
    import jax

    from simpledepthestimation_tpu.config import get_cfg
    from simpledepthestimation_tpu.data.preprocess import build_preprocess
    from simpledepthestimation_tpu.models import build_model
    from simpledepthestimation_tpu.parallel import (
        build_mesh, create_train_state, make_eval_step, place_replicated,
    )
    from simpledepthestimation_tpu.solver import build_optimizer
    from simpledepthestimation_tpu.engine.checkpoint import Checkpointer

    args = parse_args()
    cfg = get_cfg()
    cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(list(args.opts))
    cfg.freeze()

    preprocesses = [build_preprocess(p) for p in cfg.DATASETS.TEST.PREPROCESS
                    if p["NAME"] not in ("LoadImg", "LoadDepth", "LoadMask", "LoadLidar")]

    mesh = build_mesh(tuple(cfg.TPU.MESH_AXES), tuple(cfg.TPU.MESH_SHAPE))
    model = build_model(cfg)

    files = (
        sorted(glob.glob(os.path.join(args.input, "*")))
        if os.path.isdir(args.input)
        else [args.input]
    )
    files = [f for f in files if f.lower().endswith((".png", ".jpg", ".jpeg"))]
    assert files, f"no images found at {args.input}"

    os.makedirs(args.output, exist_ok=True)
    eval_step = None
    state = None
    frames = []

    for path in files:
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        data = {"metadata": {"img_dir": path}, "img": img}
        for op in preprocesses:
            data = op.forward(data, np.random.default_rng(0))

        batch = {"img": data["img"].astype(np.float32)[None]}
        if batch["img"].max() > 1.5:
            batch["img"] = batch["img"] / 255.0

        if state is None:
            from simpledepthestimation_tpu.engine.runtime import restore_inference_state

            state, _ = restore_inference_state(cfg, model, batch, mesh=mesh)
            eval_step = make_eval_step(model, mesh)

        pred = np.asarray(eval_step(state, batch))[0, ..., 0]

        data["depth_pred"] = pred
        for op in preprocesses[::-1]:
            data = op.backward(data)
        pred = data["depth_pred"]

        norm = (pred - pred.min()) / (pred.max() - pred.min() + 1e-9)
        colored = (matplotlib.cm.get_cmap("magma")(norm)[..., :3] * 255).astype(np.uint8)
        panel = np.concatenate([img, colored], axis=0)
        out_path = os.path.join(args.output, os.path.basename(path))
        cv2.imwrite(out_path, cv2.cvtColor(panel, cv2.COLOR_RGB2BGR))
        frames.append(panel)
        print(f"wrote {out_path}")

    if args.video and len(frames) > 1:
        h, w = frames[0].shape[:2]
        vw = cv2.VideoWriter(
            os.path.join(args.output, "demo.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"),
            args.fps,
            (w, h),
        )
        for fr in frames:
            vw.write(cv2.cvtColor(fr, cv2.COLOR_RGB2BGR))
        vw.release()
        print(f"wrote {os.path.join(args.output, 'demo.mp4')}")


if __name__ == "__main__":
    main()
