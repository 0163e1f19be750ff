#!/usr/bin/env python
"""Export a trained depth model to a self-contained StableHLO serving
artifact (weights baked in), loadable with
``simpledepthestimation_tpu.engine.export.load_exported`` — no model code
needed at serving time.

Usage:
  python tools/export_inference.py --cfg projects/Supervised/configs/resnet18.yaml \
      --output model.shlo [--batch 1] [MODEL.WEIGHTS <ckpt_dir>] [KEY VALUE ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from simpledepthestimation_tpu.engine.defaults import assemble_cfg, default_setup
from simpledepthestimation_tpu.engine.export import export_inference


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cfg", required=True)
    p.add_argument("--output", required=True, help="artifact path (e.g. model.shlo)")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument(
        "--allow-random-init", action="store_true",
        help="export even when no checkpoint is found (smoke testing)",
    )
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()
    args.resume = False

    cfg = assemble_cfg(args)
    default_setup(cfg, args)
    path = export_inference(
        cfg, args.output, batch=args.batch,
        allow_random_init=args.allow_random_init,
    )
    print(f"exported: {path}")


if __name__ == "__main__":
    main()
