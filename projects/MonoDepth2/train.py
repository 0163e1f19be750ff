#!/usr/bin/env python
"""MonoDepth2 self-supervised entry point.

Counterpart of reference projects/MonoDepth2/train.py:44-130: Adam with
separate depth/pose LR groups + MultiStepLR, photometric min-reprojection
training, periodic eval with median gt-scaling.
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from simpledepthestimation_tpu.engine import default_argument_parser, simple_main
from simpledepthestimation_tpu.engine.runtime import do_train, do_test


def train(cfg, resume=False):
    return do_train(cfg, resume=resume)


def test(cfg, resume=False):
    return do_test(cfg)


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    simple_main(args, train, test)
