#!/usr/bin/env python
"""Supervised depth regression entry point (silog loss).

Counterpart of reference projects/Supervised/train.py:47-153: AdamW with
encoder/decoder weight-decay groups + poly LR decay, epoch loop with
per-epoch checkpointing and periodic KITTI eval.
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
