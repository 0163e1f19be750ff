#!/usr/bin/env python
"""Plain-loop training runner (no hooks): the minimal generic path.

Counterpart of reference tools/plain_train_net.py (partially stale in the
reference); this one delegates to the shared epoch-loop runtime used by the
project entry points.

Usage:
  python tools/plain_train_net.py --cfg <config.yaml> [--eval] [--resume]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from simpledepthestimation_tpu.engine import default_argument_parser, simple_main
from simpledepthestimation_tpu.engine.runtime import do_train, do_test


def train(cfg, resume=False):
    return do_train(cfg, resume=resume)


def test(cfg, resume=False):
    return do_test(cfg)


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    simple_main(args, train, test)
