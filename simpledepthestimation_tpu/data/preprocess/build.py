"""Preprocess framework: registry of invertible sample transforms.

Parity with reference detectron2/data/preprocess/build.py:7-32. Each op has
``forward(data_dict, rng)`` (host-side numpy, applied in the loader workers)
and ``backward(data_dict)`` (the inverse applied to predictions at eval —
the framework's one dependency inversion, see SURVEY.md §1). Randomness is
explicit: ops draw from the provided ``np.random.Generator`` instead of
global state, keeping the pipeline reproducible per (seed, epoch, index).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from ...utils.registry import Registry

PREPROCESS_REGISTRY = Registry("PREPROCESS")


class Preprocess:
    def __init__(self, cfg):
        self.cfg = cfg

    def forward(self, data_dict: Dict[str, Any], rng: Optional[np.random.Generator] = None):
        return data_dict

    def backward(self, data_dict: Dict[str, Any]):
        return data_dict


def build_preprocess(cfg) -> Preprocess:
    op = PREPROCESS_REGISTRY.get(cfg["NAME"])(cfg)
    assert isinstance(op, Preprocess)
    return op
