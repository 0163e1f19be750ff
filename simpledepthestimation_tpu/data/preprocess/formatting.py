"""Array formatting: uint8 HWC → float32 HWC in [0,1].

Analog of reference detectron2/data/preprocess/formating.py:8-20 (ToTensor),
except we stay NHWC — the TPU conv layout — instead of transposing to CHW.
The registered name stays ``ToTensor`` so reference yaml configs work
unchanged.
"""

from __future__ import annotations

import numpy as np

from .build import PREPROCESS_REGISTRY, Preprocess


@PREPROCESS_REGISTRY.register()
class ToTensor(Preprocess):
    def forward(self, data_dict, rng=None):
        for key in ("img", "img_orig"):
            if key in data_dict:
                data_dict[key] = data_dict[key].astype(np.float32) / 255.0
        for key in ("ctx_img", "ctx_img_orig"):
            if key in data_dict:
                data_dict[key] = [a.astype(np.float32) / 255.0 for a in data_dict[key]]
        return data_dict
