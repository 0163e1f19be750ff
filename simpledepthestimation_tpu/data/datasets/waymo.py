"""Waymo extracted-frames dataset.

Behavioral parity with reference detectron2/data/datasets/waymo.py:13-155:
reads the ``infos.pkl`` produced by tools/extract_waymo_data.py (frame index
+ per-segment calibration), supports DOWNSAMPLE subsampling and multi-camera
USE_CAMS (one sample per camera; the collator absorbs the camera dim into the
batch).
"""

from __future__ import annotations

import logging
import os
import pickle
from typing import List, Optional

import numpy as np

from ..build import DATASET_REGISTRY, DatasetBase

logger = logging.getLogger(__name__)


@DATASET_REGISTRY.register()
class WaymoDepth(DatasetBase):
    def __init__(self, dataset_cfg, cfg):
        super().__init__(dataset_cfg, cfg)
        self.data_root = dataset_cfg.DATA_ROOT
        self.split = dataset_cfg.get("SPLIT", "training")
        self.use_cams = list(dataset_cfg.get("USE_CAMS", ["FRONT"]))
        self.downsample = int(dataset_cfg.get("DOWNSAMPLE", 1))
        self.forward_context = int(dataset_cfg.get("FORWARD_CONTEXT", 0))
        self.backward_context = int(dataset_cfg.get("BACKWARD_CONTEXT", 0))
        self.stride = int(dataset_cfg.get("STRIDE", 1))
        self.with_depth = dataset_cfg.get("DEPTH_TYPE", "none") != "none"

        infos_path = os.path.join(self.data_root, self.split, "infos.pkl")
        with open(infos_path, "rb") as f:
            self.infos = pickle.load(f)

        # one entry per (frame, cam); filter to frames whose context windows
        # stay within the same segment
        self.samples: List[dict] = []
        frames = self.infos["frames"]
        if self.downsample > 1:
            frames = frames[:: self.downsample]
        by_segment = {}
        for i, fr in enumerate(frames):
            by_segment.setdefault(fr["segment"], []).append(i)

        for seg, idxs in by_segment.items():
            for pos, i in enumerate(idxs):
                lo = pos - self.backward_context * self.stride
                hi = pos + self.forward_context * self.stride
                if lo < 0 or hi >= len(idxs):
                    continue
                ctx_pos = [
                    idxs[p]
                    for p in range(lo, hi + 1, self.stride)
                    if p != pos
                ]
                for cam in self.use_cams:
                    self.samples.append(
                        {"frame": i, "cam": cam, "ctx_frames": ctx_pos}
                    )
        self._frames = frames
        logger.info(f"WaymoDepth: {len(self.samples)} samples from {len(frames)} frames")

    def __len__(self) -> int:
        return len(self.samples)

    def _paths(self, frame_info, cam):
        img = os.path.join(self.data_root, self.split, frame_info["rel_dir"], f"{cam}.jpg")
        depth = os.path.join(
            self.data_root, self.split, frame_info["rel_dir"], f"{cam}_depth.png"
        )
        return img, depth

    def get_sample(self, idx: int, rng: Optional[np.random.Generator] = None):
        sample = self.samples[idx]
        frame_info = self._frames[sample["frame"]]
        cam = sample["cam"]
        img_dir, depth_dir = self._paths(frame_info, cam)

        data = {
            "metadata": {
                "idx": idx,
                "img_id": str(sample["frame"]),
                "cam": cam,
                "img_dir": img_dir,
                "depth_dir": depth_dir if self.with_depth else "",
                "ctx_img_dir": [
                    self._paths(self._frames[j], cam)[0] for j in sample["ctx_frames"]
                ],
                "ctx_depth_dir": [
                    self._paths(self._frames[j], cam)[1] for j in sample["ctx_frames"]
                ],
            },
            "intrinsics": np.asarray(
                frame_info["calib"][cam]["intrinsics"], np.float32
            ).copy(),
        }
        return self.preprocess(data, rng)

    def __getitem__(self, idx: int):
        return self.get_sample(idx, None)
