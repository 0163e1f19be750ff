"""File-loading preprocess ops (cv2/numpy).

Parity with reference detectron2/data/preprocess/loading.py:25-123:
LoadImg (BGR→RGB uint8), LoadDepth (velodyne .npz / ×1/255 .png, optional
full-res copy for eval), LoadMask, LoadLidar.
"""

from __future__ import annotations

import os

import cv2
import numpy as np

from .build import PREPROCESS_REGISTRY, Preprocess


@PREPROCESS_REGISTRY.register()
class LoadImg(Preprocess):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.load_ctx = cfg.get("WITH_CTX", False)

    @staticmethod
    def _load(path: str) -> np.ndarray:
        img = cv2.imread(path)
        assert img is not None, f"{path} does not exist!"
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def forward(self, data_dict, rng=None):
        data_dict["img"] = self._load(data_dict["metadata"]["img_dir"])
        if self.load_ctx:
            data_dict["ctx_img"] = [
                self._load(p) for p in data_dict["metadata"]["ctx_img_dir"]
            ]
        return data_dict


@PREPROCESS_REGISTRY.register()
class LoadDepth(Preprocess):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.load_ctx = cfg.get("WITH_CTX", False)
        self.keep_orig_for_eval = cfg.get("KEEP_ORIG", False)

    @staticmethod
    def _load(path: str) -> np.ndarray:
        ext = os.path.splitext(path)[-1]
        if ext == ".npz":
            return np.load(path)["velodyne_depth"].astype(np.float32)
        if ext == ".png":
            depth = cv2.imread(path, -1)
            assert depth is not None, f"{path} does not exist!"
            return depth.astype(np.float32) / 255.0
        raise NotImplementedError(f"Unsupported depth format {ext}")

    def forward(self, data_dict, rng=None):
        data_dict["depth"] = self._load(data_dict["metadata"]["depth_dir"])
        if self.keep_orig_for_eval:
            data_dict["depth_orig"] = data_dict["depth"].copy()
        if self.load_ctx:
            data_dict["ctx_depth"] = [
                self._load(p) for p in data_dict["metadata"]["ctx_depth_dir"]
            ]
        return data_dict


@PREPROCESS_REGISTRY.register()
class LoadMask(Preprocess):
    @staticmethod
    def _load(path: str) -> np.ndarray:
        mask = cv2.imread(path, -1)
        assert mask is not None, f"{path} does not exist!"
        return mask.astype(np.float32)

    def forward(self, data_dict, rng=None):
        data_dict["mask"] = self._load(data_dict["metadata"]["mask_dir"])
        data_dict["ctx_mask"] = [
            self._load(p) for p in data_dict["metadata"]["ctx_mask_dir"]
        ]
        return data_dict


@PREPROCESS_REGISTRY.register()
class LoadLidar(Preprocess):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.load_ctx = cfg.get("WITH_CTX", False)
        self.load_dim = cfg.get("LOAD_DIM", 4)
        self.use_dim = cfg.get("USE_DIM", 3)

    def _load(self, path: str) -> np.ndarray:
        ext = os.path.splitext(path)[-1]
        if ext != ".bin":
            raise NotImplementedError(f"Unsupported lidar format {ext}")
        scan = np.fromfile(path, dtype=np.float32).reshape(-1, self.load_dim)
        if isinstance(self.use_dim, int):
            return scan[:, : self.use_dim]
        return scan[:, list(self.use_dim)]

    def forward(self, data_dict, rng=None):
        data_dict["lidar"] = self._load(data_dict["metadata"]["lidar_dir"])
        if self.load_ctx:
            data_dict["ctx_lidar"] = [
                self._load(p) for p in data_dict["metadata"]["ctx_lidar_dir"]
            ]
        return data_dict
