"""Geometric + photometric preprocess ops with exact inverses.

Parity with reference detectron2/data/preprocess/augmentation.py:27-319:
KBCrop (1216×352 bottom-center, invertible), CropTopTo, Resize (bilinear img
+ sparse-aware depth scatter + intrinsics rescale, invertible), RandomCrop
(invertible), RandomFlip (flag only — flipping happens inside the depth net),
ClipDepth, RandomImageAug (brightness/contrast/saturation/hue jitter in
random order, applied identically to target + contexts, keeping unjittered
``img_orig``/``ctx_img_orig`` for the photometric loss).

Photometric math follows torchvision's adjust_* definitions in float
(blend-with-gray for contrast/saturation, HSV shift for hue) without the
torch dependency.
"""

from __future__ import annotations

import cv2
import numpy as np

from .build import PREPROCESS_REGISTRY, Preprocess

_IMG_KEYS = ("img",)
_CTX_IMG_KEYS = ("ctx_img",)


def resize_depth_sparse(depth: np.ndarray, dst_hw) -> np.ndarray:
    """Resize a sparse depth map by scattering the nonzero points to their
    scaled integer locations (reference augmentation.py:14-23) — bilinear
    interpolation would smear lidar returns across empty pixels."""
    H, W = depth.shape
    dh, dw = dst_hw
    if (H, W) == (dh, dw):
        return depth
    y, x = np.nonzero(depth)
    out = np.zeros((dh, dw), dtype=np.float32)
    out[(dh * y / H).astype(np.int64), (dw * x / W).astype(np.int64)] = depth[y, x]
    return out


def _crop_all(data_dict, y0: int, y1: int, x0: int, x1: int) -> None:
    data_dict["img"] = data_dict["img"][y0:y1, x0:x1]
    if "intrinsics" in data_dict:
        K = data_dict["intrinsics"].copy()
        K[0, 2] -= x0
        K[1, 2] -= y0
        data_dict["intrinsics"] = K
    for key in ("depth", "mask"):
        if key in data_dict:
            data_dict[key] = data_dict[key][y0:y1, x0:x1]
    for key in ("ctx_img", "ctx_depth", "ctx_mask"):
        if key in data_dict:
            data_dict[key] = [a[y0:y1, x0:x1] for a in data_dict[key]]


@PREPROCESS_REGISTRY.register()
class KBCrop(Preprocess):
    """Fixed 1216×352 bottom-center crop (the BTS/KITTI convention)."""

    WIDTH, HEIGHT = 1216, 352

    def forward(self, data_dict, rng=None):
        img_h, img_w = data_dict["img"].shape[:2]
        x_start = int((img_w - self.WIDTH) / 2)
        y_start = int(img_h - self.HEIGHT)
        _crop_all(data_dict, y_start, y_start + self.HEIGHT, x_start, x_start + self.WIDTH)
        md = data_dict["metadata"]
        md["kb_y_start"], md["kb_x_start"] = y_start, x_start
        md["h_before_kb_crop"], md["w_before_kb_crop"] = img_h, img_w
        return data_dict

    def backward(self, data_dict):
        pred = data_dict["depth_pred"]
        md = data_dict["metadata"]
        out = np.zeros((md["h_before_kb_crop"], md["w_before_kb_crop"]), np.float32)
        y0, x0 = md["kb_y_start"], md["kb_x_start"]
        out[y0 : y0 + pred.shape[-2], x0 : x0 + pred.shape[-1]] = pred
        data_dict["depth_pred"] = out
        return data_dict


@PREPROCESS_REGISTRY.register()
class CropTopTo(Preprocess):
    """Crop away the top rows so the image is cfg.IMG_H tall."""

    def __init__(self, cfg):
        super().__init__(cfg)
        self.height = cfg["IMG_H"]

    def forward(self, data_dict, rng=None):
        img_h, img_w = data_dict["img"].shape[:2]
        y_start = int(img_h - self.height)
        _crop_all(data_dict, y_start, img_h, 0, img_w)
        md = data_dict["metadata"]
        md["crop_y_start"] = y_start
        md["h_before_crop"], md["w_before_crop"] = img_h, img_w
        return data_dict

    def backward(self, data_dict):
        pred = data_dict["depth_pred"]
        md = data_dict["metadata"]
        out = np.zeros((md["h_before_crop"], md["w_before_crop"]), np.float32)
        out[md["crop_y_start"] :] = pred
        data_dict["depth_pred"] = out
        return data_dict


@PREPROCESS_REGISTRY.register()
class Resize(Preprocess):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.img_h = cfg["IMG_H"]
        self.img_w = cfg["IMG_W"]

    def forward(self, data_dict, rng=None):
        H, W = data_dict["img"].shape[:2]
        dw, dh = self.img_w, self.img_h
        data_dict["img"] = cv2.resize(data_dict["img"], (dw, dh), interpolation=cv2.INTER_LINEAR)
        if "intrinsics" in data_dict:
            K = data_dict["intrinsics"].copy()
            K[0, 0] *= dw / W
            K[0, 2] *= dw / W
            K[1, 1] *= dh / H
            K[1, 2] *= dh / H
            data_dict["intrinsics"] = K
        if "depth" in data_dict:
            data_dict["depth"] = resize_depth_sparse(data_dict["depth"], (dh, dw))
        if "mask" in data_dict:
            data_dict["mask"] = cv2.resize(
                data_dict["mask"], (dw, dh), interpolation=cv2.INTER_NEAREST
            )
        if "ctx_img" in data_dict:
            data_dict["ctx_img"] = [cv2.resize(a, (dw, dh)) for a in data_dict["ctx_img"]]
        if "ctx_depth" in data_dict:
            data_dict["ctx_depth"] = [
                resize_depth_sparse(a, (dh, dw)) for a in data_dict["ctx_depth"]
            ]
        if "ctx_mask" in data_dict:
            data_dict["ctx_mask"] = [
                cv2.resize(a, (dw, dh), interpolation=cv2.INTER_NEAREST)
                for a in data_dict["ctx_mask"]
            ]
        md = data_dict["metadata"]
        md["h_before_resize"], md["w_before_resize"] = H, W
        return data_dict

    def backward(self, data_dict):
        md = data_dict["metadata"]
        data_dict["depth_pred"] = cv2.resize(
            data_dict["depth_pred"],
            (md["w_before_resize"], md["h_before_resize"]),
            interpolation=cv2.INTER_NEAREST,
        )
        return data_dict


@PREPROCESS_REGISTRY.register()
class RandomCrop(Preprocess):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.img_h = cfg["IMG_H"]
        self.img_w = cfg["IMG_W"]

    def forward(self, data_dict, rng=None):
        rng = rng or np.random.default_rng()
        img_h, img_w = data_dict["img"].shape[:2]
        assert img_h >= self.img_h and img_w >= self.img_w
        x_start = int(rng.integers(0, img_w - self.img_w + 1))
        y_start = int(rng.integers(0, img_h - self.img_h + 1))
        _crop_all(
            data_dict, y_start, y_start + self.img_h, x_start, x_start + self.img_w
        )
        md = data_dict["metadata"]
        md["rand_y_start"], md["rand_x_start"] = y_start, x_start
        md["h_before_rand_crop"], md["w_before_rand_crop"] = img_h, img_w
        return data_dict

    def backward(self, data_dict):
        pred = data_dict["depth_pred"]
        md = data_dict["metadata"]
        out = np.zeros((md["h_before_rand_crop"], md["w_before_rand_crop"]), np.float32)
        y0, x0 = md["rand_y_start"], md["rand_x_start"]
        out[y0 : y0 + pred.shape[-2], x0 : x0 + pred.shape[-1]] = pred
        data_dict["depth_pred"] = out
        return data_dict


@PREPROCESS_REGISTRY.register()
class RandomFlip(Preprocess):
    """Sets a per-sample boolean flag only; the depth net flips its input and
    un-flips the disparity (reference augmentation.py:224-230 +
    DepthResNet.py:52-60), so the loss operates in unflipped space."""

    def forward(self, data_dict, rng=None):
        rng = rng or np.random.default_rng()
        data_dict["flip"] = bool(rng.random() > 0.5)
        return data_dict


@PREPROCESS_REGISTRY.register()
class ClipDepth(Preprocess):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.max_depth = cfg["MAX_DEPTH"]

    def forward(self, data_dict, rng=None):
        if "depth" in data_dict:
            data_dict["depth"] = np.clip(data_dict["depth"], 0, self.max_depth)
        if "ctx_depth" in data_dict:
            data_dict["ctx_depth"] = [
                np.clip(d, 0, self.max_depth) for d in data_dict["ctx_depth"]
            ]
        return data_dict


# ---------------------------------------------------------------------------
# photometric jitter
# ---------------------------------------------------------------------------


def _to_float(img: np.ndarray) -> np.ndarray:
    return np.multiply(img, np.float32(1.0 / 255.0), dtype=np.float32)


def _to_uint8(img: np.ndarray) -> np.ndarray:
    # one SIMD pass: saturate_cast(round(255·x)) — inputs are already ≥ 0
    return cv2.convertScaleAbs(img, alpha=255.0)


# The adjustments run on cv2 SIMD primitives, which also release the GIL —
# numpy ufunc chains held it and serialized the thread-pool loader
# (tools/bench_loader.py showed zero scaling across workers). The math is
# identical to the previous numpy forms (torchvision blend semantics).

_GRAY_W = np.array([[0.2989, 0.587, 0.114]], np.float32)


def _gray(img: np.ndarray) -> np.ndarray:
    return cv2.transform(img, _GRAY_W)


def _clip01(img: np.ndarray) -> np.ndarray:
    # bare floats broadcast as Scalar(v,0,0,0) in cv2 — pass all channels
    return cv2.min(cv2.max(img, (0.0, 0.0, 0.0, 0.0)), (1.0, 1.0, 1.0, 1.0))


def adjust_brightness(img: np.ndarray, factor: float) -> np.ndarray:
    f = float(factor)
    return _clip01(cv2.addWeighted(img, f, img, 0.0, 0.0))


def adjust_contrast(img: np.ndarray, factor: float) -> np.ndarray:
    f = float(factor)
    off = float((1.0 - f) * cv2.mean(_gray(img))[0])
    return _clip01(cv2.addWeighted(img, f, img, 0.0, off))


def adjust_saturation(img: np.ndarray, factor: float) -> np.ndarray:
    f = float(factor)
    gray3 = cv2.cvtColor(_gray(img), cv2.COLOR_GRAY2RGB)
    return _clip01(cv2.addWeighted(img, f, gray3, 1.0 - f, 0.0))


def adjust_hue(img: np.ndarray, shift: float) -> np.ndarray:
    """shift in [-0.5, 0.5] of a full hue revolution."""
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
    hsv[..., 0] = (hsv[..., 0] + shift * 360.0) % 360.0
    return _clip01(cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB))


@PREPROCESS_REGISTRY.register()
class RandomImageAug(Preprocess):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.jitter_prob = cfg.get("JITTER_PROB", 1.0)
        b, c, s, h = [float(v) for v in cfg.get("JITTER_PARAMS", (0.2, 0.2, 0.2, 0.05))]
        self.brightness = (max(1 - b, 0.0), 1 + b)
        self.contrast = (max(1 - c, 0.0), 1 + c)
        self.saturation = (max(1 - s, 0.0), 1 + s)
        self.hue = (-h, h)

    def forward(self, data_dict, rng=None):
        rng = rng or np.random.default_rng()
        data_dict["img_orig"] = data_dict["img"].copy()
        if "ctx_img" in data_dict:
            data_dict["ctx_img_orig"] = [a.copy() for a in data_dict["ctx_img"]]

        if rng.random() < self.jitter_prob:
            order = rng.permutation(4)
            b = float(rng.uniform(*self.brightness))
            c = float(rng.uniform(*self.contrast))
            s = float(rng.uniform(*self.saturation))
            h = float(rng.uniform(*self.hue))

            def jitter(img_u8):
                img = _to_float(img_u8)
                for fn_id in order:
                    if fn_id == 0:
                        img = adjust_brightness(img, b)
                    elif fn_id == 1:
                        img = adjust_contrast(img, c)
                    elif fn_id == 2:
                        img = adjust_saturation(img, s)
                    else:
                        img = adjust_hue(img, h)
                return _to_uint8(img)

            data_dict["img"] = jitter(data_dict["img"])
            if "ctx_img" in data_dict:
                data_dict["ctx_img"] = [jitter(a) for a in data_dict["ctx_img"]]
        return data_dict
