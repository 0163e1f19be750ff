"""Dataset indexing tests with fabricated on-disk fixtures: KITTI split
parsing / context windows / calib, Waymo infos loading / context windows."""

import os
import pickle

import numpy as np
import pytest

import cv2

from simpledepthestimation_tpu.config import CfgNode, get_cfg
from simpledepthestimation_tpu.data import DATASET_REGISTRY


def _write_img(path, H=64, W=96):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    img = np.random.RandomState(0).randint(0, 255, (H, W, 3), np.uint8)
    cv2.imwrite(path, img)


def _make_kitti_tree(root, date="2011_09_26", drive="0001", cam="image_02", n=6):
    drive_dir = os.path.join(root, date, f"{date}_drive_{drive}_sync", cam, "data")
    for i in range(n):
        _write_img(os.path.join(drive_dir, f"{i:010d}.png"))
    calib = os.path.join(root, date, "calib_cam_to_cam.txt")
    os.makedirs(os.path.dirname(calib), exist_ok=True)
    P = "7.215377e+02 0.0 6.095593e+02 0.0 0.0 7.215377e+02 1.728540e+02 0.0 0.0 0.0 1.0 0.0"
    with open(calib, "w") as f:
        f.write("calib_time: 09-Jan-2012\n")
        f.write(f"P_rect_02: {P}\n")
        f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
    with open(os.path.join(root, date, "calib_velo_to_cam.txt"), "w") as f:
        f.write("R: 1 0 0 0 1 0 0 0 1\nT: 0 0 0\n")
    with open(os.path.join(root, date, "calib_imu_to_velo.txt"), "w") as f:
        f.write("R: 1 0 0 0 1 0 0 0 1\nT: 0 0 0\n")
    return date, drive, cam


def test_kitti_dataset_context_windows(tmp_path):
    root = str(tmp_path / "kitti_raw")
    date, drive, cam = _make_kitti_tree(root, n=6)
    split = tmp_path / "split.txt"
    with open(split, "w") as f:
        for i in range(6):
            f.write(f"{date}/{date}_drive_{drive}_sync/{cam}/data/{i:010d}.png\n")

    ds_cfg = CfgNode(
        {
            "NAME": "KittiDepthV2",
            "DATA_ROOT": root,
            "DEPTH_ROOT": "",
            "SPLIT": str(split),
            "DEPTH_TYPE": "none",
            "FORWARD_CONTEXT": 1,
            "BACKWARD_CONTEXT": 1,
            "STRIDE": 1,
            "PREPROCESS": [
                CfgNode({"NAME": "LoadImg", "WITH_CTX": True}),
                CfgNode({"NAME": "ToTensor"}),
            ],
        }
    )
    ds = DATASET_REGISTRY.get("KittiDepthV2")(ds_cfg, get_cfg())
    # 6 frames, frames 1..4 have both neighbors
    assert len(ds) == 4
    sample = ds.get_sample(0, np.random.default_rng(0))
    assert sample["img"].shape == (64, 96, 3)
    assert len(sample["ctx_img"]) == 2
    np.testing.assert_allclose(sample["intrinsics"][0, 0], 721.5377, rtol=1e-5)
    # context filenames are the +-1 neighbors of a valid center
    md = sample["metadata"]
    center = int(md["img_id"])
    ctx_ids = [int(os.path.basename(p).split(".")[0]) for p in md["ctx_img_dir"]]
    assert sorted(ctx_ids) == [center - 1, center + 1]


def test_kitti_context_breaks_across_drives(tmp_path):
    root = str(tmp_path / "kitti_raw")
    date, drive, cam = _make_kitti_tree(root, drive="0001", n=3)
    _make_kitti_tree(root, drive="0002", n=3)
    split = tmp_path / "split.txt"
    with open(split, "w") as f:
        for d in ("0001", "0002"):
            for i in range(3):
                f.write(f"{date}/{date}_drive_{d}_sync/{cam}/data/{i:010d}.png\n")
    ds_cfg = CfgNode(
        {
            "NAME": "KittiDepthV2",
            "DATA_ROOT": root,
            "SPLIT": str(split),
            "DEPTH_TYPE": "none",
            "FORWARD_CONTEXT": 1,
            "BACKWARD_CONTEXT": 1,
            "STRIDE": 1,
            "PREPROCESS": [],
        }
    )
    ds = DATASET_REGISTRY.get("KittiDepthV2")(ds_cfg, get_cfg())
    # each 3-frame drive contributes only its middle frame
    assert len(ds) == 2


def _make_waymo_tree(root, n_frames=5, cams=("FRONT",)):
    frames = []
    for i in range(n_frames):
        rel = os.path.join("seg-000", f"{i:05d}")
        calib = {}
        for ci, cam in enumerate(cams):
            K = np.array(
                [[2000.0 + 100 * ci, 0, 960], [0, 2000.0 + 100 * ci, 640], [0, 0, 1]],
                np.float32,
            )
            _write_img(os.path.join(root, "training", "image", rel, f"{cam}.jpg"))
            depth = (np.random.RandomState(i).rand(64, 96) * 50 * 255).astype(np.uint16)
            dd = os.path.join(root, "training", "depth", rel)
            os.makedirs(dd, exist_ok=True)
            cv2.imwrite(os.path.join(dd, f"{cam}_depth.png"), depth)
            calib[cam] = {"intrinsics": K}
        frames.append(
            {
                "segment": "seg-000",
                "frame": i,
                "rel_dir": rel,
                "calib": calib,
            }
        )
    os.makedirs(os.path.join(root, "infos"), exist_ok=True)
    infos = os.path.join(root, "infos", "training_infos.pkl")
    with open(infos, "wb") as f:
        pickle.dump({"frames": frames}, f)
    return infos


def test_waymo_dataset(tmp_path):
    root = str(tmp_path / "waymo")
    infos = _make_waymo_tree(root, n_frames=5)
    ds_cfg = CfgNode(
        {
            "NAME": "WaymoDepth",
            "DATA_ROOT": os.path.join(root, "training", "image"),
            "DEPTH_ROOT": os.path.join(root, "training", "depth"),
            "SPLIT": infos,
            "USE_CAMS": ["FRONT"],
            "DOWNSAMPLE": 1,
            "WITH_DEPTH": True,
            "FORWARD_CONTEXT": 1,
            "BACKWARD_CONTEXT": 1,
            "STRIDE": 1,
            "PREPROCESS": [
                CfgNode({"NAME": "LoadImg", "WITH_CTX": True}),
                CfgNode({"NAME": "LoadDepth", "KEEP_ORIG": True}),
                CfgNode({"NAME": "ToTensor"}),
            ],
        }
    )
    ds = DATASET_REGISTRY.get("WaymoDepth")(ds_cfg, get_cfg())
    assert len(ds) == 3  # frames 1..3 have both neighbors
    sample = ds.get_sample(0, np.random.default_rng(0))
    assert sample["img"].shape == (64, 96, 3)
    assert len(sample["ctx_img"]) == 2
    assert sample["depth"].shape == (64, 96)
    np.testing.assert_allclose(sample["intrinsics"][0, 0], 2000.0)


def test_waymo_downsample(tmp_path):
    root = str(tmp_path / "waymo")
    infos = _make_waymo_tree(root, n_frames=8)
    ds_cfg = CfgNode(
        {
            "NAME": "WaymoDepth",
            "DATA_ROOT": os.path.join(root, "training", "image"),
            "SPLIT": infos,
            "USE_CAMS": ["FRONT"],
            "DOWNSAMPLE": 2,
            "PREPROCESS": [],
        }
    )
    ds = DATASET_REGISTRY.get("WaymoDepth")(ds_cfg, get_cfg())
    assert len(ds) == 4  # 8 frames downsampled to 4, no context constraint


def test_waymo_multicam(tmp_path):
    """USE_CAMS with several cameras: the (frame, cam) product becomes the
    sample axis (the reference returns per-frame camera lists absorbed into
    the batch by its collator, waymo.py:128-155 — same capability, flattened
    upstream), with per-camera calibration."""
    root = str(tmp_path / "waymo")
    infos = _make_waymo_tree(root, n_frames=4, cams=("FRONT", "FRONT_LEFT"))
    ds_cfg = CfgNode(
        {
            "NAME": "WaymoDepth",
            "DATA_ROOT": os.path.join(root, "training", "image"),
            "SPLIT": infos,
            "USE_CAMS": ["FRONT", "FRONT_LEFT"],
            "DOWNSAMPLE": 1,
            "FORWARD_CONTEXT": 1,
            "BACKWARD_CONTEXT": 1,
            "PREPROCESS": [
                CfgNode({"NAME": "LoadImg", "WITH_CTX": True}),
                CfgNode({"NAME": "ToTensor"}),
            ],
        }
    )
    ds = DATASET_REGISTRY.get("WaymoDepth")(ds_cfg, get_cfg())
    assert len(ds) == 4  # 2 valid frames x 2 cams
    cams = set()
    focals = set()
    for i in range(len(ds)):
        s = ds.get_sample(i, np.random.default_rng(0))
        cams.add(s["metadata"]["cam"])
        focals.add(float(s["intrinsics"][0, 0]))
        assert len(s["ctx_img"]) == 2
    assert cams == {"FRONT", "FRONT_LEFT"}
    assert focals == {2000.0, 2100.0}
