#!/usr/bin/env python
"""Host input-pipeline throughput: can the PrefetchLoader feed a v5e-8?

Fabricates a KITTI-shaped tree with realistic full-res frames (1242×375
png), runs the real MonoDepth2 train preprocess chain (LoadImg with 2
contexts → Resize 640×192 → RandomFlip → RandomImageAug → ToTensor), and
measures sustained images/sec out of the loader for several worker counts.

The v5e-8 projection needs ≈588 img/s of decode+augment across the host
(docs/PERF.md headline × 8 chips); this tool shows how many loader workers
that takes (SURVEY §7 flagged the input pipeline as the likely bottleneck).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import cv2


def make_tree(root, n=64, H=375, W=1242):
    date, drive, cam = "2011_09_26", "0001", "image_02"
    rng = np.random.RandomState(0)
    drive_dir = os.path.join(root, "raw", date, f"{date}_drive_{drive}_sync", cam, "data")
    os.makedirs(drive_dir, exist_ok=True)
    base = rng.randint(0, 255, (H, W, 3), np.uint8)
    for i in range(n):
        cv2.imwrite(os.path.join(drive_dir, f"{i:010d}.png"), np.roll(base, i * 7, 1))
    with open(os.path.join(root, "raw", date, "calib_cam_to_cam.txt"), "w") as f:
        f.write("P_rect_02: 700.0 0.0 620.0 0.0 0.0 700.0 180.0 0.0 0.0 0.0 1.0 0.0\n")
        f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
    for name in ("calib_velo_to_cam.txt", "calib_imu_to_velo.txt"):
        with open(os.path.join(root, "raw", date, name), "w") as f:
            f.write("R: 1 0 0 0 1 0 0 0 1\nT: 0 0 0\n")
    split = os.path.join(root, "split.txt")
    with open(split, "w") as f:
        for i in range(n):
            f.write(f"{date}/{date}_drive_{drive}_sync/{cam}/data/{i:010d}.png\n")
    return split


def main():
    from simpledepthestimation_tpu.config import CfgNode, get_cfg
    from simpledepthestimation_tpu.data import build_train_loader

    root = "/tmp/bench_loader_kitti"
    split = make_tree(root, n=64)

    for workers in (2, 4, 8, 16):
        cfg = get_cfg()
        t = cfg.DATASETS.TRAIN
        t.NAME = "KittiDepthV2"
        t.DATA_ROOT = os.path.join(root, "raw")
        t.DEPTH_ROOT = ""
        t.SPLIT = split
        t.DEPTH_TYPE = "none"
        t.FORWARD_CONTEXT = 1
        t.BACKWARD_CONTEXT = 1
        t.STRIDE = 1
        t.PREPROCESS = [
            CfgNode({"NAME": "LoadImg", "WITH_CTX": True}),
            CfgNode({"NAME": "Resize", "IMG_W": 640, "IMG_H": 192}),
            CfgNode({"NAME": "RandomFlip"}),
            CfgNode({"NAME": "RandomImageAug"}),
            CfgNode({"NAME": "ToTensor"}),
        ]
        cfg.SOLVER.IMS_PER_BATCH = 24
        cfg.DATALOADER.NUM_WORKERS = workers
        loader = build_train_loader(cfg, seed=0)

        # warm one epoch (page cache), then measure two
        for _ in loader:
            pass
        n_img = 0
        t0 = time.perf_counter()
        for epoch in (1, 2):
            loader.set_epoch(epoch)
            for batch in loader:
                n_img += batch["img"].shape[0]
        dt = time.perf_counter() - t0
        print(f"workers={workers:2d}: {n_img / dt:7.1f} img/s host decode+augment")


if __name__ == "__main__":
    main()
