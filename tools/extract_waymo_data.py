#!/usr/bin/env python
"""Extract Waymo Open Dataset tfrecords into frame directories.

Counterpart of reference tools/extract_waymo_data.py:1-134: parses each
segment's tfrecords, writes per-frame camera jpgs + uint16 ×255 depth pngs
(top-lidar returns projected into each camera), and an ``infos.pkl`` with
the frame index + per-segment calibration consumed by
``WaymoDepth`` (simpledepthestimation_tpu/data/datasets/waymo.py).

Requires ``tensorflow`` and ``waymo-open-dataset`` (not baked into this
image — the tool degrades to a clear error; run it in a Waymo-capable env).
"""

import argparse
import os
import pickle
import sys


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True, help="directory of *.tfrecord segments")
    p.add_argument("--out-root", required=True)
    p.add_argument("--split", default="training")
    p.add_argument("--workers", type=int, default=8)
    return p.parse_args()


def extract_segment(args):
    """Extract one segment: images, projected depth, calibration."""
    import numpy as np
    import cv2
    import tensorflow as tf
    from waymo_open_dataset import dataset_pb2
    from waymo_open_dataset.utils import frame_utils

    segment_path, out_dir = args
    dataset = tf.data.TFRecordDataset(segment_path, compression_type="")
    seg_name = os.path.splitext(os.path.basename(segment_path))[0]
    frames_info = []

    for frame_idx, record in enumerate(dataset):
        frame = dataset_pb2.Frame()
        frame.ParseFromString(bytearray(record.numpy()))

        rel_dir = os.path.join(seg_name, f"{frame_idx:05d}")
        img_dir_out = os.path.join(out_dir, "image", rel_dir)
        depth_dir_out = os.path.join(out_dir, "depth", rel_dir)
        os.makedirs(img_dir_out, exist_ok=True)
        os.makedirs(depth_dir_out, exist_ok=True)

        (range_images, camera_projections, _, range_image_top_pose) = (
            frame_utils.parse_range_image_and_camera_projection(frame)
        )
        points, cp_points = frame_utils.convert_range_image_to_point_cloud(
            frame, range_images, camera_projections, range_image_top_pose
        )
        points_all = np.concatenate(points, axis=0)
        cp_all = np.concatenate(cp_points, axis=0)
        distances = np.linalg.norm(points_all, axis=-1)

        calib = {}
        for img_proto in frame.images:
            cam_name = dataset_pb2.CameraName.Name.Name(img_proto.name)
            img = tf.image.decode_jpeg(img_proto.image).numpy()
            cv2.imwrite(
                os.path.join(img_dir_out, f"{cam_name}.jpg"),
                cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
            )

            # depth: lidar returns whose primary projection hits this camera
            mask = cp_all[..., 0] == img_proto.name
            xs = cp_all[mask, 1].astype(np.int64)
            ys = cp_all[mask, 2].astype(np.int64)
            depth = np.zeros(img.shape[:2], np.float32)
            depth[ys, xs] = distances[mask]
            cv2.imwrite(
                os.path.join(depth_dir_out, f"{cam_name}_depth.png"),
                (depth * 255).astype(np.uint16),
            )

        for cc in frame.context.camera_calibrations:
            cam_name = dataset_pb2.CameraName.Name.Name(cc.name)
            fx, fy, cx, cy = cc.intrinsic[0], cc.intrinsic[1], cc.intrinsic[2], cc.intrinsic[3]
            calib[cam_name] = {
                "intrinsics": np.array(
                    [[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32
                ),
                "extrinsics": np.array(cc.extrinsic.transform, np.float32).reshape(4, 4),
            }

        frames_info.append(
            {"segment": seg_name, "frame": frame_idx, "rel_dir": rel_dir, "calib": calib}
        )

    return frames_info


def main():
    args = parse_args()
    try:
        import tensorflow  # noqa: F401
        import waymo_open_dataset  # noqa: F401
    except ImportError as e:
        print(
            "extract_waymo_data requires tensorflow + waymo-open-dataset, "
            f"which are not installed here: {e}\n"
            "Run this tool in a Waymo-capable environment; the resulting "
            "directory layout is consumed by the WaymoDepth dataset.",
            file=sys.stderr,
        )
        sys.exit(2)

    import glob
    from multiprocessing import Pool

    segments = sorted(glob.glob(os.path.join(args.data_root, "*.tfrecord")))
    assert segments, f"no tfrecords under {args.data_root}"
    out_dir = os.path.join(args.out_root, args.split)
    os.makedirs(out_dir, exist_ok=True)

    with Pool(args.workers) as pool:
        all_infos = pool.map(extract_segment, [(s, out_dir) for s in segments])

    frames = [fr for seg in all_infos for fr in seg]
    os.makedirs(os.path.join(args.out_root, "infos"), exist_ok=True)
    with open(os.path.join(args.out_root, "infos", f"{args.split}_infos.pkl"), "wb") as f:
        pickle.dump({"frames": frames}, f)
    print(f"extracted {len(frames)} frames from {len(segments)} segments → {out_dir}")


if __name__ == "__main__":
    main()
