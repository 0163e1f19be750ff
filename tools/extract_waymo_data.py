#!/usr/bin/env python
"""Extract Waymo Open Dataset tfrecords into frame directories.

Thin tf/waymo-od glue around the pure extraction math in
``simpledepthestimation_tpu.data.datasets.waymo_extract`` (projection,
depth-image assembly, infos index assembly — unit-tested without tf).
Counterpart of reference tools/extract_waymo_data.py:1-134: per-frame
camera jpgs + uint16 ×255 camera-Z depth pngs (top-lidar returns projected
into each camera) + an ``infos.pkl`` consumed by ``WaymoDepth``.

Requires ``tensorflow`` and ``waymo-open-dataset`` (not baked into this
image — the tool degrades to a clear error; run it in a Waymo-capable env).
"""

import argparse
import glob
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from simpledepthestimation_tpu.data.datasets.waymo_extract import (
    assemble_infos,
    build_frame_info,
    encode_depth_png,
    intrinsic_matrix4,
    project_points_to_camera,
    scatter_depth_image,
)


def extract_segment(args):
    """Extract one segment: images, projected depth, calibration (glue)."""
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

        calib = {}
        for cc in frame.context.camera_calibrations:
            cam_name = dataset_pb2.CameraName.Name.Name(cc.name)
            calib[cam_name] = {
                "intrinsics": np.array(
                    [
                        [cc.intrinsic[0], 0, cc.intrinsic[2]],
                        [0, cc.intrinsic[1], cc.intrinsic[3]],
                        [0, 0, 1],
                    ],
                    np.float32,
                ),
                "extrinsics": np.array(cc.extrinsic.transform, np.float32).reshape(4, 4),
            }

        calibs_by_id = {cc.name: cc for cc in frame.context.camera_calibrations}
        for img_proto in frame.images:
            cam_name = dataset_pb2.CameraName.Name.Name(img_proto.name)
            img = tf.image.decode_jpeg(img_proto.image).numpy()
            cv2.imwrite(
                os.path.join(img_dir_out, f"{cam_name}.jpg"),
                cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
            )

            # lidar returns whose primary projection hits this camera,
            # scattered at the dataset's projection indices with CAMERA-Z
            # depth (reference extract_waymo_data.py:99-108)
            cc = calibs_by_id[img_proto.name]
            mask = cp_all[..., 0] == img_proto.name
            _, _, depth_z = project_points_to_camera(
                points_all[mask],
                np.array(cc.extrinsic.transform, np.float64).reshape(4, 4),
                intrinsic_matrix4(*cc.intrinsic[:4]),
            )
            depth_img = scatter_depth_image(
                img.shape[0], img.shape[1],
                cp_all[mask, 1], cp_all[mask, 2], depth_z,
            )
            cv2.imwrite(
                os.path.join(depth_dir_out, f"{cam_name}_depth.png"),
                encode_depth_png(depth_img),
            )

        frames_info.append(build_frame_info(seg_name, frame_idx, rel_dir, calib))

    return frames_info


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True, help="directory of *.tfrecord segments")
    p.add_argument("--out-root", required=True)
    p.add_argument("--split", default="training")
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args()

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

    from multiprocessing import Pool

    segments = sorted(glob.glob(os.path.join(args.data_root, "*.tfrecord")))
    assert segments, f"no tfrecords under {args.data_root}"
    out_dir = os.path.join(args.out_root, args.split)
    os.makedirs(out_dir, exist_ok=True)

    with Pool(args.workers) as pool:
        all_infos = pool.map(extract_segment, [(s, out_dir) for s in segments])

    infos = assemble_infos(all_infos)
    os.makedirs(os.path.join(args.out_root, "infos"), exist_ok=True)
    with open(os.path.join(args.out_root, "infos", f"{args.split}_infos.pkl"), "wb") as f:
        pickle.dump(infos, f)
    print(
        f"extracted {len(infos['frames'])} frames from {len(segments)} segments → {out_dir}"
    )


if __name__ == "__main__":
    main()
