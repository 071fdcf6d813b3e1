"""Export Waymo TFRecord segments to the frame-lite .npz exchange format.

Run this in an environment with tensorflow + waymo_open_dataset installed
(the framework itself is TF-free; see cm3d_tpu/datasets/waymo/frontend.py
for the field contract). One directory per segment, one npz per frame.

Usage:
  python scripts/export_waymo_frames.py SEGMENT.tfrecord... --out FRAMES_DIR
"""

import argparse
import os
import sys


def export_segment(path: str, out_root: str) -> int:
    import numpy as np
    import tensorflow.compat.v1 as tf
    from waymo_open_dataset import dataset_pb2

    name = os.path.basename(path).split(".")[0]
    out_dir = os.path.join(out_root, name)
    os.makedirs(out_dir, exist_ok=True)

    def _obj_arr(items):
        # local copy of cm3d_tpu.datasets.waymo.frame_proto._object_array
        # (this script runs in an external TF env where the package isn't
        # importable): element-wise fill keeps the array 1-D even when all
        # payloads share a shape (np.array(list, object) would go 2-D).
        out = np.empty(len(items), object)
        for i, it in enumerate(items):
            out[i] = it
        return out

    n = 0
    for f, data in enumerate(tf.data.TFRecordDataset(path, compression_type="")):
        frame = dataset_pb2.Frame()
        frame.ParseFromString(bytearray(data.numpy()))

        # TOP lidar first return
        laser = next(l for l in frame.lasers if l.name == 1)
        calib = next(c for c in frame.context.laser_calibrations if c.name == 1)
        ri_proto = laser.ri_return1.range_image_compressed
        import zlib

        ri = dataset_pb2.MatrixFloat()
        ri.ParseFromString(zlib.decompress(ri_proto))
        shape = list(ri.shape.dims)
        range_image = np.array(ri.data, np.float32).reshape(shape)[..., 0]
        # TOP rolling-shutter per-pixel pose [H, W, 6] (the reference
        # passes range_image_top_pose into the point-cloud conversion)
        ri_pose = np.zeros((0,), np.float32)
        if laser.ri_return1.range_image_pose_compressed:
            pm = dataset_pb2.MatrixFloat()
            pm.ParseFromString(
                zlib.decompress(laser.ri_return1.range_image_pose_compressed)
            )
            ri_pose = np.array(pm.data, np.float32).reshape(
                list(pm.shape.dims)
            )
        if calib.beam_inclinations:
            incl = np.array(calib.beam_inclinations, np.float32)[::-1]
        else:
            h = range_image.shape[0]
            ratios = (np.arange(h) + 0.5) / h
            incl = (calib.beam_inclination_max
                    + ratios * (calib.beam_inclination_min
                                - calib.beam_inclination_max)).astype(np.float32)

        cams = sorted(frame.context.camera_calibrations, key=lambda c: c.name)
        cam_intr = np.stack([np.array(c.intrinsic, np.float64) for c in cams])
        cam_ext = np.stack(
            [np.array(c.extrinsic.transform, np.float64).reshape(4, 4) for c in cams]
        )
        images = sorted(frame.images, key=lambda im: im.name)
        cam_images = np.empty(len(images), object)
        for i, im in enumerate(images):
            cam_images[i] = np.frombuffer(im.image, np.uint8)

        lane_polylines = []
        for feat in frame.map_features:
            if feat.HasField("lane"):
                pts = np.array(
                    [[p.x, p.y, p.z] for p in feat.lane.polyline], np.float64
                )
                if len(pts):
                    lane_polylines.append(pts)

        labels_box, labels_type, labels_np, labels_id = [], [], [], []
        for lab in frame.laser_labels:
            b = lab.box
            labels_box.append(
                [b.center_x, b.center_y, b.center_z, b.width, b.length,
                 b.height, b.heading]
            )
            labels_type.append(lab.type)
            labels_np.append(lab.num_lidar_points_in_box)
            labels_id.append(lab.id)

        np.savez(
            os.path.join(out_dir, f"frame_{f:03d}.npz"),
            context_name=frame.context.name,
            timestamp_micros=np.int64(frame.timestamp_micros),
            pose=np.array(frame.pose.transform, np.float64).reshape(4, 4),
            range_image=range_image,
            range_image_pose=ri_pose,
            inclinations=incl,
            lidar_extrinsic=np.array(
                calib.extrinsic.transform, np.float64
            ).reshape(4, 4),
            cam_intrinsic=cam_intr,
            cam_extrinsic=cam_ext,
            cam_images_jpeg=cam_images,
            lane_polylines=_obj_arr(lane_polylines),
            labels_box=np.array(labels_box, np.float64).reshape(-1, 7),
            labels_type=np.array(labels_type, np.int32),
            labels_num_points=np.array(labels_np, np.int32),
            labels_id=np.array(labels_id),
        )
        n += 1
    return n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("segments", nargs="+")
    p.add_argument("--out", required=True)
    args = p.parse_args()
    for seg in args.segments:
        n = export_segment(seg, args.out)
        print(f"{seg}: {n} frames")


if __name__ == "__main__":
    main()
