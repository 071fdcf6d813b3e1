"""Fabricated Waymo frame-lite scenes with known geometry (see
cm3d_tpu/datasets/waymo/frontend.py for the exchange-format contract)."""

from __future__ import annotations

from pathlib import Path

import numpy as np

from cm3d_tpu.config import SHAPE_PRIORS_CHATGPT
from cm3d_tpu.datasets.artifacts import FrameMasks, MaskArtifactStore
from cm3d_tpu.datasets.waymo.frontend import _AXES
from cm3d_tpu.datasets.waymo.proto import (
    LABEL_TYPE_CYCLIST,
    LABEL_TYPE_PEDESTRIAN,
    LABEL_TYPE_VEHICLE,
)

MASK_W, MASK_H = 1024, 664
RATIO = 1024.0 / 1920.0
FOCAL = 2000.0
FULL_W, FULL_H = 1920, 1280
N_CAMS = 5

NAME_TO_TYPE = {
    "car": LABEL_TYPE_VEHICLE,
    "truck": LABEL_TYPE_VEHICLE,
    "pedestrian": LABEL_TYPE_PEDESTRIAN,
    "bicycle": LABEL_TYPE_CYCLIST,
}


def _rotz(yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], float)


def make_fake_waymo(
    frames_root: Path, mask_dir: Path, n_frames: int = 2, n_objects: int = 8,
    seed: int = 0, jpg_wh: tuple = (96, 64),
):
    rng = np.random.default_rng(seed)
    scene = "segment-000"
    (Path(frames_root) / scene).mkdir(parents=True, exist_ok=True)
    store = MaskArtifactStore(mask_dir)

    # vehicle pose: global yaw + offset (same every frame; static scene)
    pose_yaw = 0.7
    pose = np.eye(4)
    pose[:3, :3] = _rotz(pose_yaw)
    pose[:3, 3] = [100.0, -50.0, 0.0]

    lidar_ext = np.eye(4)
    lidar_ext[:3, 3] = [1.4, 0.0, 2.0]

    # cameras: ring of optical frames; waymo extrinsic = tm @ AXES
    axes_swap = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], float)
    cam_ext = np.zeros((N_CAMS, 4, 4))
    cam_intr = np.zeros((N_CAMS, 9))
    tms = []
    for ci in range(N_CAMS):
        heading = 2 * np.pi * ci / N_CAMS
        tm = np.eye(4)
        tm[:3, :3] = _rotz(heading) @ axes_swap
        tm[:3, 3] = [1.0, 0.0, 1.8]
        cam_ext[ci] = tm @ _AXES
        cam_intr[ci, :4] = [FOCAL, FOCAL, FULL_W / 2, FULL_H / 2]
        tms.append(tm)

    # objects in VEHICLE frame
    names = list(NAME_TO_TYPE.keys())
    objects = []
    for j in range(n_objects):
        ci = j % N_CAMS
        heading = 2 * np.pi * ci / N_CAMS
        dist = rng.uniform(10, 35)
        name = names[j % len(names)]
        w, l, h = SHAPE_PRIORS_CHATGPT[name]
        center = np.array([dist * np.cos(heading), dist * np.sin(heading), h / 2])
        objects.append({"name": name, "center": center, "size": (w, l, h), "cam": ci})

    # lanes: global-frame straight polylines around the vehicle
    lane_polylines = []
    base = pose[:3, 3]
    for yaw in [pose_yaw, pose_yaw + np.pi / 2]:
        d = np.array([np.cos(yaw), np.sin(yaw), 0.0])
        pts = base + d[None] * np.linspace(-50, 50, 101)[:, None]
        lane_polylines.append(pts)

    from cm3d_tpu.ops.range_image import points_to_range_image
    import jax.numpy as jnp

    h_ri, w_ri = 64, 2650
    incl = np.linspace(0.04, -0.3, h_ri).astype(np.float32)

    for f in range(n_frames):
        pts = []
        for obj in objects:
            npts = int(rng.integers(80, 200))
            spread = np.array(obj["size"]) / 4
            cluster = rng.normal(0, 1, (npts, 3)) * spread
            if obj["name"] in ("car", "truck"):
                u = obj["center"][:2] / np.linalg.norm(obj["center"][:2])
                radial = cluster[:, :2] @ u
                cluster[:, :2] -= (radial + np.abs(radial))[:, None] * u[None, :]
            pts.append(obj["center"] + cluster)
        ground = rng.uniform([-50, -50, -0.1], [50, 50, 0.1], (3000, 3))
        pts.append(ground)
        pts = np.concatenate(pts)
        ri = np.asarray(
            points_to_range_image(
                jnp.asarray(pts.astype(np.float32)),
                jnp.asarray(incl),
                jnp.asarray(lidar_ext.astype(np.float32)),
                h_ri,
                w_ri,
            )
        )

        # masks from projected object centers
        masks = np.zeros((n_objects, MASK_W, MASK_H), np.uint8)
        labels, scores, cams = [], [], []
        mi = 0
        for obj in objects:
            ci = obj["cam"]
            tm = tms[ci]
            p = np.linalg.inv(tm)[:3, :3] @ (obj["center"] - tm[:3, 3])
            if p[2] < 1:
                continue
            k = np.array([[FOCAL, 0, FULL_W / 2], [0, FOCAL, FULL_H / 2], [0, 0, 1.0]])
            k = k * RATIO
            k[2, 2] = 1
            uvw = k @ p
            px, py = uvw[0] / uvw[2], uvw[1] / uvw[2]
            if not (4 < px < MASK_W - 4 and 4 < py < MASK_H - 4):
                continue
            rx = max(6, int(FOCAL * RATIO * max(obj["size"][:2]) / (2 * p[2])))
            ry = max(6, int(FOCAL * RATIO * obj["size"][2] / (2 * p[2])))
            xs = np.arange(MASK_W)[:, None]
            ys = np.arange(MASK_H)[None, :]
            masks[mi] = ((xs - px) / rx) ** 2 + ((ys - py) / ry) ** 2 <= 1.0
            labels.append(obj["name"])
            scores.append(float(rng.uniform(0.5, 1.0)))
            cams.append(ci)
            mi += 1
        store.write_frame(scene, f, FrameMasks(labels, scores, cams, masks[:mi]))

        labels_box = np.array(
            [
                [*o["center"], o["size"][0], o["size"][1], o["size"][2], 0.0]
                for o in objects
            ]
        )
        # tiny camera jpegs so the mask-stage CLI runs on the fixture
        import io as _io

        from PIL import Image as _Image

        jpgs = []
        jw, jh = jpg_wh
        for _ in range(N_CAMS):
            buf = _io.BytesIO()
            _Image.fromarray(
                (rng.random((jh, jw, 3)) * 80 + 60).astype(np.uint8)
            ).save(buf, format="JPEG")
            jpgs.append(np.frombuffer(buf.getvalue(), np.uint8))

        np.savez(
            Path(frames_root) / scene / f"frame_{f:03d}.npz",
            context_name=f"ctx_{scene}",
            timestamp_micros=np.int64(1_000_000 * (f + 1)),
            pose=pose,
            range_image=ri.astype(np.float32),
            inclinations=incl,
            lidar_extrinsic=lidar_ext.astype(np.float32),
            cam_intrinsic=cam_intr,
            cam_extrinsic=cam_ext,
            cam_images_jpeg=np.array(jpgs, dtype=object),
            lane_polylines=np.array(lane_polylines, dtype=object),
            labels_box=labels_box,
            labels_type=np.array([NAME_TO_TYPE[o["name"]] for o in objects]),
            labels_num_points=np.full(n_objects, 50),
            labels_id=np.array([f"obj{j}" for j in range(n_objects)]),
        )
    store.mark_scene_complete(scene, n_frames)
    return {"scene": scene, "objects": objects, "pose": pose}
