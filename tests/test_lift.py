"""End-to-end test of the fused lift step against the numpy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as R

from cm3d_tpu.ops import LiftParams, lift_keyframe
from cm3d_tpu.ops.bitmask import pack_masks_np
from cm3d_tpu.ops.lift import build_boxes
from oracle import (
    lift_mask_oracle,
    push_centroid_oracle,
    quat_wxyz_to_mat,
    view_points_np,
)

RNG = np.random.default_rng(7)

W, H = 256, 144  # small synthetic "image" (mask stored [x, y])


def make_camera(yaw):
    """A camera at ego origin looking along ego +x rotated by yaw."""
    ego_t = np.array([1000.0, 500.0, 1.0])
    ego_q = np.roll(R.from_euler("z", 0.3).as_quat(), 1)  # wxyz
    cam_t = np.array([1.5, 0.0, 1.6])
    # camera frame: z forward, x right, y down
    cam_rot = R.from_euler("z", yaw).as_matrix() @ np.array(
        [[0, 0, 1], [-1, 0, 0], [0, -1, 0]], float
    )
    cam_q = np.roll(R.from_matrix(cam_rot).as_quat(), 1)
    intr = np.array([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1.0]])
    return ego_t, ego_q, cam_t, cam_q, intr


def make_scene(n_points=5000, n_masks=6):
    ego_t, ego_q, cam_t, cam_q, intr = make_camera(0.0)
    # points in global frame, clustered in front of the camera
    ego_rot = R.from_quat(np.roll(ego_q, -1)).as_matrix()
    local = RNG.uniform([3, -15, -2], [60, 15, 3], size=(n_points, 3))
    pts_global = (ego_rot @ local.T).T + ego_t
    points = np.concatenate(
        [pts_global, RNG.random((n_points, 1))], axis=1
    ).astype(np.float32)

    masks = np.zeros((n_masks, W, H), bool)
    for m in range(n_masks):
        cx, cy = RNG.integers(20, W - 20), RNG.integers(20, H - 20)
        rx, ry = RNG.integers(8, 40), RNG.integers(8, 30)
        xs, ys = np.meshgrid(np.arange(W), np.arange(H), indexing="ij")
        masks[m] = ((xs - cx) / rx) ** 2 + ((ys - cy) / ry) ** 2 <= 1.0
    return points, masks, (ego_t, ego_q, cam_t, cam_q, intr)


def test_lift_matches_oracle():
    points, masks, (ego_t, ego_q, cam_t, cam_q, intr) = make_scene()
    n, m = len(points), len(masks)
    params = LiftParams(min_dist=2.3, max_points_per_mask=4096, erode=False)

    out = lift_keyframe(
        jnp.asarray(points),
        jnp.ones(n, bool),
        jnp.asarray(ego_t[None].astype(np.float32)),
        jnp.asarray(ego_q[None].astype(np.float32)),
        jnp.asarray(cam_t[None].astype(np.float32)),
        jnp.asarray(cam_q[None].astype(np.float32)),
        jnp.asarray(intr[None].astype(np.float32)),
        jnp.asarray(pack_masks_np(masks)),
        jnp.zeros(m, jnp.int32),
        jnp.ones(m, bool),
        params,
    )

    n_checked = 0
    for i in range(m):
        sel_ref, med_ref, centroid_ref = lift_mask_oracle(
            points, masks[i], ego_t, ego_q, cam_t, cam_q, intr
        )
        assert int(out.point_counts[i]) == len(sel_ref), f"mask {i} count"
        if len(sel_ref) == 0:
            assert not bool(out.has_points[i])
            continue
        n_checked += 1
        assert bool(out.has_points[i])
        np.testing.assert_allclose(
            np.asarray(out.centroids[i]), centroid_ref, rtol=1e-4, atol=1e-3
        )
    assert n_checked >= 3, "synthetic scene should have several non-empty masks"


def test_lift_erosion_shrinks_counts():
    points, masks, (ego_t, ego_q, cam_t, cam_q, intr) = make_scene()
    n, m = len(points), len(masks)
    args = (
        jnp.asarray(points),
        jnp.ones(n, bool),
        jnp.asarray(ego_t[None].astype(np.float32)),
        jnp.asarray(ego_q[None].astype(np.float32)),
        jnp.asarray(cam_t[None].astype(np.float32)),
        jnp.asarray(cam_q[None].astype(np.float32)),
        jnp.asarray(intr[None].astype(np.float32)),
        jnp.asarray(pack_masks_np(masks)),
        jnp.zeros(m, jnp.int32),
        jnp.ones(m, bool),
    )
    no_erode = lift_keyframe(*args, LiftParams(erode=False))
    erode = lift_keyframe(*args, LiftParams(erode=True))
    assert (np.asarray(erode.point_counts) <= np.asarray(no_erode.point_counts)).all()


def test_lift_invalid_masks_and_points():
    points, masks, (ego_t, ego_q, cam_t, cam_q, intr) = make_scene()
    n, m = len(points), len(masks)
    pvalid = np.ones(n, bool)
    pvalid[::2] = False  # half the points are padding
    mvalid = np.ones(m, bool)
    mvalid[0] = False
    out = lift_keyframe(
        jnp.asarray(points),
        jnp.asarray(pvalid),
        jnp.asarray(ego_t[None].astype(np.float32)),
        jnp.asarray(ego_q[None].astype(np.float32)),
        jnp.asarray(cam_t[None].astype(np.float32)),
        jnp.asarray(cam_q[None].astype(np.float32)),
        jnp.asarray(intr[None].astype(np.float32)),
        jnp.asarray(pack_masks_np(masks)),
        jnp.zeros(m, jnp.int32),
        jnp.asarray(mvalid),
        LiftParams(erode=False),
    )
    assert not bool(out.has_points[0])
    # oracle on the valid half only
    sel_ref, _, centroid_ref = lift_mask_oracle(
        points[~np.arange(n) % 2 == 0], masks[1], ego_t, ego_q, cam_t, cam_q, intr
    )
    # (just consistency: counts must be <= full-cloud counts)
    full = lift_keyframe(
        jnp.asarray(points),
        jnp.ones(n, bool),
        jnp.asarray(ego_t[None].astype(np.float32)),
        jnp.asarray(ego_q[None].astype(np.float32)),
        jnp.asarray(cam_t[None].astype(np.float32)),
        jnp.asarray(cam_q[None].astype(np.float32)),
        jnp.asarray(intr[None].astype(np.float32)),
        jnp.asarray(pack_masks_np(masks)),
        jnp.zeros(m, jnp.int32),
        jnp.ones(m, bool),
        LiftParams(erode=False),
    )
    assert (np.asarray(out.point_counts) <= np.asarray(full.point_counts)).all()


def test_build_boxes_pushback_and_nms():
    m = 8
    centroids = RNG.uniform(-30, 30, size=(m, 3)).astype(np.float32)
    has_points = np.ones(m, bool)
    has_points[-1] = False
    labels = np.array([0, 0, 1, 5, 5, 2, 0, 0], np.int32)  # 0=car,1=truck,5=ped
    scores = RNG.random(m).astype(np.float32)
    lanes = RNG.uniform(-40, 40, size=(64, 3)).astype(np.float32)
    ego_t = np.zeros(3, np.float32)
    priors = np.array(
        [[1.8, 4.5, 1.4], [2.6, 8.0, 3.6], [2.5, 12.0, 4.0], [2.6, 12, 3.6],
         [2.0, 4.5, 2.5], [0.4, 0.7, 1.7], [0.8, 2.1, 1.7], [0.6, 1.8, 1.4],
         [0.3, 0.3, 0.7], [0.5, 1.2, 0.9]],
        np.float32,
    )
    is_vehicle = np.array([1, 1, 1, 1, 1, 0, 0, 0, 0, 1], bool)
    radii = np.array([4, 12, 10, 10, 12, 0.175, 0.85, 0.85, 0.175, 1], np.float32)

    out = build_boxes(
        jnp.asarray(centroids),
        jnp.asarray(has_points),
        jnp.asarray(labels),
        jnp.asarray(scores),
        jnp.asarray(lanes),
        jnp.ones(64, bool),
        jnp.asarray(ego_t),
        jnp.asarray(priors),
        jnp.asarray(is_vehicle),
        jnp.asarray(radii),
    )
    # invalid mask slot never kept
    assert not bool(out.keep[-1])
    # non-vehicle (pedestrian) centers unchanged, yaw 0
    for i in [3, 4]:
        np.testing.assert_allclose(np.asarray(out.centers[i]), centroids[i], atol=1e-6)
        assert float(out.yaws[i]) == 0.0
    # vehicle pushback matches oracle given the assigned lane yaw
    from scipy.spatial.distance import cdist

    dm = cdist(centroids[:, :2], lanes[:, :2])
    lane_idx = dm.argmin(1)
    for i in [0, 1, 2]:
        yaw = lanes[lane_idx[i], 2]
        ref = push_centroid_oracle(centroids[i], priors[labels[i]], yaw, ego_t)
        np.testing.assert_allclose(np.asarray(out.centers[i]), ref, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_lift_multi_camera_matches_oracle():
    """Masks spread over 3 cameras: per-mask counts/centroids match the
    single-camera oracle applied with each mask's own calibration."""
    from cm3d_tpu.config import LiftStageConfig

    rng = np.random.default_rng(21)
    n_cams, n_masks = 3, 9
    ego_t = np.array([50.0, -20.0, 0.5])
    ego_q = np.roll(R.from_euler("z", -0.7).as_quat(), 1)
    cams = []
    for ci in range(n_cams):
        cam_t = np.array([1.2, 0.1 * ci, 1.5])
        rot = R.from_euler("z", 2 * np.pi * ci / n_cams).as_matrix() @ np.array(
            [[0, 0, 1], [-1, 0, 0], [0, -1, 0]], float
        )
        cam_q = np.roll(R.from_matrix(rot).as_quat(), 1)
        intr = np.array([[150.0, 0, W / 2], [0, 150.0, H / 2], [0, 0, 1.0]])
        cams.append((cam_t, cam_q, intr))

    ego_rot = R.from_quat(np.roll(ego_q, -1)).as_matrix()
    pts = []
    for ci in range(n_cams):
        heading = 2 * np.pi * ci / n_cams
        local = rng.uniform([5, -10, -2], [45, 10, 3], size=(1500, 3))
        rot2 = R.from_euler("z", heading).as_matrix()
        pts.append((ego_rot @ (rot2 @ local.T)).T + ego_t)
    points = np.concatenate(
        [np.concatenate(pts), rng.random((4500, 1))], axis=1
    ).astype(np.float32)

    masks = np.zeros((n_masks, W, H), bool)
    mask_cam = np.array([i % n_cams for i in range(n_masks)], np.int32)
    for m in range(n_masks):
        cx, cy = rng.integers(30, W - 30), rng.integers(30, H - 30)
        rx, ry = rng.integers(12, 50), rng.integers(10, 35)
        xs, ys = np.meshgrid(np.arange(W), np.arange(H), indexing="ij")
        masks[m] = ((xs - cx) / rx) ** 2 + ((ys - cy) / ry) ** 2 <= 1.0

    out = lift_keyframe(
        jnp.asarray(points),
        jnp.ones(len(points), bool),
        jnp.asarray(np.tile(ego_t, (n_cams, 1)).astype(np.float32)),
        jnp.asarray(np.tile(ego_q, (n_cams, 1)).astype(np.float32)),
        jnp.asarray(np.stack([c[0] for c in cams]).astype(np.float32)),
        jnp.asarray(np.stack([c[1] for c in cams]).astype(np.float32)),
        jnp.asarray(np.stack([c[2] for c in cams]).astype(np.float32)),
        jnp.asarray(pack_masks_np(masks)),
        jnp.asarray(mask_cam),
        jnp.ones(n_masks, bool),
        LiftParams(erode=False, max_points_per_mask=4096),
    )
    n_checked = 0
    for i in range(n_masks):
        cam_t, cam_q, intr = cams[mask_cam[i]]
        sel_ref, _, centroid_ref = lift_mask_oracle(
            points, masks[i], ego_t, ego_q, cam_t, cam_q, intr
        )
        assert int(out.point_counts[i]) == len(sel_ref), f"mask {i}"
        if len(sel_ref):
            n_checked += 1
            np.testing.assert_allclose(
                np.asarray(out.centroids[i]), centroid_ref, rtol=1e-4, atol=1e-3
            )
    assert n_checked >= 5


@pytest.mark.slow
def test_invalid_masks_do_not_consume_union_capacity():
    """An invalid mask's pixels must be invisible to the any-mask union:
    with a huge rejected-class mask and a tiny NU budget, the valid mask
    keeps every one of its points and the camera does not report
    truncation (the reference never carries unmapped-class masks into the
    lift at all)."""
    points, _, (ego_t, ego_q, cam_t, cam_q, intr) = make_scene(n_points=4000)
    masks = np.zeros((2, W, H), bool)
    masks[0, 10:-10, 10:-10] = True  # INVALID: covers nearly the image
    masks[1, 100:130, 60:90] = True  # valid: small box
    mvalid = np.array([False, True])

    def run(mv):
        return lift_keyframe(
            jnp.asarray(points),
            jnp.ones(len(points), bool),
            jnp.asarray(ego_t[None].astype(np.float32)),
            jnp.asarray(ego_q[None].astype(np.float32)),
            jnp.asarray(cam_t[None].astype(np.float32)),
            jnp.asarray(cam_q[None].astype(np.float32)),
            jnp.asarray(intr[None].astype(np.float32)),
            jnp.asarray(pack_masks_np(masks)),
            jnp.zeros(2, jnp.int32),
            jnp.asarray(mv),
            LiftParams(erode=False, max_points_in_masks=1024),
        )

    out = run(mvalid)
    # reference count: the same mask alone with a roomy budget
    alone = lift_keyframe(
        jnp.asarray(points),
        jnp.ones(len(points), bool),
        jnp.asarray(ego_t[None].astype(np.float32)),
        jnp.asarray(ego_q[None].astype(np.float32)),
        jnp.asarray(cam_t[None].astype(np.float32)),
        jnp.asarray(cam_q[None].astype(np.float32)),
        jnp.asarray(intr[None].astype(np.float32)),
        jnp.asarray(pack_masks_np(masks[1:])),
        jnp.zeros(1, jnp.int32),
        jnp.ones(1, bool),
        LiftParams(erode=False),
    )
    want = int(alone.point_counts[0])
    assert want > 0
    assert int(out.point_counts[1]) == want
    assert not bool(out.cam_truncated[0])
    np.testing.assert_allclose(np.asarray(out.centroids[1]),
                               np.asarray(alone.centroids[0]), atol=1e-5)
    # with BOTH masks valid the big one genuinely overflows the budget
    both = run(np.array([True, True]))
    assert bool(both.cam_truncated[0])


@pytest.mark.parametrize("seed", [11, 23, 37, 59, 83, 97])
def test_lift_fuzz_random_geometry_matches_oracle(seed):
    """Property fuzz: randomized ego pose (global-scale translation, full
    3D rotation), camera yaw/pitch, intrinsics, border-clipped elliptical
    masks, and a point mixture (frustum clusters + surrounding sphere +
    behind-camera) must match the numpy f64 oracle mask-for-mask on
    selected counts, medoid index, and centroid.

    Points whose ORACLE projection lands within a hair of a pixel-floor or
    window/min_dist boundary are dropped before the comparison: those
    straddles are measure-zero parity-irrelevant f32-vs-f64 artifacts, and
    removing them is what makes the exact-count assertion meaningful
    across arbitrary seeds."""
    rng = np.random.default_rng(seed)

    # random ego pose at real global magnitudes (reference scenes sit at
    # ~1e3 m) and a random full 3D rotation
    ego_t = rng.uniform(200.0, 1500.0, 3)
    ego_t[2] = rng.uniform(0.0, 3.0)
    ego_q = np.roll(R.random(rng=rng).as_quat(), 1)
    cam_t = np.array([rng.uniform(0.5, 2.0), rng.uniform(-1, 1),
                      rng.uniform(1.0, 2.0)])
    cam_rot = (
        R.from_euler("zyx", [rng.uniform(-np.pi, np.pi),
                             rng.uniform(-0.15, 0.15),
                             rng.uniform(-0.15, 0.15)]).as_matrix()
        @ np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], float)
    )
    cam_q = np.roll(R.from_matrix(cam_rot).as_quat(), 1)
    f = rng.uniform(80.0, 250.0)
    intr = np.array([
        [f, 0, W / 2 + rng.uniform(-20, 20)],
        [0, f * rng.uniform(0.9, 1.1), H / 2 + rng.uniform(-15, 15)],
        [0, 0, 1.0],
    ])

    # point mixture in the GLOBAL frame: camera-frustum clusters + a
    # uniform shell around the ego (includes behind-camera) + depths
    # brushing the min_dist frontier
    ego_rot = quat_wxyz_to_mat(ego_q)
    cam_rot_m = quat_wxyz_to_mat(cam_q)

    def cam_to_global(pc):
        pe = pc @ cam_rot_m.T + cam_t
        return pe @ ego_rot.T + ego_t

    n_frustum, n_shell, n_near = 2500, 1500, 300
    depth = rng.uniform(2.0, 70.0, n_frustum)
    px = rng.uniform(-8, W + 8, n_frustum)  # some project out of window
    py = rng.uniform(-6, H + 6, n_frustum)
    frustum_cam = np.stack([
        (px - intr[0, 2]) / intr[0, 0] * depth,
        (py - intr[1, 2]) / intr[1, 1] * depth,
        depth,
    ], 1)
    shell_local = rng.uniform(-60, 60, (n_shell, 3))
    near = frustum_cam[:n_near].copy()
    near[:, 2] = 2.3 + rng.uniform(-0.3, 0.3, n_near)  # min_dist frontier
    pts_global = np.concatenate([
        cam_to_global(frustum_cam),
        shell_local @ ego_rot.T + ego_t,
        cam_to_global(near),
    ])
    pts_global = np.concatenate(
        [pts_global, rng.random((len(pts_global), 1))], 1
    ).astype(np.float32)

    # drop oracle-boundary straddlers (see docstring)
    pts64 = pts_global[:, :3].astype(np.float64)
    p = (pts64 - ego_t) @ quat_wxyz_to_mat(ego_q)
    p = (p - cam_t) @ cam_rot_m
    proj, depths_o = view_points_np(p.T, intr)
    eps_px, eps_d = 0.02, 0.02
    frac_x = np.abs(proj[0] - np.round(proj[0]))
    frac_y = np.abs(proj[1] - np.round(proj[1]))
    safe = (
        (frac_x > eps_px) & (frac_y > eps_px)
        & (np.abs(depths_o - 2.3) > eps_d)
        & (np.abs(depths_o) > eps_d)  # normalization blowup guard
    )
    points = pts_global[safe]
    n = len(points)

    # elliptical masks, some clipped by the image border
    m = 8
    masks = np.zeros((m, W, H), bool)
    xs, ys = np.meshgrid(np.arange(W), np.arange(H), indexing="ij")
    for i in range(m):
        cx = rng.integers(0, W)
        cy = rng.integers(0, H)
        rx = rng.integers(6, 60)
        ry = rng.integers(6, 40)
        masks[i] = ((xs - cx) / rx) ** 2 + ((ys - cy) / ry) ** 2 <= 1.0

    out = lift_keyframe(
        jnp.asarray(points),
        jnp.ones(n, bool),
        jnp.asarray(ego_t[None].astype(np.float32)),
        jnp.asarray(ego_q[None].astype(np.float32)),
        jnp.asarray(cam_t[None].astype(np.float32)),
        jnp.asarray(cam_q[None].astype(np.float32)),
        jnp.asarray(intr[None].astype(np.float32)),
        jnp.asarray(pack_masks_np(masks)),
        jnp.zeros(m, jnp.int32),
        jnp.ones(m, bool),
        LiftParams(min_dist=2.3, erode=False),
    )

    n_nonempty = 0
    for i in range(m):
        sel_ref, med_ref, centroid_ref = lift_mask_oracle(
            points, masks[i], ego_t, ego_q, cam_t, cam_q, intr
        )
        assert int(out.point_counts[i]) == len(sel_ref), (
            f"seed {seed} mask {i}: count {int(out.point_counts[i])} "
            f"vs oracle {len(sel_ref)}"
        )
        if len(sel_ref) == 0:
            assert not bool(out.has_points[i])
            continue
        n_nonempty += 1
        assert bool(out.has_points[i])
        np.testing.assert_allclose(
            np.asarray(out.centroids[i]), centroid_ref,
            rtol=1e-4, atol=3e-3, err_msg=f"seed {seed} mask {i}",
        )
    assert n_nonempty >= 2, f"seed {seed}: degenerate scene"


@pytest.mark.parametrize("seed", [101, 211, 307, 401])
def test_build_boxes_fuzz_matches_oracle(seed):
    """Property fuzz for pass 2: random centroids/labels/scores/lanes must
    match the oracle on pushback centers (vehicles), untouched non-vehicle
    centers, lane-yaw assignment restricted to VALID lanes, and the exact
    circle-NMS keep set (incl. deliberately clustered centroids so
    suppression actually fires). A margin precondition documents why the
    exact keep-set assertion cannot flake: no same-label pair may sit
    within 1e-3 of its suppression boundary (f32-vs-f64 straddle zone)."""
    from scipy.spatial.distance import cdist

    from oracle import circle_nms_oracle

    rng = np.random.default_rng(seed)
    m = 24
    # centroids away from the ego (alpha = arctan(|y|/|x|) is unstable at
    # the origin) with half of them CLUSTERED in pairs to exercise NMS
    base = rng.uniform(-40, 40, size=(m, 3))
    base[:, 2] = rng.uniform(-1.5, 1.5, m)
    base[np.linalg.norm(base[:, :2], axis=1) < 5.0, :2] += 10.0
    for i in range(0, m // 2, 2):
        base[i + 1, :2] = base[i, :2] + rng.uniform(-1.0, 1.0, 2)
    centroids = base.astype(np.float32)
    has_points = rng.random(m) > 0.15
    labels = rng.integers(0, 10, m).astype(np.int32)
    scores = rng.random(m).astype(np.float32)
    lanes = np.concatenate(
        [rng.uniform(-50, 50, (96, 2)), rng.uniform(-np.pi, np.pi, (96, 1))],
        axis=1,
    ).astype(np.float32)
    lane_valid = rng.random(96) > 0.25
    ego_t = rng.uniform(-5, 5, 3).astype(np.float32)
    priors = rng.uniform(
        [0.4, 0.7, 0.7], [2.8, 12.0, 4.0], (10, 3)
    ).astype(np.float32)
    is_vehicle = rng.random(10) > 0.4
    radii = rng.uniform(0.2, 8.0, 10).astype(np.float32)

    out = build_boxes(
        jnp.asarray(centroids),
        jnp.asarray(has_points),
        jnp.asarray(labels),
        jnp.asarray(scores),
        jnp.asarray(lanes),
        jnp.asarray(lane_valid),
        jnp.asarray(ego_t),
        jnp.asarray(priors),
        jnp.asarray(is_vehicle),
        jnp.asarray(radii),
    )

    # oracle lane yaw: nearest VALID lane
    dm = cdist(centroids[:, :2].astype(np.float64),
               lanes[lane_valid, :2].astype(np.float64))
    lane_yaw = lanes[lane_valid, 2][dm.argmin(1)]

    centers_ref = np.zeros((m, 3))
    for i in range(m):
        if is_vehicle[labels[i]] and has_points[i]:
            centers_ref[i] = push_centroid_oracle(
                centroids[i], priors[labels[i]], lane_yaw[i], ego_t
            )
            assert abs(float(out.yaws[i]) - lane_yaw[i]) < 1e-5, i
        else:
            centers_ref[i] = centroids[i]
            assert float(out.yaws[i]) == 0.0, i
        if has_points[i]:
            np.testing.assert_allclose(
                np.asarray(out.centers[i]), centers_ref[i],
                rtol=1e-3, atol=2e-3, err_msg=f"seed {seed} box {i}",
            )
        np.testing.assert_allclose(
            np.asarray(out.sizes[i]), priors[labels[i]], atol=1e-6
        )

    # oracle circle NMS over the valid candidates at the oracle centers
    vidx = np.where(has_points)[0]
    dets = np.concatenate(
        [centers_ref[vidx, :2], scores[vidx, None].astype(np.float64)], 1
    )
    keep_local = circle_nms_oracle(dets, labels[vidx], radii.astype(np.float64))
    keep_ref = np.zeros(m, bool)
    keep_ref[vidx[np.asarray(keep_local, int)]] = True

    # margin precondition (see docstring): no same-label valid pair within
    # 1e-3 of its suppression radius
    d2 = cdist(centers_ref[vidx, :2], centers_ref[vidx, :2]) ** 2
    same = labels[vidx][:, None] == labels[vidx][None, :]
    thr = radii[labels[vidx]][None, :].astype(np.float64)
    off_diag = ~np.eye(len(vidx), dtype=bool)
    margin = np.abs(d2 - thr)[same & off_diag]
    assert margin.min() > 1e-3, f"seed {seed}: degenerate NMS boundary"

    np.testing.assert_array_equal(
        np.asarray(out.keep), keep_ref, err_msg=f"seed {seed} keep set"
    )
