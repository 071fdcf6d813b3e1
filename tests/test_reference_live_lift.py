"""A/B the nuScenes lift core against the reference's OWN code, executed.

Upgrades the parity evidence from transcription-anchored (tests/oracle.py,
a hand-written numpy mirror) to reference-anchored: tests/ref_live.py
imports /root/reference/src/nuscenes/{2d_to_3d.py, utils/pcd.py} with the
absent heavy deps stubbed, and these tests CALL the reference functions —
get_medoid (2d_to_3d.py:116-119), push_centroid (:164-198),
lane_yaws_distances_and_coords (:277-302), circle_nms (:309-332),
get_detection_name/get_shape_prior (:121-159), view_points and the
LidarPointCloud transform chain (utils/pcd.py) — as the oracle for both
tests/oracle.py and the JAX implementation.

The per-mask point-selection glue (within-window/floor/mask-lookup,
2d_to_3d.py:596-625) is inline in the reference's main loop and cannot be
imported; test_full_mask_lift mirrors those few expressions in torch
around the live-imported transform/projection/medoid calls, so every
substantial computation in the composite A/B is reference code running.
"""

import numpy as np
import pytest

import ref_live
from oracle import (
    circle_nms_oracle,
    lift_mask_oracle,
    push_centroid_oracle,
    quat_wxyz_to_mat,
    view_points_np,
)

pytestmark = pytest.mark.skipif(
    not ref_live.reference_available(),
    reason="reference mount /root/reference not present",
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    return ref_live.load_2d_to_3d()


RNG = np.random.default_rng(42)


# ---- unit A/Bs ---------------------------------------------------------


def test_get_medoid_live(ref):
    """Reference get_medoid vs our Pallas/XLA masked_medoid: identical
    index on clustered, duplicated, and singleton point sets."""
    from cm3d_tpu.ops.medoid import masked_medoid

    for n in (1, 2, 7, 60, 300):
        pts = RNG.normal(scale=3.0, size=(3, n)).astype(np.float32)
        ref_idx = int(ref.get_medoid(torch.from_numpy(pts)))

        k = max(n, 8)  # pad like the lift does
        padded = np.zeros((1, k, 3), np.float32)
        padded[0, :n] = pts.T
        valid = np.zeros((1, k), bool)
        valid[0, :n] = True
        ours = int(np.asarray(masked_medoid(padded, valid))[0])
        assert ours == ref_idx, f"n={n}"


def test_view_points_live(ref):
    """Reference view_points (utils/pcd.py) vs the transcribed oracle:
    same projection and depths (f32 execution on both sides)."""
    pts = RNG.normal(scale=10.0, size=(3, 500)).astype(np.float32)
    pts[2] += 25.0
    intr = np.array(
        [[420.0, 0.0, 320.0], [0.0, 410.0, 180.0], [0.0, 0.0, 1.0]],
        np.float32,
    )
    got, depths = ref.view_points(
        torch.from_numpy(pts), torch.from_numpy(intr), normalize=True,
        device="cpu",
    )
    want, want_depths = view_points_np(pts.astype(np.float64), intr)
    np.testing.assert_allclose(got.numpy(), want, rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(depths.numpy(), want_depths, rtol=1e-6)


def test_transform_chain_live(ref):
    """Reference LidarPointCloud translate/rotate global->ego->camera
    (the 2d_to_3d.py:571-580 chain) vs the oracle's closed-form chain."""
    from scipy.spatial.transform import Rotation as R

    pts = RNG.normal(scale=20.0, size=(200, 3)) + [1000.0, 500.0, 1.0]
    pts4 = np.concatenate([pts, RNG.random((200, 1))], 1).astype(np.float32)
    ego_t = np.array([1000.0, 500.0, 1.0])
    ego_q = np.roll(R.from_euler("z", 0.4).as_quat(), 1)
    cam_t = np.array([1.5, 0.2, 1.6])
    cam_q = np.roll(R.from_euler("zx", [0.8, -1.2]).as_quat(), 1)

    pc = ref.LidarPointCloud(torch.from_numpy(pts4.T.copy()))
    pc.translate(torch.from_numpy(-ego_t).to(dtype=torch.float32))
    pc.rotate(torch.from_numpy(quat_wxyz_to_mat(ego_q).T)
              .to(dtype=torch.float32))
    pc.translate(torch.from_numpy(-cam_t).to(dtype=torch.float32))
    pc.rotate(torch.from_numpy(quat_wxyz_to_mat(cam_q).T)
              .to(dtype=torch.float32))

    want = (pts - ego_t) @ quat_wxyz_to_mat(ego_q)
    want = (want - cam_t) @ quat_wxyz_to_mat(cam_q)
    np.testing.assert_allclose(
        pc.points[:3].numpy().T, want, rtol=1e-5, atol=2e-3
    )


def test_push_centroid_live(ref):
    """Reference push_centroid vs the transcribed oracle across all four
    alpha quadrants and yaws beyond pi/2 (where the reference's
    wxyz-quaternion-into-scipy-xyzw-slot quirk changes the answer)."""
    cases = [
        (np.array([12.0, 7.0, 1.1]), 0.3),
        (np.array([-9.0, 4.0, 0.8]), 1.2),
        (np.array([-15.0, -3.0, 1.4]), 2.1),   # yaw > pi/2
        (np.array([6.0, -11.0, 0.9]), -0.7),
        (np.array([20.0, 0.5, 1.0]), 0.0),
    ]
    extents = np.array([4.6, 1.9, 1.7])
    av = np.array([3.0, -2.0, 0.0])
    for centroid, yaw in cases:
        quat_wxyz = [np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)]
        got = ref.push_centroid(
            centroid.copy(), extents, quat_wxyz, {"translation": av}
        )
        want = push_centroid_oracle(centroid, extents, yaw, av)
        np.testing.assert_allclose(got, want, rtol=1e-12, err_msg=str(yaw))


def test_circle_nms_live(ref):
    """Reference circle_nms vs BOTH the oracle and the fixpoint JAX
    circle_nms_keep: identical keep set (distinct scores — the
    reference's unstable argsort makes exact ties undefined)."""
    import jax.numpy as jnp

    from cm3d_tpu.ops.nms import circle_nms_keep

    n, n_classes = 40, 3
    dets = np.zeros((n, 3))
    dets[:, :2] = RNG.uniform(-20, 20, (n, 2))
    dets[:, 2] = RNG.permutation(n) / n  # distinct scores
    labels = RNG.integers(0, n_classes, n)
    threshs = np.array([16.0, 4.0, 1.0])

    ref_keep = sorted(int(i) for i in ref.circle_nms(dets, labels, threshs))
    oracle_keep = sorted(circle_nms_oracle(dets, labels, threshs))
    assert ref_keep == oracle_keep

    ours = np.asarray(circle_nms_keep(
        jnp.asarray(dets[:, :2]), jnp.asarray(dets[:, 2]),
        jnp.asarray(labels, jnp.int32), jnp.ones(n, bool),
        jnp.asarray(threshs),
    ))
    assert sorted(np.flatnonzero(ours).tolist()) == ref_keep


def test_lane_yaws_live(ref):
    """Reference lane_yaws_distances_and_coords vs our nearest_lane:
    same assigned yaw/coords and distances."""
    import jax.numpy as jnp

    from cm3d_tpu.ops.lanes import nearest_lane

    centroids = RNG.uniform(-50, 50, (12, 3))
    lanes = np.concatenate(
        [RNG.uniform(-60, 60, (200, 2)), RNG.uniform(-np.pi, np.pi, (200, 1))],
        axis=1,
    )
    yaws, dists, coords = ref.lane_yaws_distances_and_coords(
        centroids.astype(np.float32), lanes.astype(np.float32)
    )
    got_yaws, got_dists, got_coords = nearest_lane(
        jnp.asarray(centroids[:, :2], jnp.float32),
        jnp.asarray(lanes, jnp.float32),
        jnp.ones(len(lanes), bool),
    )
    np.testing.assert_allclose(np.asarray(got_yaws), yaws, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_dists), dists, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_coords), coords, rtol=1e-6)


def test_detection_name_and_shape_prior_live(ref):
    """Reference get_detection_name vs DETECTION_NAME_FIXUPS, and
    get_shape_prior's chatgpt=False key switch vs
    DATASET_MEAN_PRIOR_KEYS — the config tables the lift/eval stack is
    built on, now validated against the functions running."""
    from cm3d_tpu.config import (
        DATASET_MEAN_PRIOR_KEYS,
        DETECTION_NAME_FIXUPS,
        NUSCENES_CLASSES,
    )

    for raw in list(DETECTION_NAME_FIXUPS) + list(NUSCENES_CLASSES):
        want = DETECTION_NAME_FIXUPS.get(raw, raw)
        assert ref.get_detection_name(raw) == want, raw

    # unique sentinel per category key: the returned sentinel exposes
    # exactly which key the reference's switch selected
    sentinels = {key: object() for key in set(DATASET_MEAN_PRIOR_KEYS.values())}
    for name, key in DATASET_MEAN_PRIOR_KEYS.items():
        if name == "barrier":
            continue  # documented deviation: the reference has no case
        got = ref.get_shape_prior(sentinels, name, chatgpt=False)
        assert got is sentinels[key], name
    # chatgpt=True branch: direct dict lookup
    assert ref.get_shape_prior({"dog": (1, 2, 3)}, "dog") == (1, 2, 3)


def test_push_centroid_live_vs_jax(ref):
    """Reference push_centroid executed vs ops/pushback.py directly —
    including the documented equivalence: the reference's
    wxyz-into-scipy-xyzw euler round trip yields theta = yaw - pi, which
    our direct-yaw form matches because only |sin|/|cos| are used."""
    import jax.numpy as jnp

    from cm3d_tpu.ops.pushback import push_centroid

    rng = np.random.default_rng(11)
    m = 24
    centroids = np.zeros((m, 3))
    centroids[:, :2] = rng.uniform(-60, 60, (m, 2))
    centroids[:, 2] = rng.uniform(-1, 2, m)
    wlh = rng.uniform([1.5, 3.5, 1.2], [3.0, 12.0, 4.0], (m, 3))
    yaws = rng.uniform(-np.pi, np.pi, m)
    av = np.array([2.0, -1.0, 0.0])

    ours = np.asarray(push_centroid(
        jnp.asarray(centroids, jnp.float32), jnp.asarray(wlh, jnp.float32),
        jnp.asarray(yaws, jnp.float32), jnp.asarray(av, jnp.float32),
    ))
    for i in range(m):
        quat = [np.cos(yaws[i] / 2), 0.0, 0.0, np.sin(yaws[i] / 2)]
        want = ref.push_centroid(centroids[i].copy(), wlh[i], quat,
                                 {"translation": av})
        np.testing.assert_allclose(ours[i], want, rtol=2e-4, atol=5e-4,
                                   err_msg=f"i={i} yaw={yaws[i]}")


@pytest.mark.parametrize("dataset", ["waymo", "kitti"])
def test_fork_functions_live(dataset):
    """The Waymo/KITTI forks' hot functions, executed: our ONE shared
    implementation must agree with every fork (the reference triplicates
    these per dataset; the forks' push_centroid adds an ego_frame=True
    mode — boxes already in the ego frame — which equals our
    push_centroid with ego_translation = 0)."""
    import jax.numpy as jnp

    from cm3d_tpu.ops.medoid import masked_medoid
    from cm3d_tpu.ops.nms import circle_nms_keep
    from cm3d_tpu.ops.pushback import push_centroid

    fork = ref_live.load_2d_to_3d(dataset)
    rng = np.random.default_rng(13)

    # medoid (the fork drops the explicit p=2 — cdist's default; same op)
    pts = rng.normal(scale=3.0, size=(3, 80)).astype(np.float32)
    ref_idx = int(fork.get_medoid(torch.from_numpy(pts)))
    ours_idx = int(np.asarray(masked_medoid(
        pts.T[None], np.ones((1, 80), bool)
    ))[0])
    assert ours_idx == ref_idx

    # circle NMS (identical body across forks; pin it anyway)
    n = 30
    dets = np.zeros((n, 3))
    dets[:, :2] = rng.uniform(-20, 20, (n, 2))
    dets[:, 2] = rng.permutation(n) / n
    labels = rng.integers(0, 3, n)
    threshs = np.array([16.0, 4.0, 1.0])
    ref_keep = sorted(int(i) for i in fork.circle_nms(dets, labels, threshs))
    ours = np.asarray(circle_nms_keep(
        jnp.asarray(dets[:, :2]), jnp.asarray(dets[:, 2]),
        jnp.asarray(labels, jnp.int32), jnp.ones(n, bool),
        jnp.asarray(threshs),
    ))
    assert sorted(np.flatnonzero(ours).tolist()) == ref_keep

    # push_centroid ego_frame=True == ours with ego_translation = 0
    m = 12
    centroids = np.zeros((m, 3))
    centroids[:, :2] = rng.uniform(-50, 50, (m, 2))
    wlh = rng.uniform([1.5, 3.5, 1.2], [3.0, 12.0, 4.0], (m, 3))
    yaws = rng.uniform(-np.pi, np.pi, m)
    ours_p = np.asarray(push_centroid(
        jnp.asarray(centroids, jnp.float32), jnp.asarray(wlh, jnp.float32),
        jnp.asarray(yaws, jnp.float32), jnp.zeros(3, jnp.float32),
    ))
    for i in range(m):
        quat = [np.cos(yaws[i] / 2), 0.0, 0.0, np.sin(yaws[i] / 2)]
        want = fork.push_centroid(centroids[i].copy(), wlh[i], quat,
                                  ego_frame=True)
        np.testing.assert_allclose(ours_p[i], want, rtol=2e-4, atol=5e-4)


# ---- composite A/B: the full per-mask lift -----------------------------


def _ref_mask_lift(ref, points, mask_wh, ego_t, ego_q, cam_t, cam_q, intr,
                   min_dist=2.3):
    """The reference main-loop body for ONE mask (2d_to_3d.py:553-647)
    with every callable executed live (LidarPointCloud chain, view_points,
    get_medoid); only the inline selection expressions are mirrored.
    Returns (selected_global_indices, centroid or None)."""
    aggr = torch.from_numpy(points.T.astype(np.float32))  # [4, N] global
    track = np.arange(aggr.shape[1])
    pc = ref.LidarPointCloud(torch.clone(aggr))
    # the reference rotates by Quaternion(q).rotation_matrix.T; the
    # wxyz->matrix conversion itself is standard (scipy here)
    pc.translate(torch.from_numpy(-np.asarray(ego_t)).to(torch.float32))
    pc.rotate(torch.from_numpy(quat_wxyz_to_mat(ego_q).T).to(torch.float32))
    pc.translate(torch.from_numpy(-np.asarray(cam_t)).to(torch.float32))
    pc.rotate(torch.from_numpy(quat_wxyz_to_mat(cam_q).T).to(torch.float32))

    depths = pc.points[2, :]
    cam_intr = torch.from_numpy(np.asarray(intr)).to(torch.float32)
    pts2d, _ = ref.view_points(pc.points[:3, :], cam_intr, normalize=True,
                               device="cpu")

    masked_pixels = torch.from_numpy(mask_wh)  # [W, H] bool
    w, h = mask_wh.shape
    within = ((depths > min_dist)
              & (pts2d[0] > 0) & (pts2d[0] < w - 1)
              & (pts2d[1] > 0) & (pts2d[1] < h - 1))
    floored = torch.floor(pts2d[:, within]).to(dtype=int)
    track = track[within.numpy()]
    # reference quirk preserved: logical_and(floored, mask) also drops
    # points whose floored coordinate is 0
    in_mask = torch.logical_and(
        floored, masked_pixels[floored[0], floored[1]]
    )
    idx = torch.where(in_mask[0] & in_mask[1] & in_mask[2])[0]
    track = track[idx.numpy()]
    sel = aggr[:, track]
    if sel.numel() == 0:
        return track, None
    med = ref.get_medoid(sel[:3, :].to(dtype=torch.float32))
    return track, sel[:3, int(med)].numpy()


def test_full_mask_lift_live(ref):
    """Our jitted lift_keyframe vs the reference loop body run live, and
    the transcribed oracle vs the same — one scene, every mask."""
    import jax.numpy as jnp

    from cm3d_tpu.ops import LiftParams, lift_keyframe
    from cm3d_tpu.ops.bitmask import pack_masks_np
    from test_lift import make_scene

    points, masks, (ego_t, ego_q, cam_t, cam_q, intr) = make_scene()
    n, m = len(points), len(masks)
    out = lift_keyframe(
        jnp.asarray(points), jnp.ones(n, bool),
        jnp.asarray(ego_t[None].astype(np.float32)),
        jnp.asarray(ego_q[None].astype(np.float32)),
        jnp.asarray(cam_t[None].astype(np.float32)),
        jnp.asarray(cam_q[None].astype(np.float32)),
        jnp.asarray(intr[None].astype(np.float32)),
        jnp.asarray(pack_masks_np(masks)),
        jnp.zeros(m, jnp.int32), jnp.ones(m, bool),
        LiftParams(min_dist=2.3, max_points_per_mask=4096, erode=False),
    )

    n_checked = 0
    for i in range(m):
        sel_ref, centroid_ref = _ref_mask_lift(
            ref, points, masks[i], ego_t, ego_q, cam_t, cam_q, intr
        )
        sel_ora, _, centroid_ora = lift_mask_oracle(
            points, masks[i], ego_t, ego_q, cam_t, cam_q, intr
        )
        # reference (f32 torch) vs transcription (f64 numpy): the
        # selected-point SETS must agree on this scene, and both must
        # match the implementation
        assert sorted(sel_ref.tolist()) == sorted(sel_ora.tolist()), i
        assert int(out.point_counts[i]) == len(sel_ref), f"mask {i}"
        if len(sel_ref) == 0:
            assert not bool(out.has_points[i])
            continue
        n_checked += 1
        ours_c = np.asarray(out.centroids[i])
        if not np.allclose(ours_c, centroid_ref, rtol=1e-4, atol=1e-3):
            # Medoid disagreement: measured live, the REFERENCE's own
            # arithmetic is the noisy side — torch.cdist on raw
            # global-magnitude f32 coords picks a non-minimal medoid by
            # up to ~6e-3 relative (coordinate quantization ~6e-5 at
            # |x|~1e3, summed over the set), while our fallback refines
            # its top candidates with exact per-dim differences
            # (ops/medoid.py). Parity criterion: our pick's EXACT f64
            # distance sum is never worse than the reference's, and the
            # divergence stays inside the reference's own noise envelope.
            sel_pts = points[sorted(sel_ref.tolist()), :3].astype(
                np.float64
            )
            dsum = np.sqrt(
                ((sel_pts[:, None] - sel_pts[None, :]) ** 2).sum(-1)
            ).sum(0)
            i_ref = int(np.argmin(
                np.linalg.norm(sel_pts - centroid_ref, axis=1)
            ))
            i_our = int(np.argmin(np.linalg.norm(sel_pts - ours_c, axis=1)))
            assert np.linalg.norm(sel_pts[i_our] - ours_c) < 1e-3, i
            assert dsum[i_our] <= dsum[i_ref] * (1 + 1e-9), (
                i, dsum[i_our], dsum[i_ref]
            )
            gap = (dsum[i_ref] - dsum[i_our]) / max(dsum[i_our], 1e-9)
            assert gap < 2e-2, (i, gap, ours_c, centroid_ref)
            # the f64 transcribed oracle computes the exact medoid too —
            # it must side with our pick, not the reference's f32 noise
            np.testing.assert_allclose(centroid_ora, ours_c,
                                       rtol=1e-4, atol=1e-3)
        else:
            np.testing.assert_allclose(centroid_ora, centroid_ref,
                                       rtol=1e-5, atol=1e-4)
    assert n_checked >= 3
