"""Execute the reference's WHOLE nuScenes lift main live (VERDICT r05
item 2).

tests/ref_live.run_nuscenes_main runs /root/reference/src/nuscenes/
2d_to_3d.py:343-938 UNMODIFIED (module name "__main__", functional
devkit shim over the fixture tables) on the tests/nusc_fixture.py
dataroot + planted mask artifacts, producing its submission JSON through
the reference's own multi-sweep aggregation (:437-465), two-pass scene
barrier + lane assignment (:699-706), pass-2 box assembly (:733-825),
per-sample circle-NMS grouping (:844-905) and writer (:929-930).

The same dataroot/artifacts then go through OUR pipeline (NuScenesFrontend
-> jitted keyframe step -> SubmissionWriter) and the two submissions are
compared box-for-box."""

import numpy as np
import pytest

import ref_live
from nusc_fixture import VERSION, make_fake_nuscenes

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not ref_live.reference_available(),
        reason="reference mount absent or content pins changed",
    ),
]

from cm3d_tpu.config import LiftStageConfig  # noqa: E402
from cm3d_tpu.datasets.artifacts import MaskArtifactStore  # noqa: E402

# capacities sized so no static cap binds on the fixture (the reference
# is unbounded; a binding max_points_per_mask truncation moved a truck
# medoid by 6 cm when overlapping truck+cone masks shared ~2k points)
CFG = LiftStageConfig(
    max_points=32768, max_masks=32, max_points_per_mask=4096,
    max_points_per_camera=16384, max_points_in_masks=16384,
    max_lane_points=2048,
)


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    import json

    from nusc_fixture import LOCATION

    tmp = tmp_path_factory.mktemp("refmain")
    root, masks = tmp / "data", tmp / "masks"
    info = make_fake_nuscenes(root, masks, n_frames=4, n_objects=8,
                              bg_points=2500)
    # De-degenerate the lane map: the fixture's {0, pi} and {+pi/2, -pi/2}
    # lane pairs are the SAME geometric line discretized in opposite
    # directions, so the nearest-lane yaw is an exact distance tie that
    # the reference resolves by 1e-16 discretization noise (f64 scipy
    # cdist) and we resolve by first-index — the assigned yaw flips by pi
    # arbitrarily. Shift the pi and -pi/2 lanes onto their own lines so
    # yaw parity is well-posed (real bidirectional lanes make the
    # reference's own output direction-unstable; that degeneracy is a
    # property of the input, not an implementation difference).
    mp = root / "maps" / "expansion" / f"{LOCATION}.json"
    m = json.loads(mp.read_text())
    toks = [ln["token"] for ln in m["lane"]]  # yaw order [0, p/2, p, -p/2]
    m["arcline_path_3"][toks[2]][0].update(
        start_pose=[40.0, 8.0, float(np.pi)],
        end_pose=[-40.0, 8.0, float(np.pi)],
    )
    m["arcline_path_3"][toks[3]][0].update(
        start_pose=[8.0, 40.0, float(-np.pi / 2)],
        end_pose=[8.0, -40.0, float(-np.pi / 2)],
    )
    mp.write_text(json.dumps(m))
    return root, masks, info


def _run_ours(root, masks, info, out_path):
    import jax

    from cm3d_tpu.datasets.nuscenes import NuScenesFrontend, SubmissionWriter
    from cm3d_tpu.datasets.types import stack_keyframes
    from cm3d_tpu.parallel import make_keyframe_step_fn

    fe = NuScenesFrontend(root, VERSION, MaskArtifactStore(masks), CFG)
    kfs = list(fe.iter_scene(info["scene_name"]))
    step = jax.jit(make_keyframe_step_fn(CFG))
    batch = stack_keyframes([kf for kf, _ in kfs])
    _, boxes = step(batch.frames)
    writer = SubmissionWriter()
    for i, (_, meta) in enumerate(kfs):
        writer.add_device_outputs(
            meta.sample_token, jax.tree.map(lambda x: np.asarray(x)[i], boxes)
        )
    return writer.write(str(out_path))


def _yaw_of(q):
    # wxyz quaternion -> z yaw (both sides emit z-axis rotations)
    w, x, y, z = q
    return 2.0 * np.arctan2(z, w)


def test_reference_main_submission_parity(built, tmp_path):
    root, masks, info = built
    ref_sub = ref_live.run_nuscenes_main(root, masks, [info["scene_name"]],
                                         version=VERSION)
    ours = _run_ours(root, masks, info, tmp_path / "ours.json")

    assert set(ref_sub["results"]) == set(info["sample_tokens"])
    assert set(ours["results"]) == set(ref_sub["results"])

    n_total = 0
    n_exact = 0
    for tok in ref_sub["results"]:
        ref_boxes = ref_sub["results"][tok]
        our_boxes = list(ours["results"][tok])
        # the per-sample circle-NMS keep set must agree exactly
        assert len(our_boxes) == len(ref_boxes), tok
        n_total += len(ref_boxes)
        for rb in ref_boxes:
            # match by (class, nearest translation): ordering differs
            # (the reference iterates id_offset order, ours mask order)
            cands = [b for b in our_boxes
                     if b["detection_name"] == rb["detection_name"]]
            assert cands, (tok, rb["detection_name"])
            d = [np.linalg.norm(np.subtract(b["translation"],
                                            rb["translation"]))
                 for b in cands]
            b = cands[int(np.argmin(d))]
            our_boxes.remove(b)
            # translation, two tiers: most boxes agree to sub-mm; a small
            # remainder may differ by one adjacent LiDAR point (~2 cm at
            # fixture cluster spacing) because the reference's torch f32
            # cdist picks near-minimal medoids while ops/medoid.py refines
            # to the exact one — the r04 medoid-noise criterion
            # (test_full_mask_lift_live) owns that divergence at the
            # point-set level; here it is bounded at point spacing, far
            # below any box-level error
            if min(d) < 1e-3:
                n_exact += 1
            else:
                assert min(d) < 5e-2, (tok, rb["detection_name"], min(d))
            np.testing.assert_allclose(b["size"], rb["size"], rtol=1e-6)
            assert abs(b["detection_score"] - rb["detection_score"]) < 1e-6
            assert b["attribute_name"] == rb["attribute_name"]
            # rotation: equal up to quaternion sign
            q1 = np.asarray(b["rotation"], float)
            q2 = np.asarray(rb["rotation"], float)
            assert abs(np.dot(q1, q2)) > 1 - 1e-6, (tok, q1, q2)
            dy = (_yaw_of(q1) - _yaw_of(q2) + np.pi) % (2 * np.pi) - np.pi
            assert abs(dy) < 1e-4
        assert not our_boxes  # exact bijection
    assert n_total > 0
    # the medoid-noise tier must stay the exception, not the norm
    assert n_exact >= 0.75 * n_total, (n_exact, n_total)
    # meta block parity (the writer contract)
    assert ref_sub["meta"]["use_camera"] and ref_sub["meta"]["use_map"]
