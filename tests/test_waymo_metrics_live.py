"""LIVE A/B of the rebuilt Waymo metrics binary against the REAL reference
ELF (src/waymo/compute_detection_metrics_main), which runs in this image.

Beyond the pinned-stdout fixture (test_waymo_metrics_contract.py), these
tests execute the real tool on freshly randomized bins and on single-object
probe bins that pin its non-obvious semantics:

- GT difficulty (detection_difficulty_level is UNSET in bins produced by
  create_gt_bin, reference src/waymo/create_gt_bin.py:8-25, so the tool's
  own heuristic applies): num_points==0 -> gt excluded entirely; 1..5 ->
  LEVEL_2, but a MATCHED L2 gt still counts at LEVEL_1 (npos and TP) — only
  unmatched L2 gts drop out of L1's denominator; >=6 -> LEVEL_1.
- The PR curve is sampled at 101 fixed score cutoffs (0.00..1.00) with the
  predictions >= cutoff re-matched at every cutoff.
- AP integrates the max-precision envelope trapezoidally over the raw
  recall points plus points stepping down from each pair's higher recall by
  the 0.05 desired_recall_delta. mAPH integrates its own envelope.

All semantics were derived from probe measurements; every probe here is a
regression pin for both binaries.
"""

import shutil
import stat
import subprocess
from pathlib import Path

import numpy as np
import pytest

from cm3d_tpu.datasets.waymo.proto import WaymoBox, WaymoObject, encode_objects
from cm3d_tpu.eval.waymo_metrics import metrics_binary_path

REAL_ELF = Path("/root/reference/src/waymo/compute_detection_metrics_main")


@pytest.fixture(scope="module")
def real_bin(tmp_path_factory):
    if not REAL_ELF.exists():
        pytest.skip("real reference metrics ELF not present")
    p = tmp_path_factory.mktemp("elf") / "real_metrics"
    shutil.copy(REAL_ELF, p)
    p.chmod(p.stat().st_mode | stat.S_IXUSR)
    try:
        out = subprocess.run([str(p)], capture_output=True, timeout=30)
    except (OSError, subprocess.TimeoutExpired):
        pytest.skip("real metrics ELF does not execute in this environment")
    if b"usage" not in out.stderr.lower() and out.returncode not in (1, 2):
        pytest.skip("real metrics ELF does not execute in this environment")
    return str(p)


@pytest.fixture(scope="module")
def our_bin():
    p = metrics_binary_path()
    if p is None:
        pytest.skip("no C++ toolchain")
    return p


def _values(text):
    out = {}
    for ln in text.splitlines():
        if "[mAP " in ln:
            out[ln.split(":")[0]] = (
                float(ln.split("[mAP ")[1].split("]")[0]),
                float(ln.split("[mAPH ")[1].split("]")[0]),
            )
    return out


def _run(binary, tmp_path, pred, gt):
    p, g = tmp_path / "pred.bin", tmp_path / "gt.bin"
    p.write_bytes(encode_objects(pred))
    g.write_bytes(encode_objects(gt))
    text = subprocess.check_output([binary, str(p), str(g)]).decode()
    return _values(text)


def _assert_match(real_vals, our_vals, tag):
    assert set(real_vals) == set(our_vals)
    for name in real_vals:
        assert our_vals[name][0] == pytest.approx(real_vals[name][0], abs=2e-5), (
            tag, name, "mAP")
        assert our_vals[name][1] == pytest.approx(real_vals[name][1], abs=2e-5), (
            tag, name, "mAPH")


def _ped(cx, npts=None, score=None, oid="x", hd=0.0):
    box = WaymoBox(cx, 0.0, 1.0, 1.0, 1.0, 1.8, hd)
    kw = dict(box=box, type=2, id=oid, frame_timestamp_micros=1, context_name="c")
    if score is None:
        return WaymoObject(num_lidar_points_in_box=npts, **kw)
    return WaymoObject(score=score, **kw)


# ---------------------------------------------------------------------------
# Probe bins: pin the REAL tool's semantics (and ours, via the A/B).
# ---------------------------------------------------------------------------

def _ped_l1(vals):
    return vals["OBJECT_TYPE_TYPE_PEDESTRIAN_LEVEL_1"]


def _ped_l2(vals):
    return vals["OBJECT_TYPE_TYPE_PEDESTRIAN_LEVEL_2"]


PROBES = {
    # B's point count decides its difficulty; A(30pts) has the only match.
    # mAP == 1/npos reads the denominator directly.
    "zero_pts_excluded": (
        [_ped(0, npts=30, oid="A"), _ped(50, npts=0, oid="B")],
        [_ped(0, score=0.9, oid="pA")],
        lambda v: v == {"L1": 1.0, "L2": 1.0},
    ),
    "l2_band_is_1_to_5": (
        [_ped(0, npts=30, oid="A"), _ped(50, npts=5, oid="B")],
        [_ped(0, score=0.9, oid="pA")],
        lambda v: v == {"L1": 1.0, "L2": 0.5},
    ),
    "six_pts_is_l1": (
        [_ped(0, npts=30, oid="A"), _ped(50, npts=6, oid="B")],
        [_ped(0, score=0.9, oid="pA")],
        lambda v: v == {"L1": 0.5, "L2": 0.5},
    ),
    # A matched 3-point gt counts at L1: npos 3, tp 2 -> 2/3 at both levels.
    "matched_l2_counts_at_l1": (
        [_ped(0, npts=6, oid="A"), _ped(10, npts=3, oid="B"),
         _ped(50, npts=6, oid="C")],
        [_ped(0, score=0.9, oid="pA"), _ped(10, score=0.8, oid="pB")],
        lambda v: abs(v["L1"] - 2 / 3) < 1e-5 and abs(v["L2"] - 2 / 3) < 1e-5,
    ),
    # Same-hundredth scores share a cutoff bucket: TP@.015 + FP@.014 -> 0.5.
    "cutoff_granularity": (
        [_ped(0, npts=30, oid="A")],
        [_ped(0, score=0.015, oid="pA"), _ped(70, score=0.014, oid="pF")],
        lambda v: v["L1"] == 0.5,
    ),
    # Envelope integration smear: 0.841667 = 0.5 + 0.05*(1+2/3)/2 + 0.45*2/3.
    "plateau_smear": (
        [_ped(0, npts=30, oid="A"), _ped(10, npts=30, oid="B")],
        [_ped(0, score=0.9, oid="pA"), _ped(10, score=0.5, oid="pB"),
         _ped(70, score=0.5, oid="pF")],
        lambda v: abs(v["L1"] - 0.841667) < 1e-5,
    ),
    # Off-grid discontinuity at r=1/3 under a (2/3 -> 1/3) pair: insertions
    # anchor at the pair's higher recall (2/3 - 6*0.05 = 0.3667 -> smear
    # width 1/30), NOT at an absolute 0.05 grid: 0.561111.
    "pair_anchored_insertion": (
        [_ped(0, npts=30, oid="A"), _ped(10, npts=30, oid="B"),
         _ped(20, npts=30, oid="C")],
        [_ped(0, score=0.9, oid="pA"), _ped(10, score=0.5, oid="pB"),
         _ped(70, score=0.5, oid="pF")],
        lambda v: abs(v["L1"] - 0.561111) < 1e-5,
    ),
}


@pytest.mark.parametrize("name", sorted(PROBES))
def test_probe_semantics_real_and_ours(name, real_bin, our_bin, tmp_path):
    gt, pred, check = PROBES[name]
    rv = _run(real_bin, tmp_path, pred, gt)
    ov = _run(our_bin, tmp_path, pred, gt)
    _assert_match(rv, ov, name)
    assert check({"L1": _ped_l1(rv)[0], "L2": _ped_l2(rv)[0]}), (
        name, _ped_l1(rv), _ped_l2(rv))


def test_aph_uses_own_envelope(real_bin, our_bin, tmp_path):
    """A heading-flipped high-score TP: mAP 0.561111 but mAPH 0.222222."""
    gt = [_ped(0, npts=30, oid="A"), _ped(10, npts=30, oid="B"),
          _ped(20, npts=30, oid="C")]
    pred = [_ped(0, score=0.9, oid="pA", hd=np.pi),
            _ped(10, score=0.5, oid="pB"), _ped(70, score=0.5, oid="pF")]
    rv = _run(real_bin, tmp_path, pred, gt)
    ov = _run(our_bin, tmp_path, pred, gt)
    _assert_match(rv, ov, "aph")
    assert _ped_l1(rv)[1] == pytest.approx(0.222222, abs=1e-5)


# ---------------------------------------------------------------------------
# Randomized A/B.
# ---------------------------------------------------------------------------

def _random_bins(seed):
    rng = np.random.default_rng(seed)
    gt, pred = [], []
    oid = 0
    for ts in (111, 222):
        for t in (1, 2, 4):
            for _ in range(rng.integers(2, 6)):
                cx, cy = rng.uniform(-50, 50, 2)
                box = WaymoBox(float(cx), float(cy), 1.0,
                               float(rng.uniform(0.5, 3)),
                               float(rng.uniform(1, 6)), 1.8,
                               float(rng.uniform(-np.pi, np.pi)))
                gt.append(WaymoObject(
                    box=box, type=int(t), id=f"g{oid}",
                    num_lidar_points_in_box=int(rng.integers(0, 40)),
                    frame_timestamp_micros=ts, context_name="c0"))
                if rng.uniform() < 0.8:
                    jb = WaymoBox(box.center_x + float(rng.uniform(-1, 1)),
                                  box.center_y + float(rng.uniform(-1, 1)),
                                  1.0, box.width, box.length, 1.8,
                                  box.heading + float(rng.uniform(-0.4, 0.4)))
                    pred.append(WaymoObject(
                        box=jb, type=int(t), id=f"p{oid}",
                        score=float(rng.uniform(0.1, 1.0)),
                        frame_timestamp_micros=ts, context_name="c0"))
                oid += 1
    return pred, gt


@pytest.mark.parametrize("seed", range(6))
def test_randomized_bins_match_real_elf(seed, real_bin, our_bin, tmp_path):
    pred, gt = _random_bins(seed)
    rv = _run(real_bin, tmp_path, pred, gt)
    ov = _run(our_bin, tmp_path, pred, gt)
    assert len(rv) == 32
    _assert_match(rv, ov, f"seed{seed}")
