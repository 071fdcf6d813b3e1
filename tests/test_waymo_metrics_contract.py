"""Stdout contract of the rebuilt Waymo metrics binary, pinned against the
REAL compute_detection_metrics_main.

tests/fixtures/waymo_metrics_real_stdout.txt is the verbatim stdout of the
reference repo's shipped ELF binary (src/waymo/compute_detection_metrics_main)
run on the deterministic fixture bins produced by `_fixture_bins` below —
captured once in this environment. Because the real binary parsed bins
written by cm3d_tpu.datasets.waymo.proto, the fixture also validates the
hand-rolled proto field numbers against reality (metrics_pb2.Objects wire
format).
"""

from pathlib import Path

import numpy as np
import pytest

from cm3d_tpu.datasets.waymo.proto import WaymoBox, WaymoObject, encode_objects
from cm3d_tpu.eval.waymo_metrics import (
    metrics_binary_path,
    parse_metrics_stdout,
    run_detection_metrics,
)

FIXTURE = Path(__file__).parent / "fixtures" / "waymo_metrics_real_stdout.txt"


def _fixture_bins(tmp_path):
    """Deterministic pred/gt bins — MUST match the generator that produced
    the captured fixture stdout (seed 0, same object layout)."""
    rng = np.random.default_rng(0)
    ctx, ts = "fixture_context", 1234567890
    gt, pred = [], []
    oid = 0
    for t, n in [(1, 6), (2, 4), (4, 3)]:
        for _ in range(n):
            cx, cy = rng.uniform(-40, 40, 2)
            box = WaymoBox(float(cx), float(cy), 1.0, 2.0, 4.5, 1.8,
                           float(rng.uniform(-3, 3)))
            gt.append(WaymoObject(box=box, type=t, id=f"gt{oid}",
                                  num_lidar_points_in_box=20,
                                  frame_timestamp_micros=ts, context_name=ctx))
            jb = WaymoBox(box.center_x + 0.2, box.center_y - 0.1, 1.0, 2.0,
                          4.4, 1.8, box.heading + 0.05)
            pred.append(WaymoObject(box=jb, type=t, id=f"pd{oid}",
                                    score=0.9 - 0.02 * oid,
                                    frame_timestamp_micros=ts,
                                    context_name=ctx))
            oid += 1
    fp = WaymoBox(100.0, 100.0, 1.0, 2.0, 4.0, 1.8, 0.0)
    pred.append(WaymoObject(box=fp, type=1, id="fp", score=0.4,
                            frame_timestamp_micros=ts, context_name=ctx))
    p, g = tmp_path / "pred.bin", tmp_path / "gt.bin"
    p.write_bytes(encode_objects(pred))
    g.write_bytes(encode_objects(gt))
    return str(p), str(g)


def _metric_lines(text):
    return [ln for ln in text.splitlines() if "[mAP " in ln]


def test_parser_on_real_binary_stdout():
    """The reference's positional parser extracts OBJECT_TYPE metrics from
    the REAL tool's full output (debug dumps + range-bucket lines)."""
    ap = parse_metrics_stdout(FIXTURE.read_text())
    assert ap["Vehicle/L1 mAP"] == 1.0
    assert ap["Vehicle/L1 mAPH"] == pytest.approx(0.984084, abs=1e-6)
    assert ap["Sign/L1 mAP"] == 0.0
    assert ap["Cyclist/L2 mAPH"] == pytest.approx(0.984085, abs=1e-6)
    assert ap["Overall/L1 mAP"] == 1.0


def test_rebuilt_binary_matches_real_line_inventory(tmp_path):
    """Same metric-line names, in the same order, as the real binary."""
    if metrics_binary_path() is None:
        pytest.skip("no C++ toolchain")
    pred, gt = _fixture_bins(tmp_path)
    text, _ = run_detection_metrics(pred, gt)
    ours = [ln.split(":")[0] for ln in _metric_lines(text)]
    real = [ln.split(":")[0] for ln in _metric_lines(FIXTURE.read_text())]
    assert ours == real


def test_rebuilt_binary_matches_real_values(tmp_path):
    """Every metric line's mAP/mAPH within 2e-5 of the real binary's."""
    if metrics_binary_path() is None:
        pytest.skip("no C++ toolchain")
    pred, gt = _fixture_bins(tmp_path)
    text, _ = run_detection_metrics(pred, gt)

    def values(t):
        out = {}
        for ln in _metric_lines(t):
            name = ln.split(":")[0]
            m = float(ln.split("[mAP ")[1].split("]")[0])
            h = float(ln.split("[mAPH ")[1].split("]")[0])
            out[name] = (m, h)
        return out

    ours, real = values(text), values(FIXTURE.read_text())
    assert set(ours) == set(real)
    for name in real:
        assert ours[name][0] == pytest.approx(real[name][0], abs=2e-5), name
        assert ours[name][1] == pytest.approx(real[name][1], abs=2e-5), name
