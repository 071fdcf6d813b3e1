"""bench_e2e_fast_profile composition logic (the on-chip numbers live in
MASK_BENCH_r04.json / TPU_QUEUE_r04.log; here the sweep's aggregation
contract is pinned with a stubbed bench_e2e so no production models
compile)."""

import numpy as np

from cm3d_tpu import benchmarks


def test_fast_profile_aggregation(monkeypatch):
    calls = []

    def fake_bench_e2e(dtype="bfloat16", n_frames=12, batch_size=4,
                       rect_encode=False, quant_int8=False,
                       sam_size="vit_h"):
        calls.append((sam_size, rect_encode, quant_int8))
        speed = {"vit_h": 700.0, "vit_l": 300.0, "vit_b": 150.0}[sam_size]
        if rect_encode:
            speed *= 0.8
        return {
            "metric": "e2e_keyframes_per_sec_per_chip",
            "value": round(1000.0 / speed, 3),
            "ms_per_keyframe": speed,
            "boxes_kept": 1351,
            "rect_encode": rect_encode,
            "quant_int8": quant_int8,
            "sam_size": sam_size,
        }

    monkeypatch.setattr(benchmarks, "bench_e2e", fake_bench_e2e)
    out = benchmarks.bench_e2e_fast_profile()

    # the grid covers the exact baseline and all three composed modes
    assert ("vit_h", False, False) in calls
    assert ("vit_h", True, True) in calls
    assert ("vit_l", True, True) in calls
    assert ("vit_b", True, True) in calls

    assert out["metric"] == "e2e_fast_profile_keyframes_per_sec_per_chip"
    assert out["fastest_profile"] == "vit_b_rect_int8"
    np.testing.assert_allclose(out["value"], round(1000.0 / 120.0, 3),
                               rtol=1e-9)
    assert out["boxes_invariant_across_modes"] is True

    by_name = {p["profile"]: p for p in out["points"]}
    assert by_name["exact_vit_h"]["accuracy_envelope"] == ["exact baseline"]
    # composed points carry every applicable envelope annotation
    env = by_name["vit_b_rect_int8"]["accuracy_envelope"]
    assert len(env) == 3
    assert any("rect_encode" in s or "emb rel err" in s for s in env)
    assert any("cosine" in s for s in env)
    assert any("vit_h" in s for s in env)


def test_fast_profile_flags_boxes_divergence(monkeypatch):
    def fake_bench_e2e(**kw):
        return {
            "value": 1.0, "ms_per_keyframe": 100.0,
            "boxes_kept": 10 if kw.get("sam_size") == "vit_b" else 20,
            "rect_encode": kw.get("rect_encode", False),
            "quant_int8": kw.get("quant_int8", False),
            "sam_size": kw.get("sam_size", "vit_h"),
        }

    monkeypatch.setattr(benchmarks, "bench_e2e", fake_bench_e2e)
    out = benchmarks.bench_e2e_fast_profile()
    assert out["boxes_invariant_across_modes"] is False
