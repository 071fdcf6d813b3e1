"""Vocabulary/class maps + orbax checkpoint roundtrip."""

import numpy as np

from cm3d_tpu.vocab import (
    CUSTOM_VOCABULARY_NUSCENES,
    CUSTOM_VOCABULARY_WAYMO,
    MAPS,
    NUSC_TO_KITTI,
    NUSC_TO_WAYMO,
    OLD_MAPS,
    map_class,
)


def test_vocabulary_contents():
    # reference vocabulary is exactly 19 words (gen_2d_masks_detic.py:66-87)
    assert len(CUSTOM_VOCABULARY_NUSCENES) == 19
    assert "dumptruck" in CUSTOM_VOCABULARY_NUSCENES
    # waymo drops cone/barrier words
    assert "traffic_cone" not in CUSTOM_VOCABULARY_WAYMO
    assert "road_barrier" not in CUSTOM_VOCABULARY_WAYMO
    assert len(CUSTOM_VOCABULARY_WAYMO) == 16


def test_map_class_reference_semantics():
    # OLD_MAPS lookups
    assert map_class("pickup_truck") == "truck"
    assert map_class("semi_trailer") == "trailer"
    assert map_class("dumptruck") == "truck"
    assert map_class("road_barrier") == "barrier"
    # substring heuristics
    assert map_class("red suv car") == "car"
    assert map_class("some person walking") == "pedestrian"
    assert map_class("mountain bike") == "bicycle"
    # fallback is 'car' (reference :238)
    assert map_class("zebra") == "car"
    # every vocab word maps to a canonical class
    from cm3d_tpu.config import NUSCENES_CLASSES

    for w in CUSTOM_VOCABULARY_NUSCENES:
        assert map_class(w.lower()) in NUSCENES_CLASSES


def test_reverse_maps_consistent():
    for syn, cls in MAPS.items():
        assert map_class(syn) in (cls, "car", "truck")  # OLD_MAPS may differ
    assert set(NUSC_TO_WAYMO.values()) == {"vehicle", "pedestrian", "cyclist"}
    assert NUSC_TO_KITTI["bicycle"] == "Cyclist"


def test_orbax_checkpoint_roundtrip(tmp_path):
    from cm3d_tpu.models.checkpoints import load_params, save_params

    params = {
        "block0": {"kernel": np.arange(12, dtype=np.float32).reshape(3, 4)},
        "bias": np.ones(5, np.float32),
    }
    save_params(params, str(tmp_path / "ck"))
    back = load_params(str(tmp_path / "ck"))
    np.testing.assert_array_equal(back["block0"]["kernel"],
                                  params["block0"]["kernel"])
    np.testing.assert_array_equal(back["bias"], params["bias"])


def test_load_converted_dispatches_orbax_dir_vs_torch_file(tmp_path):
    """build_real_models' checkpoint dispatch (docs/MIGRATION.md contract):
    an orbax DIRECTORY loads directly (no torch conversion); a file path
    routes through the torch converter."""
    from cm3d_tpu.models.checkpoints import save_params
    from cm3d_tpu.pipelines.masks import load_converted

    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    save_params(params, str(tmp_path / "sam_vit_h"))

    def boom(_path):
        raise AssertionError("convert_fn must not run for an orbax dir")

    back = load_converted(str(tmp_path / "sam_vit_h"), boom)
    np.testing.assert_array_equal(back["w"], params["w"])

    calls = []
    out = load_converted(str(tmp_path / "sam.pth"),
                         lambda p: calls.append(p) or {"ok": 1})
    assert out == {"ok": 1} and calls == [str(tmp_path / "sam.pth")]
