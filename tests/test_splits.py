"""Custom eval splits (reference eval_custom.py create_splits_scenes,
:266-294): slice rules, dataroot-derived train/test, and overrides."""

import json

import pytest

from cm3d_tpu.datasets.nuscenes.splits import (
    MINI_TRAIN,
    MINI_VAL,
    VAL,
    create_splits_scenes,
    resolve_eval_set,
)


def _fake_trainval_names():
    """850 names: the 150 official val scenes + 700 synthetic train names."""
    extra = [f"scene-{n:04d}" for n in range(2000, 2700)]
    return sorted(list(VAL) + extra)


def test_val_list_invariants():
    assert len(VAL) == 150
    assert list(VAL) == sorted(VAL)
    assert set(MINI_VAL) <= set(VAL)
    # known official quirk: mini_train overlaps val
    assert {"scene-0553", "scene-0796"} <= set(MINI_TRAIN) & set(VAL)


def test_val25_is_first_25_of_val():
    splits = create_splits_scenes()
    assert splits["val25"] == list(VAL)[:25]
    assert splits["val25"][0] == "scene-0003"
    assert splits["val25"][-1] == "scene-0104"


def test_train_derived_from_trainval_tables():
    names = _fake_trainval_names()
    splits = create_splits_scenes(scene_names=names)
    assert len(splits["train"]) == 700
    assert not set(splits["train"]) & set(VAL)
    # reference quirk: train25 slices TEN scenes (eval_custom.py:286)
    assert splits["train25"] == splits["train"][:10]


def test_mini_tables_do_not_fake_a_train_split():
    splits = create_splits_scenes(scene_names=list(MINI_TRAIN) + list(MINI_VAL))
    assert "train" not in splits
    assert splits["mini_val"] == list(MINI_VAL)


def test_test_tables_derive_test_split():
    names = [f"scene-{n:04d}" for n in range(3000, 3150)]
    splits = create_splits_scenes(scene_names=names)
    assert splits["test"] == sorted(names)


def test_train_detect_slices_from_splits_json(tmp_path):
    td = [f"scene-{n:04d}" for n in range(4000, 4350)]
    f = tmp_path / "splits.json"
    json.dump({"train_detect": td}, open(f, "w"))
    splits = create_splits_scenes(splits_json=str(f))
    assert splits["train_detect50"] == td[:50]
    assert splits["train_detect25"] == td[175:200]  # reference :284


def test_resolve_eval_set():
    names = _fake_trainval_names()
    assert resolve_eval_set("val25", names) == list(VAL)[:25]
    assert len(resolve_eval_set("all", names)) == 850
    assert resolve_eval_set("scene-0003,scene-0012") == [
        "scene-0003", "scene-0012",
    ]
    with pytest.raises(ValueError, match="splits JSON"):
        resolve_eval_set("train_detect50", names)
    with pytest.raises(ValueError, match="dataroot"):
        resolve_eval_set("train25")


def test_validation_raises_on_missing_scenes():
    with pytest.raises(ValueError, match="not in the loaded tables"):
        resolve_eval_set("val", ["scene-0003"])


def test_empty_override_list_rejected(tmp_path):
    """An empty 'val' override would make the full-val-present check
    vacuously true and silently derive train as ALL scenes (val leaking
    into train); any empty override list is malformed and must raise."""
    f = tmp_path / "splits.json"
    json.dump({"val": []}, open(f, "w"))
    with pytest.raises(ValueError, match="empty list"):
        create_splits_scenes(
            scene_names=_fake_trainval_names(), splits_json=str(f)
        )
