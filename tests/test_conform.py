"""cm3d-conform runbook (conform.py): hermetic fixture-scale coverage of
the verify -> convert -> e2e -> eval orchestration (VERDICT r03 item 4)."""

import argparse
import json
from pathlib import Path

import numpy as np
import pytest

from cm3d_tpu import conform
from test_sam import _fake_torch_sd

torch = pytest.importorskip("torch")


def _args(**kw):
    d = dict(sam="", sam_size="vit_h", detic="", clip="", bpe="", zoe="",
             gdino="", gdino_vocab="", probe=False, quant_int8=False,
             dataset="nuscenes", dataroot="", version="v1.0-mini",
             scenes="", out="", fake_weights=False, skip_pipeline=False,
             skip_eval=False)
    d.update(kw)
    return argparse.Namespace(**d)


def _save_sam_ckpt(tmp_path, cfg, corrupt=False):
    sd = _fake_torch_sd(cfg)
    if corrupt:
        del sd["image_encoder.pos_embed"]
    path = tmp_path / "sam_test.pth"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)
    return str(path)


def test_verify_and_convert_fixture_scale(tmp_path):
    """Real phases 1+2 at SAM_TEST scale: verify report written, orbax
    tree saved and loadable, int8 variant saved, exit code 0."""
    from cm3d_tpu.models.checkpoints import load_params
    from cm3d_tpu.models.sam import SAM_TEST

    ckpt = _save_sam_ckpt(tmp_path, SAM_TEST)
    out = tmp_path / "conform"
    report, rc = conform.run_conform(
        _args(sam=ckpt, out=str(out), quant_int8=True),
        cfg_overrides={"sam": SAM_TEST},
    )
    assert rc == 0 and report["ok"]
    entry = report["models"]["sam"]
    assert entry["ok"] and entry["kind"] == "torch"
    assert entry["verify"]["missing"] == 0
    assert entry["verify"]["mismatched"] == 0
    assert Path(entry["verify"]["report"]).is_file()
    params = load_params(entry["converted"])
    assert "image_encoder" in params
    # int8 tree saved alongside, with quantized kernels
    qparams = load_params(entry["converted_int8"])
    flat = jax_leaves_with_names(qparams)
    assert any(name.endswith("kernel_q") for name, _ in flat)
    # no dataroot: pipeline+eval skipped, report file on disk
    assert report["e2e"]["skipped"] and report["eval"]["skipped"]
    assert json.loads((out / "conform_report.json").read_text())["ok"]


def jax_leaves_with_names(tree, prefix=""):
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out += jax_leaves_with_names(v, f"{prefix}/{k}")
    else:
        out.append((prefix, tree))
    return out


def test_broken_checkpoint_reported_not_fatal(tmp_path):
    """A checkpoint missing a key the converter demands: entry not ok,
    rc 1, but the report still writes (other models could still run)."""
    from cm3d_tpu.models.sam import SAM_TEST

    ckpt = _save_sam_ckpt(tmp_path, SAM_TEST, corrupt=True)
    out = tmp_path / "conform"
    report, rc = conform.run_conform(
        _args(sam=ckpt, out=str(out)), cfg_overrides={"sam": SAM_TEST},
    )
    assert rc == 1 and not report["ok"]
    entry = report["models"]["sam"]
    assert not entry["ok"]
    assert (out / "conform_report.json").is_file()


def test_orbax_dir_skips_verify(tmp_path):
    """An already-converted orbax dir passes straight through to e2e."""
    d = tmp_path / "converted_sam"
    d.mkdir()
    report, rc = conform.run_conform(
        _args(sam=str(d), out=str(tmp_path / "c")),
    )
    assert rc == 0
    entry = report["models"]["sam"]
    assert entry["kind"] == "orbax" and entry["converted"] == str(d)
    assert entry["verify"] == "skipped"


def test_pipeline_phase_threading(tmp_path, monkeypatch):
    """Phases 3+4 with stubbed CLIs: the e2e argv carries the CONVERTED
    checkpoint dirs (int8 when requested), the eval metrics land in the
    report next to the reference headline."""
    from cm3d_tpu.models.sam import SAM_TEST

    ckpt = _save_sam_ckpt(tmp_path, SAM_TEST)
    out = tmp_path / "conform"
    seen = {}

    def fake_e2e(argv):
        seen["e2e"] = argv
        i = argv.index("--out") + 1
        Path(argv[i]).write_text(json.dumps(
            {"results": {"tok1": [{}, {}], "tok2": [{}]}}
        ))

    def fake_eval(argv):
        seen["eval"] = argv
        return {"mean_ap": 0.231, "nd_score": 0.222}

    monkeypatch.setattr(conform, "_e2e_main", fake_e2e)
    monkeypatch.setattr(conform, "_eval_main", fake_eval)

    report, rc = conform.run_conform(
        _args(sam=ckpt, out=str(out), quant_int8=True,
              dataroot="/data/nusc", scenes="scene-0061"),
        cfg_overrides={"sam": SAM_TEST},
    )
    assert rc == 0
    argv = seen["e2e"]
    i = argv.index("--sam_ckpt") + 1
    assert argv[i] == report["models"]["sam"]["converted_int8"]
    assert "--quant_int8" in argv
    assert report["e2e"]["n_samples"] == 2
    assert report["e2e"]["n_boxes"] == 3
    assert seen["eval"][0] == report["e2e"]["out"]
    assert report["eval"]["mAP"] == 0.231
    assert report["eval"]["NDS"] == 0.222
    assert report["eval"]["reference_headline"]["mAP"] == 23.0


def test_fake_weights_dry_run(tmp_path, monkeypatch):
    """--fake_weights: the runbook dry-runs without any checkpoints —
    the e2e argv asks for fake models, eval still runs."""
    seen = {}

    def fake_e2e(argv):
        seen["e2e"] = argv
        Path(argv[argv.index("--out") + 1]).write_text(
            json.dumps({"results": {}})
        )

    monkeypatch.setattr(conform, "_e2e_main", fake_e2e)
    monkeypatch.setattr(conform, "_eval_main",
                        lambda argv: {"mean_ap": 0.0, "nd_score": 0.0})
    report, rc = conform.run_conform(
        _args(out=str(tmp_path / "c"), dataroot="/x", scenes="s",
              fake_weights=True),
    )
    assert rc == 0
    assert "--fake_weights" in seen["e2e"]
    assert "--sam_ckpt" not in seen["e2e"]


def test_eval_skipped_after_e2e_failure(tmp_path, monkeypatch):
    def boom(argv):
        raise RuntimeError("no such scene")

    monkeypatch.setattr(conform, "_e2e_main", boom)
    called = []
    monkeypatch.setattr(conform, "_eval_main",
                        lambda argv: called.append(argv))
    report, rc = conform.run_conform(
        _args(out=str(tmp_path / "c"), dataroot="/x", scenes="s",
              fake_weights=True),
    )
    assert rc == 1
    assert "no such scene" in report["e2e"]["error"]
    assert report["eval"]["skipped"] and not called


def test_non_nuscenes_dataset_skips_json_summary_and_eval(tmp_path,
                                                          monkeypatch):
    """--dataset waymo: the e2e artifact is a .bin proto, not submission
    JSON — the report records its size instead of mis-parsing it, the
    nuScenes eval phase is skipped with a reason, and rc stays 0
    (ADVICE r04)."""
    seen = {}

    def fake_e2e(argv):
        seen["e2e"] = argv
        Path(argv[argv.index("--out") + 1]).write_bytes(b"\x0a\x04bin!")

    called = []
    monkeypatch.setattr(conform, "_e2e_main", fake_e2e)
    monkeypatch.setattr(conform, "_eval_main",
                        lambda argv: called.append(argv))
    report, rc = conform.run_conform(
        _args(out=str(tmp_path / "c"), dataset="waymo", dataroot="/x",
              scenes="s", fake_weights=True),
    )
    assert rc == 0
    assert "--dataset" in seen["e2e"] and "waymo" in seen["e2e"]
    assert report["e2e"]["artifact_bytes"] == 6
    assert "n_samples" not in report["e2e"]
    assert report["eval"]["skipped"] and "waymo" in report["eval"]["reason"]
    assert not called


def test_non_nuscenes_missing_artifact_is_error(tmp_path, monkeypatch):
    """A non-nuScenes e2e phase that writes NOTHING must fail the gate
    (review r05: it reported artifact_bytes=None with rc=0)."""
    monkeypatch.setattr(conform, "_e2e_main", lambda argv: None)
    monkeypatch.setattr(conform, "_eval_main", lambda argv: None)
    report, rc = conform.run_conform(
        _args(out=str(tmp_path / "c"), dataset="waymo", dataroot="/x",
              scenes="s", fake_weights=True),
    )
    assert rc == 1
    assert "no artifact" in report["e2e"]["error"]
