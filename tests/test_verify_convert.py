"""Converter verification harness on synthetic torch-layout checkpoints."""

import numpy as np
import pytest

from cm3d_tpu.models.verify_convert import (
    activation_stats,
    has_problems,
    key_coverage,
    tree_conformance,
    verify_detic,
    verify_sam,
)
from test_convert_detic import _fake_detic_sd
from test_sam import _fake_torch_sd


def test_clean_sam_checkpoint_verifies(tmp_path):
    from cm3d_tpu.models.sam import SAM_TEST

    sd = _fake_torch_sd(SAM_TEST)
    rep = verify_sam(sd, probe=True, cfg=SAM_TEST)
    assert not has_problems(rep), rep["tree"]
    assert rep["coverage"]["ignored"] == []
    # probe produced per-module stats incl. encoder blocks and the decoder
    acts = rep["activations"]
    assert any("image_encoder" in k for k in acts)
    assert any("mask_decoder" in k for k in acts)
    for st in acts.values():
        assert np.isfinite(st["mean"]) and np.isfinite(st["std"])


def test_clean_detic_checkpoint_verifies():
    from cm3d_tpu.models.detic import DETIC_TEST

    sd = _fake_detic_sd(DETIC_TEST)
    rep = verify_detic(sd, cfg=DETIC_TEST)
    assert not has_problems(rep), rep["tree"]


def test_ignored_extra_checkpoint_key_reported():
    from cm3d_tpu.models.sam import SAM_TEST

    sd = _fake_torch_sd(SAM_TEST)
    sd["optimizer.momentum_buffer"] = np.zeros(3, np.float32)
    rep = verify_sam(sd, cfg=SAM_TEST)
    assert rep["coverage"]["ignored"] == ["optimizer.momentum_buffer"]
    assert not has_problems(rep)  # extras are reported, not fatal


def test_missing_checkpoint_key_is_fatal():
    from cm3d_tpu.models.sam import SAM_TEST

    sd = _fake_torch_sd(SAM_TEST)
    del sd["image_encoder.blocks.1.attn.qkv.weight"]
    rep = verify_sam(sd, cfg=SAM_TEST)
    assert has_problems(rep)
    assert "conversion failed" in rep["tree"]["missing"][0]


def test_shape_mismatch_reported():
    from cm3d_tpu.models.sam import SAM_TEST

    sd = _fake_torch_sd(SAM_TEST)
    k = "image_encoder.patch_embed.proj.weight"
    sd[k] = np.zeros((7, 3, 4, 4), np.float32)  # wrong out-channels
    rep = verify_sam(sd, cfg=SAM_TEST)
    assert has_problems(rep)
    assert any("patch_embed" in m for m in rep["tree"]["mismatched"])
