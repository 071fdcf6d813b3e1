"""Convert a Detic (detectron2) checkpoint into cm3d_tpu.models.detic params.

Targets the published Detic_LCOCOI21k_CLIP_SwinB_896b32 state-dict layout
(the checkpoint the reference loads, gen_2d_masks_detic.py:34). All key
names are centralized here: validating against the real file (absent in this
environment — zero egress) only ever touches this module.

Layout rules shared with convert_sam (validated against torch in tests):
Linear [out,in] -> Dense [in,out]; Conv [O,I,kh,kw] -> [kh,kw,I,O].
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from cm3d_tpu.models.detic import DETIC_SWINB, DeticConfig


def _dense(sd, prefix):
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _conv(sd, prefix):
    out = {"kernel": np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _gn(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def convert_swin_params(sd: Dict[str, np.ndarray], cfg: DeticConfig,
                        prefix: str = "backbone.bottom_up.") -> dict:
    swin = cfg.swin
    p = prefix
    out: dict = {
        "patch_embed": _conv(sd, f"{p}patch_embed.proj"),
        "patch_norm": _ln(sd, f"{p}patch_embed.norm"),
    }
    for i, depth in enumerate(swin.depths):
        for j in range(depth):
            b = f"{p}layers.{i}.blocks.{j}"
            out[f"stage{i}_block{j}"] = {
                "norm1": _ln(sd, f"{b}.norm1"),
                "norm2": _ln(sd, f"{b}.norm2"),
                "attn": {
                    "qkv": _dense(sd, f"{b}.attn.qkv"),
                    "proj": _dense(sd, f"{b}.attn.proj"),
                    "rel_pos_bias_table": sd[f"{b}.attn.relative_position_bias_table"],
                },
                "fc1": _dense(sd, f"{b}.mlp.fc1"),
                "fc2": _dense(sd, f"{b}.mlp.fc2"),
            }
        if i < len(swin.depths) - 1:
            out[f"merge{i}"] = {
                "norm": _ln(sd, f"{p}layers.{i}.downsample.norm"),
                "reduction": {
                    "kernel": np.ascontiguousarray(
                        sd[f"{p}layers.{i}.downsample.reduction.weight"].T
                    )
                },
            }
        if i in swin.out_indices:
            out[f"out_norm{i}"] = _ln(sd, f"{p}norm{i}")
    return out


def convert_detic_params(
    sd: Dict[str, np.ndarray], cfg: DeticConfig = DETIC_SWINB
) -> dict:
    n_fpn_ins = len(cfg.swin.out_indices)
    fpn: dict = {}
    for i in range(n_fpn_ins):
        lvl = 3 + i
        fpn[f"lateral{i}"] = _conv(sd, f"backbone.fpn_lateral{lvl}")
        fpn[f"output{i}"] = _conv(sd, f"backbone.fpn_output{lvl}")
    n_extra = len(cfg.strides) - n_fpn_ins
    extra_names = ["p6", "p7"]
    for j in range(n_extra):
        fpn[f"top_block{j}"] = _conv(sd, f"backbone.top_block.{extra_names[j]}")

    hp = "proposal_generator.centernet_head"
    head: dict = {
        "agn_hm": _conv(sd, f"{hp}.agn_hm"),
        "bbox_reg": _conv(sd, f"{hp}.bbox_pred"),
    }
    for i in range(cfg.num_head_convs):
        # towers are Sequential(conv, GN, ReLU) triplets
        head[f"share_conv{i}"] = _conv(sd, f"{hp}.share_tower.{3 * i}")
        head[f"share_gn{i}"] = _gn(sd, f"{hp}.share_tower.{3 * i + 1}")
        head[f"bbox_conv{i}"] = _conv(sd, f"{hp}.bbox_tower.{3 * i}")
        head[f"bbox_gn{i}"] = _gn(sd, f"{hp}.bbox_tower.{3 * i + 1}")
    for li in range(len(cfg.strides)):
        head[f"scale{li}"] = sd[f"{hp}.scales.{li}.scale"].reshape(())

    cascade: dict = {}
    for k in range(cfg.num_cascade_stages):
        cascade[f"cascade{k}"] = {
            "fc1": _dense(sd, f"roi_heads.box_head.{k}.fc1"),
            "fc2": _dense(sd, f"roi_heads.box_head.{k}.fc2"),
            "cls_proj": _dense(sd, f"roi_heads.box_predictor.{k}.cls_score.linear"),
            "cls_bias": np.zeros((), np.float32),
            "bbox_fc": _dense(sd, f"roi_heads.box_predictor.{k}.bbox_pred.0"),
            "bbox_pred": _dense(sd, f"roi_heads.box_predictor.{k}.bbox_pred.2"),
        }
        bias_key = f"roi_heads.box_predictor.{k}.cls_score.cls_bias"
        if bias_key in sd:
            cascade[f"cascade{k}"]["cls_bias"] = sd[bias_key].reshape(())

    return {
        "backbone": convert_swin_params(sd, cfg),
        "fpn": fpn,
        "proposal_head": head,
        **cascade,
    }


def load_detic_checkpoint(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("model", ckpt)
    return {k: np.asarray(v) for k, v in sd.items() if hasattr(v, "shape")}
