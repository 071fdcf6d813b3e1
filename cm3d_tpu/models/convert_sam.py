"""Convert a released SAM torch checkpoint into cm3d_tpu.models.sam params.

Key mapping targets the official `sam_vit_h_4b8939.pth` state-dict layout
(the checkpoint the reference loads, gen_2d_masks_detic.py:112). Works on a
plain dict of numpy arrays — torch is only needed to unpickle the file.

Conversion rules (validated op-by-op against torch in tests/test_sam.py):
  Linear   weight [out, in]        -> Dense kernel [in, out]
  Conv2d   weight [O, I, kh, kw]   -> Conv kernel [kh, kw, I, O]
  ConvT2d  weight [I, O, kh, kw]   -> ConvTranspose kernel [kh, kw, I, O]
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from cm3d_tpu.models.sam import SamConfig, SAM_VIT_H


def _dense(sd, prefix):
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _conv(sd, prefix, bias=True):
    out = {"kernel": np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0))}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _convT(sd, prefix):
    # torch [I, O, kh, kw] -> flax transpose_kernel=True layout [kh, kw, O, I]
    out = {"kernel": np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _ln2d(sd, prefix):
    return {"weight": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _mlp(sd, prefix):
    return {"lin1": _dense(sd, f"{prefix}.lin1"), "lin2": _dense(sd, f"{prefix}.lin2")}


def _decoder_attn(sd, prefix):
    return {
        "q_proj": _dense(sd, f"{prefix}.q_proj"),
        "k_proj": _dense(sd, f"{prefix}.k_proj"),
        "v_proj": _dense(sd, f"{prefix}.v_proj"),
        "out_proj": _dense(sd, f"{prefix}.out_proj"),
    }


def _hyper_mlp(sd, prefix, depth=3):
    return {
        f"layer{i}": _dense(sd, f"{prefix}.layers.{i}") for i in range(depth)
    }


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu")
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return {k: v.numpy() for k, v in sd.items()}


def convert_sam_params(sd: Dict[str, np.ndarray], cfg: SamConfig = SAM_VIT_H) -> dict:
    """Returns a params pytree for cm3d_tpu.models.sam.Sam."""
    enc: dict = {
        "patch_embed": _conv(sd, "image_encoder.patch_embed.proj"),
        "pos_embed": sd["image_encoder.pos_embed"],
        "neck_conv1": _conv(sd, "image_encoder.neck.0", bias=False),
        "neck_ln1": _ln2d(sd, "image_encoder.neck.1"),
        "neck_conv2": _conv(sd, "image_encoder.neck.2", bias=False),
        "neck_ln2": _ln2d(sd, "image_encoder.neck.3"),
    }
    for i in range(cfg.encoder_depth):
        p = f"image_encoder.blocks.{i}"
        enc[f"block{i}"] = {
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "attn": {
                "qkv": _dense(sd, f"{p}.attn.qkv"),
                "proj": _dense(sd, f"{p}.attn.proj"),
                "rel_pos_h": sd[f"{p}.attn.rel_pos_h"],
                "rel_pos_w": sd[f"{p}.attn.rel_pos_w"],
            },
            "mlp": _mlp(sd, f"{p}.mlp"),
        }

    prompt = {
        "pe_gaussian": sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"],
        "point_embed": np.concatenate(
            [sd[f"prompt_encoder.point_embeddings.{i}.weight"] for i in range(4)]
        ),
        "no_mask_embed": sd["prompt_encoder.no_mask_embed.weight"],
    }

    n_mask_tokens = cfg.num_multimask_outputs + 1
    tr: dict = {}
    for i in range(cfg.decoder_depth):
        p = f"mask_decoder.transformer.layers.{i}"
        tr[f"layer{i}"] = {
            "self_attn": _decoder_attn(sd, f"{p}.self_attn"),
            "cross_attn_token_to_image": _decoder_attn(
                sd, f"{p}.cross_attn_token_to_image"
            ),
            "cross_attn_image_to_token": _decoder_attn(
                sd, f"{p}.cross_attn_image_to_token"
            ),
            "mlp": _mlp(sd, f"{p}.mlp"),
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "norm3": _ln(sd, f"{p}.norm3"),
            "norm4": _ln(sd, f"{p}.norm4"),
        }
    tr["final_attn"] = _decoder_attn(
        sd, "mask_decoder.transformer.final_attn_token_to_image"
    )
    tr["norm_final"] = _ln(sd, "mask_decoder.transformer.norm_final_attn")

    decoder: dict = {
        "iou_token": sd["mask_decoder.iou_token.weight"],
        "mask_tokens": sd["mask_decoder.mask_tokens.weight"],
        "transformer": tr,
        "upscale1": _convT(sd, "mask_decoder.output_upscaling.0"),
        "upscale_ln": _ln2d(sd, "mask_decoder.output_upscaling.1"),
        "upscale2": _convT(sd, "mask_decoder.output_upscaling.3"),
        "iou_head": _hyper_mlp(sd, "mask_decoder.iou_prediction_head"),
    }
    for i in range(n_mask_tokens):
        decoder[f"hyper{i}"] = _hyper_mlp(
            sd, f"mask_decoder.output_hypernetworks_mlps.{i}"
        )

    return {
        "image_encoder": enc,
        "prompt_encoder": prompt,
        "mask_decoder": decoder,
    }
