"""Detic open-vocabulary detector in Flax (inference path).

The reference's 2D detector: Detic_LCOCOI21k_CLIP_SwinB_896b32 — a Swin-B
trunk, FPN (p3-p7), CenterNet2 class-agnostic proposal head, and a 3-stage
cascade of zero-shot box heads classifying against CLIP text embeddings
(src/nuscenes/gen_2d_masks_detic.py:30-41,90-96; vocabulary head swapped via
reset_cls_test = our `classifier` input). Score threshold 0.1, all classes
per proposal (ONE_CLASS_PER_PROPOSAL=False), mask head unused (SAM provides
masks downstream).

Everything is static-shape for XLA: proposals are padded to
`num_proposals`, detections to `max_detections`, and per-class NMS runs as a
fixed-trip masked loop. The converter (convert_detic.py) maps the published
checkpoint; hyperparameters mirror the Detic/CenterNet2 configs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from cm3d_tpu.models.swin import SWIN_B, SWIN_TEST, SwinConfig, SwinTransformer
from cm3d_tpu.ops.nms import nms_2d_classwise
from cm3d_tpu.ops.roi_align import multilevel_roi_align


@dataclasses.dataclass(frozen=True)
class DeticConfig:
    swin: SwinConfig = SWIN_B
    fpn_dim: int = 256
    # CenterNet2 proposal head
    num_head_convs: int = 4
    head_gn_groups: int = 32
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)  # p3..p7
    pre_nms_topk: int = 1000
    post_nms_topk: int = 256
    proposal_nms_thresh: float = 0.9
    # cascade ROI heads
    num_cascade_stages: int = 3
    pooler_size: int = 7
    fc_dim: int = 1024
    embed_dim: int = 512  # CLIP space
    norm_temperature: float = 50.0
    cascade_deltas: Tuple[Tuple[float, ...], ...] = (
        (10.0, 10.0, 5.0, 5.0),
        (20.0, 20.0, 10.0, 10.0),
        (30.0, 30.0, 15.0, 15.0),
    )
    # test-time
    score_thresh: float = 0.1  # reference :35
    nms_thresh: float = 0.5
    max_detections: int = 128
    # (proposal, class) pairs entering the final class-wise NMS. detectron2
    # NMSes ALL above-threshold pairs then truncates; this bounds the NMS
    # working set — exact whenever <= nms_topk pairs clear score_thresh.
    nms_topk: int = 1024
    mult_proposal_score: bool = True
    dtype: str = "float32"  # compute dtype for FPN/heads (params stay f32)


DETIC_SWINB = DeticConfig()
DETIC_TEST = DeticConfig(
    swin=SWIN_TEST,
    fpn_dim=32,
    num_head_convs=1,
    head_gn_groups=4,
    strides=(8, 16),
    pre_nms_topk=64,
    post_nms_topk=32,
    fc_dim=32,
    embed_dim=16,
    max_detections=16,
)


class FPN(nn.Module):
    """Top-down FPN over the Swin stages + P6/P7 extra levels."""

    cfg: DeticConfig

    @nn.compact
    def __call__(self, feats: Dict[str, jax.Array]) -> Dict[int, jax.Array]:
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        names = sorted(feats.keys())  # coarse-to-fine: swin1 < swin2 < swin3
        d = cfg.fpn_dim
        laterals = [
            nn.Conv(d, (1, 1), dtype=dt, name=f"lateral{i}")(feats[n])
            for i, n in enumerate(names)
        ]
        # top-down pathway
        for i in range(len(laterals) - 2, -1, -1):
            up = laterals[i + 1]
            b, h, w, c = up.shape
            th, tw = laterals[i].shape[1], laterals[i].shape[2]
            up = jax.image.resize(up, (b, 2 * h, 2 * w, c), "nearest")[:, :th, :tw]
            laterals[i] = laterals[i] + up
        outs = [
            nn.Conv(d, (3, 3), padding=1, dtype=dt, name=f"output{i}")(laterals[i])
            for i in range(len(laterals))
        ]
        levels: Dict[int, jax.Array] = {}
        base = 3  # p3 first
        for i, o in enumerate(outs):
            levels[base + i] = o
        # extra levels from the last output (CenterNet2 P6/P7 style)
        n_extra = len(self.cfg.strides) - len(outs)
        x = outs[-1]
        for j in range(n_extra):
            x = nn.Conv(d, (3, 3), strides=(2, 2), padding=1, dtype=dt, name=f"top_block{j}")(
                nn.relu(x) if j > 0 else x
            )
            levels[base + len(outs) + j] = x
        return levels


class CenterNetHead(nn.Module):
    """Class-agnostic proposal head shared across levels."""

    cfg: DeticConfig

    @nn.compact
    def __call__(self, feats: Dict[int, jax.Array]):
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        hms, regs = {}, {}
        convs_bbox = [
            (nn.Conv(cfg.fpn_dim, (3, 3), padding=1, dtype=dt, name=f"bbox_conv{i}"),
             # torch nn.GroupNorm default eps=1e-5 (flax defaults to 1e-6)
             nn.GroupNorm(cfg.head_gn_groups, epsilon=1e-5, name=f"bbox_gn{i}"))
            for i in range(cfg.num_head_convs)
        ]
        convs_share = [
            (nn.Conv(cfg.fpn_dim, (3, 3), padding=1, dtype=dt, name=f"share_conv{i}"),
             nn.GroupNorm(cfg.head_gn_groups, epsilon=1e-5, name=f"share_gn{i}"))
            for i in range(cfg.num_head_convs)
        ]
        hm_out = nn.Conv(1, (3, 3), padding=1, name="agn_hm")
        reg_out = nn.Conv(4, (3, 3), padding=1, name="bbox_reg")
        for li, (lvl, x) in enumerate(sorted(feats.items())):
            y = x
            for conv, gn in convs_share:
                y = nn.relu(gn(conv(y)))
            b = y
            for conv, gn in convs_bbox:
                b = nn.relu(gn(conv(b)))
            scale = self.param(f"scale{li}", nn.initializers.ones, ())
            hms[lvl] = hm_out(y)[..., 0]
            regs[lvl] = nn.relu(reg_out(b) * scale)
        return hms, regs


def decode_proposals(
    hms: Dict[int, jax.Array],
    regs: Dict[int, jax.Array],
    strides: Dict[int, int],
    cfg: DeticConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Per-level topk + NMS -> padded [post_nms_topk, 4] proposals + scores.

    Single image (no batch dim on inputs' leading axis = 1 assumed).
    """
    all_boxes, all_scores = [], []
    for lvl in sorted(hms.keys()):
        hm = jax.nn.sigmoid(hms[lvl][0])  # [H, W]
        reg = regs[lvl][0]  # [H, W, 4] ltrb (already relu'd + scaled)
        s = strides[lvl]
        h, w = hm.shape
        k = min(cfg.pre_nms_topk, h * w)
        score, idx = jax.lax.top_k(hm.reshape(-1), k)
        ys = (idx // w).astype(jnp.float32) * s + s / 2
        xs = (idx % w).astype(jnp.float32) * s + s / 2
        r = reg.reshape(-1, 4)[idx] * s
        boxes = jnp.stack(
            [xs - r[:, 0], ys - r[:, 1], xs + r[:, 2], ys + r[:, 3]], axis=1
        )
        all_boxes.append(boxes)
        all_scores.append(score)
    boxes = jnp.concatenate(all_boxes, axis=0)
    scores = jnp.concatenate(all_scores, axis=0)
    # CenterNet2 cats ALL levels per image, then runs one class-agnostic
    # ml_nms over the combined set before the post-NMS top-k — per-level
    # NMS would let cross-level duplicates survive into the cascade.
    keep = nms_2d_classwise(
        boxes,
        scores,
        jnp.zeros(scores.shape[0], jnp.int32),
        scores > 0,
        cfg.proposal_nms_thresh,
    )
    top_scores, top_idx = jax.lax.top_k(
        jnp.where(keep, scores, 0.0), cfg.post_nms_topk
    )
    return boxes[top_idx], top_scores


class CascadeBoxHead(nn.Module):
    """One cascade stage: 2-FC head + zero-shot classifier + agnostic deltas."""

    cfg: DeticConfig

    @nn.compact
    def __call__(self, pooled: jax.Array, classifier: jax.Array):
        """pooled: [R, s, s, C]; classifier: [embed_dim, K] normalized.

        Returns (scores [R, K] sigmoid, deltas [R, 4]).
        """
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        x = pooled.reshape(pooled.shape[0], -1)
        x = nn.relu(nn.Dense(cfg.fc_dim, dtype=dt, name="fc1")(x))
        x = nn.relu(nn.Dense(cfg.fc_dim, dtype=dt, name="fc2")(x))
        emb = nn.Dense(cfg.embed_dim, name="cls_proj")(x)
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)
        logits = cfg.norm_temperature * (emb @ classifier)
        cls_bias = self.param("cls_bias", nn.initializers.zeros, ())
        scores = jax.nn.sigmoid(logits + cls_bias)
        deltas = nn.Dense(4, name="bbox_pred")(
            nn.relu(nn.Dense(cfg.fc_dim, name="bbox_fc")(x))
        )
        return scores, deltas


def apply_deltas(boxes: jax.Array, deltas: jax.Array, weights) -> jax.Array:
    """detectron2 Box2BoxTransform.apply_deltas (class-agnostic)."""
    wx, wy, ww, wh = weights
    widths = boxes[:, 2] - boxes[:, 0]
    heights = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + 0.5 * widths
    cy = boxes[:, 1] + 0.5 * heights
    dx, dy, dw, dh = deltas[:, 0] / wx, deltas[:, 1] / wy, deltas[:, 2] / ww, deltas[:, 3] / wh
    dw = jnp.clip(dw, max=4.135)  # log(1000/16) like detectron2
    dh = jnp.clip(dh, max=4.135)
    pcx = dx * widths + cx
    pcy = dy * heights + cy
    pw = jnp.exp(dw) * widths
    ph = jnp.exp(dh) * heights
    return jnp.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], axis=1
    )


class DeticDetections(NamedTuple):
    boxes: jax.Array  # [D, 4] xyxy in input-image coords
    scores: jax.Array  # [D]
    classes: jax.Array  # [D] int32
    valid: jax.Array  # [D] bool


def select_detections(
    boxes: jax.Array,    # [R, 4] refined cascade boxes
    scores: jax.Array,   # [R, K] combined per-class scores
    cfg: DeticConfig,
) -> DeticDetections:
    """detectron2 fast_rcnn_inference order: threshold -> class-wise NMS
    over ALL surviving (proposal, class) pairs -> truncate to
    max_detections. Truncating BEFORE NMS (the tempting static-shape
    shortcut) returns strictly fewer distinct objects in crowded scenes:
    pairs ranked past the cap get dropped even when NMS would have
    suppressed the higher-ranked overlapping boxes above them.
    cfg.nms_topk bounds the NMS working set — exact whenever <= nms_topk
    pairs clear score_thresh."""
    r, k = scores.shape
    flat = scores.reshape(-1)
    classes = jnp.tile(jnp.arange(k, dtype=jnp.int32), r)
    box_rep = jnp.repeat(boxes, k, axis=0)
    valid = flat > cfg.score_thresh
    n_cand = min(cfg.nms_topk, r * k)
    cand_s, cand_i = jax.lax.top_k(jnp.where(valid, flat, -1.0), n_cand)
    cand_boxes = box_rep[cand_i]
    cand_classes = classes[cand_i]
    cand_valid = cand_s > cfg.score_thresh
    keep = nms_2d_classwise(
        cand_boxes, cand_s, cand_classes, cand_valid, cfg.nms_thresh
    )
    top_s, top_i = jax.lax.top_k(
        jnp.where(keep & cand_valid, cand_s, -1.0), cfg.max_detections
    )
    return DeticDetections(
        cand_boxes[top_i], top_s, cand_classes[top_i],
        top_s > cfg.score_thresh,
    )


class Detic(nn.Module):
    cfg: DeticConfig = DETIC_SWINB

    def setup(self):
        self.backbone = SwinTransformer(self.cfg.swin)
        self.fpn = FPN(self.cfg)
        self.proposal_head = CenterNetHead(self.cfg)
        self.cascade = [
            CascadeBoxHead(self.cfg, name=f"cascade{i}")
            for i in range(self.cfg.num_cascade_stages)
        ]

    def __call__(
        self,
        image: jax.Array,
        classifier: jax.Array,
        true_hw: jax.Array | None = None,
    ) -> DeticDetections:
        """image: [H, W, 3] normalized; classifier: [embed_dim, K] CLIP
        text embeddings (normalized columns). Returns padded detections.

        true_hw: optional [2] (h, w) of the REAL image content before the
        /32 padding — detectron2 clips boxes to the recorded image_size,
        not the padded canvas, so without it boxes can extend up to 31 px
        into dead padding (and so would the SAM prompts cut from them)."""
        cfg = self.cfg
        feats = self.backbone(image[None])
        levels = self.fpn(feats)
        strides = {lvl: s for lvl, s in zip(sorted(levels), cfg.strides)}
        hms, regs = self.proposal_head(levels)
        boxes, prop_scores = decode_proposals(hms, regs, strides, cfg)

        feats_single = {lvl: levels[lvl][0] for lvl in levels}
        min_l, max_l = min(strides), max(strides)

        if true_hw is None:
            h_img = jnp.asarray(image.shape[0], jnp.float32)
            w_img = jnp.asarray(image.shape[1], jnp.float32)
        else:
            h_img = true_hw[0].astype(jnp.float32)
            w_img = true_hw[1].astype(jnp.float32)
        stage_scores = []
        for i, stage in enumerate(self.cascade):
            pooled = multilevel_roi_align(
                feats_single, boxes, strides, cfg.pooler_size, min_l, max_l
            )
            scores, deltas = stage(pooled, classifier)
            stage_scores.append(scores)
            boxes = apply_deltas(boxes, deltas, cfg.cascade_deltas[i])
            boxes = jnp.stack(
                [
                    jnp.clip(boxes[:, 0], 0, w_img),
                    jnp.clip(boxes[:, 1], 0, h_img),
                    jnp.clip(boxes[:, 2], 0, w_img),
                    jnp.clip(boxes[:, 3], 0, h_img),
                ],
                axis=1,
            )

        scores = jnp.mean(jnp.stack(stage_scores), axis=0)  # [R, K]
        if cfg.mult_proposal_score:
            # geometric mean, Detic/CenterNet2 DeticCascadeROIHeads:
            # ((s * ps) ** 0.5) — NOT s * sqrt(ps), which deflates every
            # score by sqrt(s) and changes what clears score_thresh
            scores = jnp.sqrt(
                scores * jnp.maximum(prop_scores, 0.0)[:, None]
            )
        return select_detections(boxes, scores, cfg)


def quantize_detic_params(params):
    """Float Detic param tree -> the tree DeticConfig with
    swin.quant_int8=True expects: the Swin backbone's MLPs go int8
    (models/swin.quantize_swin_backbone — the boundary shared with the
    GroundingDINO path); FPN, proposal head, and the cascade ROI heads
    stay float (they are a small share of device time and the
    score/delta heads are NMS-threshold-sensitive)."""
    from cm3d_tpu.models.swin import quantize_swin_backbone

    return quantize_swin_backbone(params)


# Detic's configs set INPUT.FORMAT: RGB with ImageNet-order statistics
# (Base-C2_L_R5021k_640b64_4x.yaml). The reference script feeds BGR only
# because DefaultPredictor assumes BGR input and flips BACK to RGB when the
# config says RGB — so the network itself always sees RGB. Feed RGB here.
DETIC_PIXEL_MEAN = np.array([123.675, 116.280, 103.530], np.float32)  # RGB
DETIC_PIXEL_STD = np.array([58.395, 57.120, 57.375], np.float32)


def preprocess_rgb(img_rgb_uint8: np.ndarray, size_divisibility: int = 32) -> np.ndarray:
    """Normalize an RGB uint8 image and pad to the divisibility boundary
    (detectron2 DefaultPredictor applies ResizeShortestEdge upstream; the
    reference instead feeds 1024-thumbnail images directly)."""
    x = (img_rgb_uint8.astype(np.float32) - DETIC_PIXEL_MEAN) / DETIC_PIXEL_STD
    h, w = x.shape[:2]
    ph = -(-h // size_divisibility) * size_divisibility
    pw = -(-w // size_divisibility) * size_divisibility
    out = np.zeros((ph, pw, 3), np.float32)
    out[:h, :w] = x
    return out
