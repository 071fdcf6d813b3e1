"""BEVFusion-style camera+LiDAR detector (compact, TPU-first).

The reference's headline semi-supervised table trains BEVFusion on CM3D
pseudo-labels in an external repo (project page `index.html:298-334`
"Semi-sup BEVFusion + CM3D"); this module closes that loop in-framework
the same way `train/centerpoint.py` does for the CenterPoint rows.

Design (all fixed-shape, jit-friendly):

- A small conv backbone over the camera ring emits per-pixel features and
  a depth DISTRIBUTION over fixed bins (lift-splat-shoot style).
- View transform: every (camera, pixel, depth-bin) triple is a 3D point
  (pinhole ray at the bin's depth, cam->ego via calib). The feature x
  depth-probability outer product splats into the pillar BEV grid by
  cell id. On TPU the splat reuses the voxelizer's recipe: sort by cell
  id, then the Pallas sorted-segment kernel reduces (the XLA scatter-add
  lowering costs ~12 cycles/element — the reason voxelize.py sorts too);
  the permutation is applied as ONE row gather of the [N, F] feature
  matrix (TPU gather cost tracks index rows, not bytes). Other backends
  keep the scatter formulation.
- Fusion: concat [pillar BEV, camera BEV] -> the unchanged CenterPoint
  trunk + heads (`CenterPointDetector` accepts any input channel count),
  so targets, losses and `decode_detections` are shared verbatim.

Intrinsics must be scaled to the input image resolution (same contract as
the lift stage's image_ratio).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from cm3d_tpu.models.swin import SwinConfig, SwinTransformer
from cm3d_tpu.train.centerpoint import CenterPointConfig, CenterPointDetector
from cm3d_tpu.train.train import TrainState, make_train_step_impl
from cm3d_tpu.train.voxelize import PillarConfig
from cm3d_tpu.train import voxelize as _voxelize

# Swin-T (the backbone the reference's BEVFusion rows actually train —
# project page `index.html:298-334` cites BEVFusion, whose camera branch
# is Swin-T) — reuses the Detic/GroundingDINO Swin module. fused_attn
# stays False HERE so the unfused XLA path remains reachable for A/B
# (diag_swin `step` arm); production training routes through
# BevFusionConfig.camera_fused (default True -> fused_attn=None, backend
# auto: the Pallas kernel on TPU, the same XLA path off-TPU). Measured
# on the axon v5e (TPU_QUEUE_r03.log session 11): the fused full train
# step runs at 132.98 ms/batch-8 while the UNFUSED full step reliably
# kills the TPU worker ("kernel fault") even though the unfused trunk
# forward AND backward pass in isolation at identical shapes — an
# XLA:TPU codegen fault somewhere in the full-graph fusion; the Pallas
# kernel both avoids it and is the faster path. The kernel
# differentiates via models/swin.py _fused_attn_fn (custom_vjp
# recomputing the backward through the equivalent XLA branch), and
# fused_fwd validated Swin-T's C=96 lane widths on-chip (parity 3e-5).
SWIN_T_CAMERA = SwinConfig(
    embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
    out_indices=(1, 2, 3), fused_attn=False,
)


@dataclasses.dataclass(frozen=True)
class BevFusionConfig:
    centerpoint: CenterPointConfig = CenterPointConfig()
    cam_channels: int = 32          # per-pixel feature width
    cam_trunk: Tuple[int, ...] = (16, 32, 32)  # stride-2 conv stages
    depth_bins: int = 24
    d_min: float = 1.0
    d_max: float = 45.0
    # "conv": the lite stride-2 conv trunk above (fast default).
    # "swin_t": full Swin-T, multi-scale stage outputs upsampled to the
    # shallowest out-stage's stride and concatenated (the BEVFusion
    # FPN-fusion pattern) before the same feat/depth heads.
    camera_backbone: str = "conv"
    swin: SwinConfig = SWIN_T_CAMERA
    # bf16 compute in the camera backbone (params/optimizer/losses stay
    # f32 — the depth/feature heads cast back before the softmax): the
    # standard TPU mixed-precision training recipe, ~2x MXU peak.
    camera_bf16: bool = False
    # rematerialize Swin blocks on backward (memory for FLOPs; see
    # SwinConfig.remat). Ignored by the conv trunk (too small to matter).
    camera_remat: bool = False
    # fused Pallas window attention in the camera Swin (differentiable via
    # the custom_vjp XLA-recompute backward). Default ON: resolves to
    # fused_attn=None (backend auto — Pallas on TPU, XLA elsewhere); see
    # the SWIN_T_CAMERA note — on the axon v5e the UNFUSED full train
    # step kills the TPU worker while the fused one runs (132.98
    # ms/batch-8), so False is strictly an A/B/debug setting.
    camera_fused: bool = True

    def effective_swin(self) -> SwinConfig:
        """The swin config with the dtype/remat/fused training knobs
        applied — ONE derivation point so CLI wiring stays booleans.

        fused_attn precedence: an explicit "interpret" on the swin config
        (CPU kernel-coverage tests) always wins; otherwise camera_fused
        decides — True -> None (backend auto: Pallas kernel on TPU, the
        XLA path elsewhere), False -> force the unfused XLA path (the
        crash-confirm / baseline A/B; see the SWIN_T_CAMERA note)."""
        fused = self.swin.fused_attn
        if fused != "interpret":
            fused = None if self.camera_fused else False
        return dataclasses.replace(
            self.swin,
            dtype="bfloat16" if self.camera_bf16 else self.swin.dtype,
            remat=self.camera_remat or self.swin.remat,
            fused_attn=fused,
        )

    @property
    def img_stride(self) -> int:
        if self.camera_backbone == "swin_t":
            return self.swin.patch_size * 2 ** min(self.swin.out_indices)
        return 2 ** len(self.cam_trunk)

    def bin_depths(self) -> jnp.ndarray:
        """Bin-center depths, linear in metric depth."""
        step = (self.d_max - self.d_min) / self.depth_bins
        return self.d_min + (jnp.arange(self.depth_bins) + 0.5) * step


def splat_to_bev(
    feats: jax.Array,        # [C, hf, wf, F] per-pixel camera features
    depth_probs: jax.Array,  # [C, hf, wf, B] softmaxed depth distribution
    intrinsics: jax.Array,   # [C, 3, 3] scaled to the INPUT image size
    cam_to_ego: jax.Array,   # [C, 4, 4]
    pillar_cfg: PillarConfig,
    cfg: BevFusionConfig,
) -> jax.Array:
    """Lift-splat BEV pooling: returns [H, W, F] summed camera features.

    Out-of-grid / out-of-z-range points fall into the segment sink cell.
    """
    c, hf, wf, f = feats.shape
    b = cfg.depth_bins
    h, w = pillar_cfg.grid_hw
    stride = cfg.img_stride

    # pixel centers in input-image coordinates
    u = (jnp.arange(wf, dtype=jnp.float32) + 0.5) * stride
    v = (jnp.arange(hf, dtype=jnp.float32) + 0.5) * stride
    fx = intrinsics[:, 0, 0][:, None, None]
    fy = intrinsics[:, 1, 1][:, None, None]
    cx = intrinsics[:, 0, 2][:, None, None]
    cy = intrinsics[:, 1, 2][:, None, None]
    # unit-depth camera-frame ray per pixel: [C, hf, wf]
    rx = jnp.broadcast_to((u[None, None, :] - cx) / fx, (c, hf, wf))
    ry = jnp.broadcast_to((v[None, :, None] - cy) / fy, (c, hf, wf))

    d = cfg.bin_depths()  # [B]
    # camera-frame point per (cam, pix, bin): x right, y down, z forward
    px = rx[..., None] * d
    py = ry[..., None] * d
    pz = jnp.broadcast_to(d, (c, hf, wf, b))
    pts = jnp.stack([px, py, pz], axis=-1)  # [C, hf, wf, B, 3]
    rot = cam_to_ego[:, :3, :3]
    t = cam_to_ego[:, :3, 3]
    # HIGHEST: default TPU f32 dot is bf16 passes — ~0.2 m of rounding at
    # the 45 m depth bins would misbin features across 0.8 m pillar cells
    ego = jnp.einsum("cij,chwbj->chwbi", rot, pts,
                     precision=jax.lax.Precision.HIGHEST) \
        + t[:, None, None, None, :]

    ix = jnp.floor((ego[..., 0] - pillar_cfg.x_min) / pillar_cfg.resolution)
    iy = jnp.floor((ego[..., 1] - pillar_cfg.y_min) / pillar_cfg.resolution)
    ix = ix.astype(jnp.int32)
    iy = iy.astype(jnp.int32)
    in_range = (
        (ix >= 0) & (ix < h) & (iy >= 0) & (iy < w)
        & (ego[..., 2] > pillar_cfg.z_min) & (ego[..., 2] < pillar_cfg.z_max)
    )
    cell = jnp.where(in_range, ix * w + iy, h * w).reshape(-1)  # sink = h*w
    n = cell.shape[0]  # C*hf*wf*B
    n_cells = h * w + 1

    # feature x depth-probability outer product -> [N, F]
    contrib = (feats[..., None, :] * depth_probs[..., None]).reshape(n, f)

    use_pallas, interpret = _voxelize.segment_kernel_mode()
    if use_pallas:
        # the differentiable sum-only wrapper: training flows params
        # through this reduction (unlike pillarize), so it must carry the
        # segment-sum VJP — and its maxvals operand derives from cell so
        # the kernel's custom_vmap sees every operand batched
        from cm3d_tpu.kernels.segment_pallas import segment_sum_pallas

        iota = jnp.arange(n, dtype=jnp.int32)
        cell_s, perm = jax.lax.sort((cell, iota), num_keys=1)
        # inverse permutation via a second sort (scatter-free); the
        # custom-VJP gather keeps the backward pass scatter-free too —
        # XLA's transpose of a plain contrib[perm] gather is a
        # ~12 cycles/element scatter-add over every splat element
        _, inv_perm = jax.lax.sort((perm, iota), num_keys=1)
        # one row gather, channels-major for the kernel
        vals = _voxelize.apply_permutation(contrib, perm, inv_perm).T
        sums = segment_sum_pallas(
            cell_s[None], vals[None], n_cells, interpret,
        )
        bev = sums[0].T  # [n_cells, F]
    else:
        bev = jnp.zeros((n_cells, f)).at[cell].add(contrib)
    return bev[: h * w].reshape(h, w, f)


class CameraTrunk(nn.Module):
    """Per-image conv trunk -> (features [*, hf, wf, F], depth probs
    [*, hf, wf, B]). Runs over the flattened B*C image batch so BatchNorm
    sees every ring image at once (no lifted-vmap mutation issues)."""

    cfg: BevFusionConfig

    @nn.compact
    def __call__(self, images, train: bool = False):
        cfg = self.cfg
        if cfg.camera_backbone == "swin_t":
            outs = SwinTransformer(cfg.effective_swin(), name="swin")(images)
            base = min(cfg.swin.out_indices)
            bh = -(-images.shape[1] // (cfg.swin.patch_size * 2 ** base))
            bw = -(-images.shape[2] // (cfg.swin.patch_size * 2 ** base))
            ups = []
            for i in sorted(cfg.swin.out_indices):
                o = outs[f"swin{i}"]
                f = 2 ** (i - base)
                if f > 1:  # nearest upsample to the base stride, then
                    o = jnp.repeat(jnp.repeat(o, f, axis=1), f, axis=2)
                ups.append(o[:, :bh, :bw])  # crop odd-size merge padding
            x = jnp.concatenate(ups, axis=-1)
        elif cfg.camera_backbone == "conv":
            dt = jnp.bfloat16 if cfg.camera_bf16 else jnp.float32
            x = images
            for i, ch in enumerate(cfg.cam_trunk):
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                            use_bias=False, dtype=dt, name=f"cam{i}")(x)
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.99, name=f"cam{i}_bn")(x)
                x = nn.relu(x)
        else:
            raise ValueError(
                f"unknown camera_backbone {cfg.camera_backbone!r} "
                "(expected 'conv' or 'swin_t')")
        # heads + depth softmax stay f32 regardless of the backbone dtype
        x = x.astype(jnp.float32)
        feats = nn.Conv(cfg.cam_channels, (1, 1), name="cam_feat")(x)
        depth = nn.Conv(cfg.depth_bins, (1, 1), name="cam_depth")(x)
        return feats, jax.nn.softmax(depth, axis=-1)


class BevFusionDetector(nn.Module):
    """Concat [pillar BEV, camera BEV] -> CenterPoint trunk + heads."""

    cfg: BevFusionConfig
    pillar_cfg: PillarConfig

    @nn.compact
    def __call__(self, pillars, images, intrinsics, cam_to_ego,
                 train: bool = False) -> Dict[str, jax.Array]:
        """pillars: [B, H, W, Fp]; images: [B, C, h, w, 3];
        intrinsics: [B, C, 3, 3]; cam_to_ego: [B, C, 4, 4]."""
        bsz, c, ih, iw, _ = images.shape
        stride = self.cfg.img_stride
        assert ih % stride == 0 and iw % stride == 0, (
            f"image_hw ({ih}, {iw}) must be divisible by the camera trunk "
            f"stride {stride}: a ceil-sized conv output walks pixel centers "
            f"past the image extent and silently misprojects the splat "
            f"against the scaled intrinsics"
        )
        feats, depth = CameraTrunk(self.cfg, name="camera")(
            images.reshape(bsz * c, ih, iw, 3), train
        )
        hf, wf = feats.shape[1], feats.shape[2]
        feats = feats.reshape(bsz, c, hf, wf, -1)
        depth = depth.reshape(bsz, c, hf, wf, -1)
        cam = jax.vmap(
            lambda f, dp, k, e: splat_to_bev(
                f, dp, k, e, self.pillar_cfg, self.cfg
            )
        )(feats, depth, intrinsics, cam_to_ego)
        x = jnp.concatenate([pillars, cam], axis=-1)
        return CenterPointDetector(self.cfg.centerpoint, name="centerpoint")(
            x, train
        )


class FusionBatch(NamedTuple):
    points: jax.Array       # [B, N, 4] ego-frame
    point_valid: jax.Array  # [B, N]
    boxes: jax.Array        # [B, M, 8] (x, y, z, w, l, h, yaw, class)
    box_valid: jax.Array    # [B, M]
    images: jax.Array       # [B, C, h, w, 3] normalized float
    intrinsics: jax.Array   # [B, C, 3, 3] scaled to (h, w)
    cam_to_ego: jax.Array   # [B, C, 4, 4]


# identical fields and lifecycle; orbax checkpoints interchange
FusionTrainState = TrainState


def init_fusion_state(
    rng: jax.Array,
    pillar_cfg: PillarConfig,
    cfg: BevFusionConfig,
    image_hw: Tuple[int, int],
    n_cams: int = 6,
    learning_rate: float = 1e-3,
    tx=None,
    ema: bool = False,
):
    """Mirrors train.init_state for the fusion model."""
    model = BevFusionDetector(cfg, pillar_cfg)
    h, w = pillar_cfg.grid_hw
    ih, iw = image_hw
    k = jnp.array([[100.0, 0.0, iw / 2], [0.0, 100.0, ih / 2],
                   [0.0, 0.0, 1.0]])
    variables = model.init(
        rng,
        jnp.zeros((1, h, w, pillar_cfg.num_features)),
        jnp.zeros((1, n_cams, ih, iw, 3)),
        jnp.tile(k, (1, n_cams, 1, 1)),
        jnp.tile(jnp.eye(4), (1, n_cams, 1, 1)),
        train=True,
    )
    tx = tx if tx is not None else optax.adamw(learning_rate)
    state = FusionTrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
        ema_params=variables["params"] if ema else None,
    )
    return state, model, tx


def make_fusion_train_step(
    model: BevFusionDetector,
    tx: optax.GradientTransformation,
    pillar_cfg: PillarConfig,
    axis_name: str | None = None,
    ema_decay: float = 0.0,
    augment=None,
    aug_seed: int = 0,
):
    """Fusion instance of train.make_train_step_impl: voxelize + camera
    splat -> fused heads; targets/losses/optimizer are the SHARED builder
    (one copy to keep in sync). Shards over `data` like everything else
    (SURVEY.md §2.4)."""

    def apply_fn(params, batch_stats, pillars, batch: FusionBatch):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            pillars, batch.images, batch.intrinsics, batch.cam_to_ego,
            train=True,
            mutable=["batch_stats"],
        )

    return make_train_step_impl(apply_fn, model.cfg.centerpoint, tx,
                                pillar_cfg, axis_name, ema_decay=ema_decay,
                                augment=augment, aug_seed=aug_seed)
