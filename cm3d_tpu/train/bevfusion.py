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

from cm3d_tpu.train.centerpoint import CenterPointConfig, CenterPointDetector
from cm3d_tpu.train.targets import build_targets, focal_loss, reg_loss
from cm3d_tpu.train.voxelize import PillarConfig, pillarize
from cm3d_tpu.train import voxelize as _voxelize


@dataclasses.dataclass(frozen=True)
class BevFusionConfig:
    centerpoint: CenterPointConfig = CenterPointConfig()
    cam_channels: int = 32          # per-pixel feature width
    cam_trunk: Tuple[int, ...] = (16, 32, 32)  # stride-2 conv stages
    depth_bins: int = 24
    d_min: float = 1.0
    d_max: float = 45.0

    @property
    def img_stride(self) -> int:
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
    ego = jnp.einsum("cij,chwbj->chwbi", rot, pts) + t[:, None, None, None, :]

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

    use_pallas = (
        jax.default_backend() == "tpu"
        if _voxelize._USE_PALLAS_SEGMENT is None
        else bool(_voxelize._USE_PALLAS_SEGMENT)
    )
    if use_pallas:
        from cm3d_tpu.kernels.segment_pallas import segment_sum_max_pallas

        cell_s, perm = jax.lax.sort(
            (cell, jnp.arange(n, dtype=jnp.int32)), num_keys=1
        )
        vals = contrib[perm].T  # one row gather, channels-major for the kernel
        sums, _ = segment_sum_max_pallas(
            cell_s[None], vals[None], jnp.full((1, n), -jnp.inf), n_cells,
            interpret=(_voxelize._USE_PALLAS_SEGMENT == "interpret"),
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
        x = images
        for i, ch in enumerate(cfg.cam_trunk):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                        use_bias=False, name=f"cam{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             name=f"cam{i}_bn")(x)
            x = nn.relu(x)
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


class FusionTrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def init_fusion_state(
    rng: jax.Array,
    pillar_cfg: PillarConfig,
    cfg: BevFusionConfig,
    image_hw: Tuple[int, int],
    n_cams: int = 6,
    learning_rate: float = 1e-3,
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
    tx = optax.adamw(learning_rate)
    state = FusionTrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    return state, model, tx


def make_fusion_train_step(
    model: BevFusionDetector,
    tx: optax.GradientTransformation,
    pillar_cfg: PillarConfig,
    axis_name: str | None = None,
):
    """Fusion twin of train.make_train_step: voxelize + camera splat ->
    fused heads -> identical targets/losses -> adamw. Shards over `data`
    like everything else (SURVEY.md §2.4)."""
    cfg = model.cfg.centerpoint

    def loss_fn(params, batch_stats, batch: FusionBatch):
        pillars = jax.vmap(lambda p, v: pillarize(p, v, pillar_cfg))(
            batch.points, batch.point_valid
        )
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            pillars, batch.images, batch.intrinsics, batch.cam_to_ego,
            train=True,
            mutable=["batch_stats"],
        )
        hm_t, reg_t, reg_m = jax.vmap(
            lambda b, v: build_targets(b, v, pillar_cfg, cfg.num_classes,
                                       cfg.out_stride)
        )(batch.boxes, batch.box_valid)
        l_hm = focal_loss(out["heatmap"], hm_t)
        pred_reg = jnp.concatenate(
            [out["offset"], out["z"], out["size"], out["yaw"]], axis=-1
        )
        l_reg = reg_loss(pred_reg, reg_t, reg_m)
        loss = l_hm + 2.0 * l_reg
        return loss, (mutated.get("batch_stats", batch_stats),
                      {"loss": loss, "loss_heatmap": l_hm, "loss_reg": l_reg})

    def step(state: FusionTrainState, batch: FusionBatch):
        grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            FusionTrainState(params, new_stats, opt_state, state.step + 1),
            metrics,
        )

    return step
