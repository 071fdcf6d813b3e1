"""On-device train-time augmentation for the semi-sup detectors.

The reference trains its semi-sup rows in external CenterPoint/BEVFusion
repos whose standard recipes use global flip / rotation / scaling /
translation noise; this is the in-framework, jit-compiled equivalent. The
whole transform is one affine A applied identically to points and box
centers (sizes scale, yaws rotate/reflect), so it runs inside the train
step keyed by (seed, global step) — no host RNG, exact kill-and-restart
replay, and it shards over the mesh with the rest of the step.

For the camera+LiDAR model the SAME rigid+scale A premultiplies
`cam_to_ego`, keeping the lift-splat geometry consistent: pixels and
depth bins are untouched while the splatted ego-frame coordinates move
with the point cloud.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    flip_x_prob: float = 0.5  # reflect across the y axis (x -> -x)
    flip_y_prob: float = 0.5  # reflect across the x axis (y -> -y)
    rot_max: float = 0.3925  # global z-rotation, U(-rot_max, rot_max) rad
    scale_min: float = 0.95
    scale_max: float = 1.05
    translate_std: float = 0.2  # N(0, std) xyz shift, meters


def _sample_affine(key: jax.Array, cfg: AugmentConfig):
    """One sample's transform: (A [4,4], flips [2] bool, theta, scale)."""
    k_fx, k_fy, k_rot, k_scale, k_t = jax.random.split(key, 5)
    flip_x = jax.random.uniform(k_fx) < cfg.flip_x_prob
    flip_y = jax.random.uniform(k_fy) < cfg.flip_y_prob
    theta = jax.random.uniform(k_rot, minval=-cfg.rot_max, maxval=cfg.rot_max)
    scale = jax.random.uniform(k_scale, minval=cfg.scale_min,
                               maxval=cfg.scale_max)
    shift = cfg.translate_std * jax.random.normal(k_t, (3,))

    sx = jnp.where(flip_x, -1.0, 1.0)
    sy = jnp.where(flip_y, -1.0, 1.0)
    c, s = jnp.cos(theta), jnp.sin(theta)
    # rotate AFTER flip: A3 = scale * R @ F
    r = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    r = r.at[0, 0].set(c * sx).at[0, 1].set(-s * sy)
    r = r.at[1, 0].set(s * sx).at[1, 1].set(c * sy)
    a3 = scale * r
    a = jnp.eye(4).at[:3, :3].set(a3).at[:3, 3].set(shift)
    return a, (flip_x, flip_y), theta, scale


def _apply_one(key: jax.Array, points, boxes, cfg: AugmentConfig):
    """Transform one sample's points [N,4] and boxes [M,8]."""
    a, (flip_x, flip_y), theta, scale = _sample_affine(key, cfg)
    a3, shift = a[:3, :3], a[:3, 3]

    # meter-scale coordinate dots need HIGHEST: the default TPU f32 dot
    # runs bf16 passes (~2^-9 relative), ~0.1 m of rounding at the +-51 m
    # grid extent — a systematic noise floor on the regression TARGETS
    # (same convention as ops/range_image.py / ops/medoid.py)
    hp = jax.lax.Precision.HIGHEST
    new_pts = points.at[:, :3].set(
        jnp.matmul(points[:, :3], a3.T, precision=hp) + shift
    )

    center = jnp.matmul(boxes[:, :3], a3.T, precision=hp) + shift
    size = boxes[:, 3:6] * scale
    # yaw under reflection: x-flip maps yaw -> pi - yaw, y-flip -> -yaw;
    # then the rotation adds theta. sin/cos targets make wrapping free.
    yaw = boxes[:, 6]
    yaw = jnp.where(flip_x, jnp.pi - yaw, yaw)
    yaw = jnp.where(flip_y, -yaw, yaw)
    yaw = yaw + theta
    new_boxes = jnp.concatenate(
        [center, size, yaw[:, None], boxes[:, 7:8]], axis=-1
    )
    return new_pts, new_boxes, a


def augment_batch(
    key: jax.Array,
    points: jax.Array,  # [B, N, 4]
    boxes: jax.Array,  # [B, M, 8]
    cfg: AugmentConfig,
    cam_to_ego: jax.Array | None = None,  # [B, C, 4, 4]
) -> Tuple[jax.Array, jax.Array, jax.Array | None]:
    """Per-sample random global transform; returns (points, boxes[,
    cam_to_ego']). Validity masks are unaffected (the transform moves
    points, it never drops them)."""
    keys = jax.random.split(key, points.shape[0])
    new_pts, new_boxes, a = jax.vmap(
        lambda k, p, b: _apply_one(k, p, b, cfg)
    )(keys, points, boxes)
    new_cams = None
    if cam_to_ego is not None:
        new_cams = jnp.einsum("bij,bcjk->bcik", a, cam_to_ego,
                              precision=jax.lax.Precision.HIGHEST)
    return new_pts, new_boxes, new_cams
