"""Per-stage profile of the FOLDED lift path (ops/lift.py fold branch) via
cumulative prefixes: each jit re-runs the stages before it, so stage cost =
difference between consecutive rows (XLA fusion across stage boundaries can
shift a little work between rows; read deltas, not absolutes).

Run: python -c "exec(open('scripts/profile_lift3.py').read())"
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from cm3d_tpu.config import LiftStageConfig, class_arrays
from cm3d_tpu.datasets.synthetic import SyntheticConfig, make_keyframe
from cm3d_tpu.datasets.types import stack_keyframes
from cm3d_tpu.geometry.pointcloud import project_to_camera
from cm3d_tpu.kernels.compact_pallas import compact_rows_pallas
from cm3d_tpu.ops.bitmask import erode3x3_packed, extract_bit
from cm3d_tpu.ops.lift import LiftParams, _finish_lift
from cm3d_tpu.parallel import make_keyframe_step_fn

B = 8
cfg = LiftStageConfig()
rng = np.random.default_rng(0)
batch = stack_keyframes(
    [make_keyframe(SyntheticConfig(), cfg, rng) for _ in range(B)]
)
f = jax.device_put(batch.frames)
params = LiftParams(
    max_points_per_mask=cfg.max_points_per_mask,
    max_points_per_camera=cfg.max_points_per_camera,
    max_points_in_masks=cfg.max_points_in_masks,
)

N = cfg.max_points
M = cfg.max_masks
NC = params.max_points_per_camera
NU = params.max_points_in_masks
K = min(params.max_points_per_mask, NU)
W, H, MW = f.mask_bits.shape[1:]
C = f.cameras.intrinsics.shape[1]
print(f"B={B} N={N} M={M} K={K} NC={NC} NU={NU} W={W} H={H} MW={MW} C={C}",
      flush=True)


def fold_prefix(fr, upto):
    """Re-create the fold branch stage by stage; return the live arrays of
    stage `upto` (sum-reduced so XLA can't DCE them)."""
    def one(points, point_valid, cams, mask_bits, mask_cam, mask_valid):
        w, h, mw = mask_bits.shape
        m = mask_cam.shape[0]
        mask_bits = erode3x3_packed(mask_bits)
        if upto == "erode":
            return [mask_bits]
        pts_xyz = points[:, :3].astype(jnp.float32)
        proj, depths = jax.vmap(
            lambda et, eq, ct, cq, intr: project_to_camera(
                pts_xyz, et, eq, ct, cq, intr, normalize=True
            )
        )(cams.ego_translation, cams.ego_rotation, cams.cam_translation,
          cams.cam_rotation, cams.intrinsics)
        px, py = proj[..., 0], proj[..., 1]
        fx = jnp.floor(px).astype(jnp.int32)
        fy = jnp.floor(py).astype(jnp.int32)
        in_image = (
            point_valid[None, :]
            & (depths > params.min_dist)
            & (px > 0) & (px < w - 1) & (py > 0) & (py < h - 1)
            & (fx >= 1) & (fy >= 1)
        )
        flat_all = jnp.clip(fx, 0, w - 1) * h + jnp.clip(fy, 0, h - 1)
        if upto == "project":
            return [in_image, flat_all]
        n_in_image = jnp.sum(in_image, axis=1)
        iota_n = jnp.arange(N, dtype=jnp.float32)
        vals_cam = jnp.concatenate(
            [
                jnp.broadcast_to(pts_xyz.T[None], (C, 3, N)),
                flat_all.astype(jnp.float32)[:, None, :],
                jnp.broadcast_to(iota_n[None, None], (C, 1, N)),
            ],
            axis=1,
        )
        out_c = compact_rows_pallas(in_image, vals_cam, NC)
        xyz_c = out_c[:, :3]
        flat_c = out_c[:, 3].astype(jnp.int32)
        ids_c = out_c[:, 4]
        cam_ok = (
            jnp.arange(NC, dtype=jnp.int32)[None, :]
            < jnp.minimum(n_in_image, NC)[:, None]
        )
        if upto == "cam_compact":
            return [xyz_c, flat_c, ids_c]
        words_flat = mask_bits.reshape(w * h, mw)
        wpts = words_flat[flat_c]
        if upto == "word_gather":
            return [wpts]
        union = jnp.any(wpts != 0, axis=-1) & cam_ok
        wpts_dm = jnp.moveaxis(wpts, -1, 1)
        lo = (wpts_dm & jnp.uint32(0xFFFF)).astype(jnp.float32)
        hi = (wpts_dm >> 16).astype(jnp.float32)
        vals_u = jnp.concatenate([xyz_c, ids_c[:, None], lo, hi], axis=1)
        out_u = compact_rows_pallas(union, vals_u, NU)
        coords_u_dm = out_u[:, :3]
        ids_u_f = out_u[:, 3]
        words_u_dm = (
            (out_u[:, 4 + mw:].astype(jnp.uint32) << 16)
            | out_u[:, 4: 4 + mw].astype(jnp.uint32)
        )
        if upto == "union_compact":
            return [coords_u_dm, ids_u_f, words_u_dm]
        word_idx = jnp.arange(m, dtype=jnp.int32) >> 5
        rows = words_u_dm[mask_cam, word_idx]
        inmask = extract_bit(rows, jnp.arange(m, dtype=jnp.int32))
        sel = inmask & mask_valid[:, None]
        counts = jnp.sum(sel, axis=1).astype(jnp.int32)
        has_points = (counts > 0) & mask_valid
        truncated = counts > K
        vals_c = jnp.concatenate([coords_u_dm, ids_u_f[:, None]], axis=1)
        out = compact_rows_pallas(sel, vals_c[mask_cam], K)
        coords_dm = out[:, :3]
        idx_buf = out[:, 3].astype(jnp.int32)
        valid_k = (
            jnp.arange(K, dtype=jnp.int32)[None, :]
            < jnp.minimum(counts, K)[:, None]
        )
        if upto == "mask_compact":
            return [coords_dm, idx_buf]
        outs = _finish_lift(
            pts_xyz, coords_dm, idx_buf, valid_k, has_points, counts,
            truncated, jnp.zeros((C,), bool),
        )
        return list(outs)

    res = jax.vmap(one)(
        fr.points, fr.point_valid, fr.cameras, fr.mask_bits, fr.mask_cam,
        fr.mask_valid,
    )
    return [jnp.sum(x.astype(jnp.float32)) for x in res]


def sync(out):
    return float(np.asarray(sum(jax.tree.leaves(out))))


def timeit(name, fn, *args, iters=10):
    g = jax.jit(fn) if not hasattr(fn, "lower") else fn
    sync(g(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = g(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:22s} {best*1000:8.2f} ms/batch", flush=True)
    return best


prev = 0.0
for stage in ("erode", "project", "cam_compact", "word_gather",
              "union_compact", "mask_compact", "finish"):
    t = timeit(f"thru {stage}", lambda fr, s=stage: fold_prefix(fr, s), f)
    print(f"  {'delta':20s} {(t - prev)*1000:+8.2f} ms", flush=True)
    prev = t

# full production step (incl. build_boxes) for reference. GOTCHA: the
# warmup MUST sync (host transfer) before the timer starts — on the axon
# tunnel the un-synced first call leaves compile/queue drain inside the
# timed window and roughly doubles the reading.
step = jax.jit(make_keyframe_step_fn(cfg))


def sync_step(out):
    return float(np.asarray(jnp.sum(out[0].centroids)))


sync_step(step(f))
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(10):
        out = step(f)
    sync_step(out)
    best = min(best, (time.perf_counter() - t0) / 10)
print(f"{'FULL step+boxes':22s} {best*1000:8.2f} ms/batch", flush=True)
