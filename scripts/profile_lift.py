"""Micro-profile of the lift step's stages on the current backend."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from cm3d_tpu.config import LiftStageConfig
from cm3d_tpu.datasets.synthetic import SyntheticConfig, make_keyframe
from cm3d_tpu.datasets.types import stack_keyframes
from cm3d_tpu.ops.erosion import erode3x3
from cm3d_tpu.ops.medoid import masked_medoid
from cm3d_tpu.geometry.pointcloud import project_to_camera

B = 8
lift_cfg = LiftStageConfig()
syn = SyntheticConfig()
rng = np.random.default_rng(0)
frames = [make_keyframe(syn, lift_cfg, rng) for _ in range(B)]
batch = stack_keyframes(frames).frames
f = jax.device_put(batch)
jax.block_until_ready(f)

M = lift_cfg.max_masks
N = lift_cfg.max_points
K = lift_cfg.max_points_per_mask
W, H = f.masks.shape[2], f.masks.shape[3]
C = f.cameras.intrinsics.shape[1]


def _sync(out):
    # axon tunnel: block_until_ready is unreliable; force a host transfer.
    leaves = jax.tree.leaves(out)
    np.asarray(jnp.sum(leaves[0].astype(jnp.float32)))


def timeit(name, fn, *args):
    g = jax.jit(fn)
    out = g(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = g(*args)
        _sync(out)
    dt = (time.perf_counter() - t0) / 3
    print(f"{name:28s} {dt*1000:9.1f} ms/batch")
    return out


# stage 1: erosion
timeit("erode3x3", lambda m: erode3x3(m), f.masks)

# stage 2: projection (C cameras)
def proj_fn(fr):
    pts = fr.points[..., :3]
    return jax.vmap(lambda p, et, eq, ct, cq, intr: jax.vmap(
        lambda e2, q2, c2, cq2, i2: project_to_camera(p[0] * 0 + p[0], e2, q2, c2, cq2, i2, normalize=True)
    )(et, eq, ct, cq, intr))(pts[:, None], fr.cameras.ego_translation,
                              fr.cameras.ego_rotation, fr.cameras.cam_translation,
                              fr.cameras.cam_rotation, fr.cameras.intrinsics)

def proj_simple(fr):
    def one(p, et, eq, ct, cq, intr):
        return jax.vmap(lambda a, b, c, d, e: project_to_camera(p, a, b, c, d, e, normalize=True))(et, eq, ct, cq, intr)
    return jax.vmap(one)(fr.points[..., :3], fr.cameras.ego_translation,
                         fr.cameras.ego_rotation, fr.cameras.cam_translation,
                         fr.cameras.cam_rotation, fr.cameras.intrinsics)

proj, depths = timeit("projection", proj_simple, f)

# stage 3: the [M, N] in-mask gather
fx = jnp.floor(proj[..., 0]).astype(jnp.int32)
fy = jnp.floor(proj[..., 1]).astype(jnp.int32)
flat_idx = jnp.clip(fx, 0, W - 1) * H + jnp.clip(fy, 0, H - 1)  # [B, C, N]
flat_idx = jax.device_put(flat_idx)

def gather_fn(masks, flat_idx, mask_cam):
    def one(mk, fi, mc):
        mask_flat = mk.reshape(M, W * H)
        idx_per_mask = fi[mc]  # [M, N]
        return jnp.take_along_axis(mask_flat, idx_per_mask, axis=1)
    return jax.vmap(one)(masks, flat_idx, mask_cam)

sel = timeit("in-mask gather [M,N]", gather_fn, f.masks, flat_idx, f.mask_cam)
sel = jax.device_put(sel & (flat_idx[:, 0][:, None] % 7 != 0))

# stage 4: scatter compaction
def compact_fn(sel):
    def one(s):
        counts = jnp.sum(s, axis=1).astype(jnp.int32)
        pos = jnp.cumsum(s, axis=1, dtype=jnp.int32) - 1
        cols = jnp.where(s, pos, K)
        rows = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[:, None], (M, N))
        pid = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (M, N))
        return jnp.zeros((M, K), jnp.int32).at[rows, cols].set(pid, mode="drop"), counts
    return jax.vmap(one)(sel)

(idx_buf, counts) = timeit("scatter compaction", compact_fn, sel)

# stage 5: medoid
coords = jax.device_put(jnp.take_along_axis(f.points[..., None, :3], idx_buf[..., None], axis=1) if False else
                        jax.vmap(lambda p, i: p[i, :3])(f.points, idx_buf))
valid_k = jax.device_put(jnp.arange(K)[None, None, :] < jnp.minimum(counts, K)[..., None])

def medoid_fn(coords, valid_k):
    return jax.vmap(masked_medoid)(coords, valid_k)

timeit("medoid", medoid_fn, coords, valid_k)
