"""Per-stage micro-profile of the CURRENT lift step (ops/lift.py dataflow).

Batch 8 at production scale. Stages are isolated as separate jits fed
realistic intermediates, so each number is that stage's device time alone
(+ one ~28 ms tunnel sync amortized over 3 iters).

Run: python -c "exec(open('scripts/profile_lift2.py').read())"
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from cm3d_tpu.config import LiftStageConfig
from cm3d_tpu.datasets.synthetic import SyntheticConfig, make_keyframe
from cm3d_tpu.datasets.types import stack_keyframes
from cm3d_tpu.ops.bitmask import erode3x3_packed, extract_bit
from cm3d_tpu.ops.lift import _compact_topk
from cm3d_tpu.ops.medoid import masked_medoid
from cm3d_tpu.parallel import make_keyframe_step_fn

B = 8
cfg = LiftStageConfig()
rng = np.random.default_rng(0)
frames = [make_keyframe(SyntheticConfig(), cfg, rng) for _ in range(B)]
f = jax.device_put(stack_keyframes(frames).frames)

N, M, K = cfg.max_points, cfg.max_masks, cfg.max_points_per_mask
NC, NU = cfg.max_points_per_camera, cfg.max_points_in_masks
W, H, MW = f.mask_bits.shape[1:]
C = f.cameras.intrinsics.shape[1]
print(f"B={B} N={N} M={M} K={K} NC={NC} NU={NU} W={W} H={H} C={C}",
      flush=True)


def sync(out):
    leaves = jax.tree.leaves(out)
    return float(np.asarray(jnp.sum(leaves[0].astype(jnp.float32))))


def timeit(name, fn, *args):
    g = jax.jit(fn)
    sync(g(*args))
    t0 = time.perf_counter()
    for _ in range(3):
        out = g(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / 3
    print(f"{name:34s} {dt*1000:8.1f} ms/batch", flush=True)
    return jax.device_put(jax.block_until_ready(g(*args)))


# 0. full fused step
step = make_keyframe_step_fn(cfg)
timeit("FULL keyframe step", step, f)

# 1. erosion on packed planes
timeit("erode3x3_packed", jax.vmap(erode3x3_packed), f.mask_bits)

# 2. synthetic in_image + fx/fy (proxy for projection outputs)
key = jax.random.PRNGKey(0)
in_image = jax.random.bernoulli(key, 0.35, (B, C, N))
fx = jax.random.randint(key, (B, C, N), 1, W - 1)
fy = jax.random.randint(key, (B, C, N), 1, H - 1)
in_image, fx, fy = jax.device_put((in_image, fx, fy))

# 3. per-camera compaction [C, N] -> NC
def cam_compact(in_image):
    return jax.vmap(lambda s: _compact_topk(s, NC))(in_image)

cam_ids, cam_ok = timeit("camera top_k  [C,N]->NC", cam_compact, in_image)

# 4. word gather [C, NC] from [W*H, MW]
flat_all = jnp.clip(fx, 0, W - 1) * H + jnp.clip(fy, 0, H - 1)
flat_c = jnp.take_along_axis(flat_all, cam_ids, axis=2)
flat_c = jax.device_put(flat_c)

def word_gather(mask_bits, flat_c):
    def one(mb, fc):
        return mb.reshape(W * H, MW)[fc]
    return jax.vmap(one)(mask_bits, flat_c)

wpts = timeit("word gather  [C,NC,Mw]", word_gather, f.mask_bits, flat_c)

# 5. union compaction [C, NC] -> NU
def union_compact(wpts, cam_ok):
    union = jnp.any(wpts != 0, axis=-1) & cam_ok
    return jax.vmap(lambda s: _compact_topk(s, NU))(union)

u_pos, u_ok = timeit("union top_k  [C,NC]->NU", union_compact, wpts, cam_ok)

# 6. bit test -> sel [M, NU]
wpts_u = jnp.take_along_axis(wpts, u_pos[..., None], axis=2)
wpts_u = jax.device_put(jnp.where(u_ok[..., None], wpts_u, jnp.uint32(0)))

def bit_test(wpts_u, mask_cam, mask_valid):
    def one(wu, mc, mv):
        word_idx = jnp.arange(M, dtype=jnp.int32) >> 5
        rows = wu[mc, :, word_idx]
        inm = extract_bit(rows, jnp.arange(M, dtype=jnp.int32))
        return inm & mv[:, None]
    return jax.vmap(one)(wpts_u, mask_cam, mask_valid)

sel = timeit("bit test  [M,NU]", bit_test, wpts_u, f.mask_cam, f.mask_valid)

# 7. per-mask compaction [M, NU] -> K
def mask_compact(sel):
    return jax.vmap(lambda s: _compact_topk(s, K))(sel)

pos_k, valid_k = timeit("mask top_k  [M,NU]->K", mask_compact, sel)

# 8. coords gather [M, K, 3]
ids_u = jnp.take_along_axis(cam_ids, u_pos, axis=2)
ids_per_mask = jax.vmap(lambda iu, mc: iu[mc])(ids_u, f.mask_cam)
idx_buf = jnp.take_along_axis(ids_per_mask, pos_k, axis=2)
idx_buf = jax.device_put(jnp.where(valid_k, idx_buf, 0))

def coords_gather(points, idx_buf):
    return jax.vmap(lambda p, i: p[i, :3])(points, idx_buf)

coords = timeit("coords gather  [M,K,3]", coords_gather, f.points, idx_buf)

# 9. medoid
timeit("medoid (pallas)", jax.vmap(masked_medoid), coords, valid_k)
