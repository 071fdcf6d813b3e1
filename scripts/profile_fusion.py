"""On-chip phase profile of the BEVFusion-lite train step (bench config:
batch 8, 6 cams x 144x256, 24 depth bins, production pillar grid).

Phases timed separately (each its own jit, so absolute ms include
boundary effects — judge the RATIOS and the full-step delta):
  full train step        (the bench.py --stage fusion_train number)
  forward-only loss      (no grad: is the backward the cost?)
  camera trunk fwd       (convs + depth head over the 48-image ring)
  splat fwd              (outer product + 2 sorts + perm gather + segment)
  splat fwd+bwd          (the scatter-free custom-VJP path under test)
  lidar-only train step  (context: everything minus the camera branch)

Run: python -c "exec(open('scripts/profile_fusion.py').read())"
"""

import os
import time

SMOKE = bool(os.environ.get("CM3D_AB_SMOKE"))
if SMOKE:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if SMOKE:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from cm3d_tpu.benchmarks import _synthetic_train_arrays
from cm3d_tpu.train import CenterPointConfig, PillarConfig
from cm3d_tpu.train.bevfusion import (
    BevFusionConfig,
    CameraTrunk,
    FusionBatch,
    init_fusion_state,
    make_fusion_train_step,
    splat_to_bev,
)

WARMUP, ITERS = (1, 1) if SMOKE else (3, 10)
BATCH = 2 if SMOKE else 8
IH, IW = (48, 64) if SMOKE else (144, 256)

pillar_cfg = PillarConfig()
cfg = BevFusionConfig(centerpoint=CenterPointConfig())
state, model, tx = init_fusion_state(
    jax.random.PRNGKey(0), pillar_cfg, cfg, (IH, IW), n_cams=6)

rng = np.random.default_rng(0)
pts, boxes, n_pts, n_box = _synthetic_train_arrays(
    BATCH, pillar_cfg, cfg.centerpoint.num_classes)
k = np.array([[260.0, 0, IW / 2], [0, 260.0, IH / 2], [0, 0, 1]], np.float32)
batch = FusionBatch(
    points=jnp.asarray(pts),
    point_valid=jnp.ones((BATCH, n_pts), bool),
    boxes=jnp.asarray(boxes),
    box_valid=jnp.ones((BATCH, n_box), bool),
    images=jnp.asarray(rng.random((BATCH, 6, IH, IW, 3)).astype(np.float32)),
    intrinsics=jnp.asarray(np.tile(k, (BATCH, 6, 1, 1))),
    cam_to_ego=jnp.asarray(np.tile(np.eye(4, dtype=np.float32),
                                   (BATCH, 6, 1, 1))),
)
batch = jax.device_put(batch)


def sync(x):
    return float(np.asarray(jnp.sum(jnp.asarray(x, jnp.float32))))


def timeit(name, fn, *args):
    try:
        out = None
        for _ in range(WARMUP):
            out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{name:24s} {dt:8.2f} ms", flush=True)
        return dt
    except Exception as e:  # keep profiling the other phases
        print(f"{name:24s} FAILED {type(e).__name__}: {e}", flush=True)
        return float("nan")


# --- full fusion train step (the bench number) ---
step = jax.jit(make_fusion_train_step(model, tx, pillar_cfg))


def full_step(s, b):
    s2, m = step(s, b)
    return m["loss"]


timeit("full train step", full_step, state, batch)

# --- forward-only loss (reuses the step's loss_fn shape via model.apply) ---
from cm3d_tpu.train.targets import build_targets, focal_loss, reg_loss
from cm3d_tpu.train.voxelize import pillarize


def loss_fn(params, batch_stats, b):
    pillars = jax.vmap(lambda p, v: pillarize(p, v, pillar_cfg))(
        b.points, b.point_valid)
    out, _ = model.apply(
        {"params": params, "batch_stats": batch_stats},
        pillars, b.images, b.intrinsics, b.cam_to_ego,
        train=True, mutable=["batch_stats"])
    hm_t, reg_t, reg_m = jax.vmap(
        lambda bx, v: build_targets(bx, v, pillar_cfg,
                                    cfg.centerpoint.num_classes,
                                    cfg.centerpoint.out_stride)
    )(b.boxes, b.box_valid)
    pred_reg = jnp.concatenate(
        [out["offset"], out["z"], out["size"], out["yaw"]], axis=-1)
    return focal_loss(out["heatmap"], hm_t) + 2.0 * reg_loss(
        pred_reg, reg_t, reg_m)


fwd = jax.jit(loss_fn)
timeit("forward-only loss", fwd, state.params, state.batch_stats, batch)

grad = jax.jit(jax.grad(loss_fn))


def grad_loss(p, bs, b):
    return jax.tree_util.tree_leaves(grad(p, bs, b))[0]


timeit("fwd+bwd loss (no opt)", grad_loss, state.params, state.batch_stats,
       batch)

# --- camera trunk forward only ---
trunk_params = state.params["camera"]
trunk_stats = state.batch_stats["camera"]
trunk = CameraTrunk(cfg)


def trunk_fwd(p, bs, imgs):
    (f, d), _ = trunk.apply(
        {"params": p, "batch_stats": bs},
        imgs.reshape(BATCH * 6, IH, IW, 3), True, mutable=["batch_stats"])
    return f


timeit("camera trunk fwd", jax.jit(trunk_fwd), trunk_params, trunk_stats,
       batch.images)

# --- splat alone (production feature-map scale) ---
hf, wf = IH // cfg.img_stride, IW // cfg.img_stride
feats = jnp.asarray(rng.normal(
    size=(BATCH, 6, hf, wf, cfg.cam_channels)).astype(np.float32))
dp = jnp.asarray(rng.random(
    (BATCH, 6, hf, wf, cfg.depth_bins)).astype(np.float32))


def splat(f, d):
    return jax.vmap(lambda ff, dd, kk, ee: splat_to_bev(
        ff, dd, kk, ee, pillar_cfg, cfg))(
            f, d, batch.intrinsics, batch.cam_to_ego)


timeit("splat fwd", jax.jit(splat), feats, dp)


def splat_bwd(f, d):
    return jax.grad(lambda ff: jnp.sum(splat(ff, d) ** 2))(f)


timeit("splat fwd+bwd", jax.jit(splat_bwd), feats, dp)

# --- lidar-only context ---
from cm3d_tpu.train.train import TrainBatch, init_state, make_train_step

lstate, lmodel, ltx = init_state(
    jax.random.PRNGKey(0), pillar_cfg, cfg.centerpoint)
lstep = jax.jit(make_train_step(lmodel, ltx, pillar_cfg))
lbatch = TrainBatch(batch.points, batch.point_valid, batch.boxes,
                    batch.box_valid)


def lidar_step(s, b):
    s2, m = lstep(s, b)
    return m["loss"]


timeit("lidar-only train step", lidar_step, lstate, lbatch)
print("profile_fusion done", flush=True)
