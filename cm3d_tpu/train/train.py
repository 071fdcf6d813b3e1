"""Jittable train step (optax) + detection decode, sharded over the mesh.

The training batch shards over the `data` axis like everything else
(SURVEY.md §2.4): gradients all-reduce over ICI via `pmean` inside the
sharded step. The step covers voxelization -> detector -> losses -> adamw,
so `__graft_entry__.dryrun_multichip` can compile and run the FULL training
step on an N-device mesh.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from cm3d_tpu.train.centerpoint import CenterPointConfig, CenterPointDetector
from cm3d_tpu.train.targets import build_targets, focal_loss, reg_loss
from cm3d_tpu.train.voxelize import PillarConfig, pillarize


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    # exponential moving average of params (None unless ema is enabled;
    # the deploy checkpoint saves the EMA when present)
    ema_params: Any = None


class TrainBatch(NamedTuple):
    points: jax.Array  # [B, N, 4] ego-frame
    point_valid: jax.Array  # [B, N]
    boxes: jax.Array  # [B, M, 8] (x, y, z, w, l, h, yaw, class)
    box_valid: jax.Array  # [B, M]


def make_optimizer(
    learning_rate: float = 1e-3,
    total_steps: int | None = None,
    schedule: str = "const",
    warmup_steps: int = 0,
    grad_clip: float | None = None,
    weight_decay: float = 1e-4,
) -> optax.GradientTransformation:
    """AdamW with an optional LR schedule and global-norm gradient clip —
    the standard CenterPoint-style training recipe knobs (the reference
    trains its semi-sup rows in external repos; these are the equivalents
    a production run needs in-framework)."""
    if schedule == "cosine":
        if not total_steps:
            raise ValueError("cosine schedule needs total_steps")
        lr = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, total_steps
        )
    elif schedule == "const":
        if warmup_steps:
            lr = optax.join_schedules(
                [optax.linear_schedule(0.0, learning_rate, warmup_steps),
                 optax.constant_schedule(learning_rate)],
                [warmup_steps],
            )
        else:
            lr = learning_rate
    else:
        raise ValueError(f"unknown schedule: {schedule!r}")
    tx = optax.adamw(lr, weight_decay=weight_decay)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def init_state(
    rng: jax.Array,
    pillar_cfg: PillarConfig,
    model_cfg: CenterPointConfig,
    learning_rate: float = 1e-3,
    tx: optax.GradientTransformation | None = None,
    ema: bool = False,
) -> Tuple[TrainState, CenterPointDetector, optax.GradientTransformation]:
    model = CenterPointDetector(model_cfg)
    h, w = pillar_cfg.grid_hw
    dummy = jnp.zeros((1, h, w, pillar_cfg.num_features))
    variables = model.init(rng, dummy, train=True)
    tx = tx if tx is not None else optax.adamw(learning_rate)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
        ema_params=variables["params"] if ema else None,
    )
    return state, model, tx


def make_train_step_impl(
    apply_fn,
    cfg: CenterPointConfig,
    tx: optax.GradientTransformation,
    pillar_cfg: PillarConfig,
    axis_name: str | None = None,
    ema_decay: float = 0.0,
    augment=None,
    aug_seed: int = 0,
):
    """Shared step builder for every BEV detector head family (CenterPoint
    and BEVFusion-lite share targets, losses, metrics and the optimizer
    update — only the forward differs). apply_fn(params, batch_stats,
    pillars, batch) -> (head maps, mutated variables).

    ema_decay > 0 maintains state.ema_params (init_state(ema=True)).
    augment: an AugmentConfig — the global flip/rotate/scale/shift
    transform runs inside the step, keyed by (aug_seed, state.step) so a
    resumed run replays the exact augmentation sequence."""

    def loss_fn(params, batch_stats, batch):
        pillars = jax.vmap(lambda p, v: pillarize(p, v, pillar_cfg))(
            batch.points, batch.point_valid
        )
        out, mutated = apply_fn(params, batch_stats, pillars, batch)
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

    def step(state: TrainState, batch):
        if augment is not None:
            from cm3d_tpu.train.augment import augment_batch

            key = jax.random.fold_in(jax.random.PRNGKey(aug_seed), state.step)
            if axis_name is not None:
                # decorrelate augmentation across devices: without this,
                # sample j on every device draws the SAME transform each
                # step (the replicated (seed, step) key), collapsing
                # effective augmentation diversity from global_B to local_B
                key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
            cams = getattr(batch, "cam_to_ego", None)
            pts, boxes, cams = augment_batch(
                key, batch.points, batch.boxes, augment, cam_to_ego=cams
            )
            batch = batch._replace(points=pts, boxes=boxes)
            if cams is not None:
                batch = batch._replace(cam_to_ego=cams)
        grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
            # BatchNorm running stats mutate from each device's LOCAL
            # shard; without this they silently diverge across replicas
            # (the GSPMD-jit path reduces them globally — keep parity).
            new_stats = jax.lax.pmean(new_stats, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if ema_decay:
            if state.ema_params is None:
                raise ValueError(
                    "ema_decay > 0 requires a state built with "
                    "init_state(ema=True) / init_fusion_state(ema=True)"
                )
            ema = jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                state.ema_params, params,
            )
        else:
            if state.ema_params is not None:
                raise ValueError(
                    "state carries ema_params but ema_decay is 0 — the EMA "
                    "would silently freeze at its init values (the deploy "
                    "checkpoint saves the EMA when present)"
                )
            ema = state.ema_params
        return TrainState(params, new_stats, opt_state, state.step + 1,
                          ema), metrics

    return step


def make_train_step(
    model: CenterPointDetector,
    tx: optax.GradientTransformation,
    pillar_cfg: PillarConfig,
    axis_name: str | None = None,
    ema_decay: float = 0.0,
    augment=None,
    aug_seed: int = 0,
):
    """Returns step(state, batch) -> (state, metrics). When axis_name is
    given the gradients pmean over that mesh axis (use under shard_map or
    pmap); under plain jit with sharded batch XLA handles the reduction."""

    def apply_fn(params, batch_stats, pillars, batch):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            pillars,
            train=True,
            mutable=["batch_stats"],
        )

    return make_train_step_impl(apply_fn, model.cfg, tx, pillar_cfg,
                                axis_name, ema_decay=ema_decay,
                                augment=augment, aug_seed=aug_seed)


def decode_detections(
    out: Dict[str, jax.Array],
    pillar_cfg: PillarConfig,
    out_stride: int,
    top_k: int = 128,
):
    """Head maps (single sample) -> (boxes [K, 7], scores [K], classes [K]).

    CenterPoint decode: per-cell class max, global top-k, regression readout.
    """
    hm = jax.nn.sigmoid(out["heatmap"])
    h, w, c = hm.shape
    flat = hm.reshape(-1, c)
    best_cls = jnp.argmax(flat, axis=1)
    best = jnp.max(flat, axis=1)
    scores, idx = jax.lax.top_k(best, top_k)
    classes = best_cls[idx]
    ix = (idx // w).astype(jnp.float32)
    iy = (idx % w).astype(jnp.float32)
    res = pillar_cfg.resolution * out_stride

    def read(m):
        return m.reshape(-1, m.shape[-1])[idx]

    off = read(out["offset"])
    z = read(out["z"])[:, 0]
    size = jnp.exp(read(out["size"]))
    yaw_sc = read(out["yaw"])
    yaw = jnp.arctan2(yaw_sc[:, 0], yaw_sc[:, 1])
    x = (ix + 0.5 + off[:, 0]) * res + pillar_cfg.x_min
    y = (iy + 0.5 + off[:, 1]) * res + pillar_cfg.y_min
    boxes = jnp.stack([x, y, z, size[:, 0], size[:, 1], size[:, 2], yaw], axis=1)
    return boxes, scores, classes
