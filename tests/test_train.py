"""CenterPoint-style pretraining: voxelization, targets, overfit, decode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cm3d_tpu.train import (
    CenterPointConfig,
    PillarConfig,
    build_targets,
    decode_detections,
    make_train_step,
    pillarize,
)
from cm3d_tpu.train.train import TrainBatch, init_state

RNG = np.random.default_rng(53)

PILLAR = PillarConfig(x_min=-25.6, x_max=25.6, y_min=-25.6, y_max=25.6,
                      resolution=0.8)
MODEL = CenterPointConfig(num_classes=3, trunk_channels=(32, 32))


def test_pillarize_aggregation():
    cfg = PILLAR
    pts = np.array(
        [
            [0.1, 0.1, -1.0, 0.5],
            [0.3, 0.2, 0.5, 0.7],   # same pillar
            [10.0, -5.0, 0.0, 0.2],
            [100.0, 0.0, 0.0, 0.9],  # out of range
        ],
        np.float32,
    )
    valid = np.array([True, True, True, True])
    feats = np.asarray(pillarize(jnp.asarray(pts), jnp.asarray(valid), cfg))
    h, w = cfg.grid_hw
    assert feats.shape == (h, w, cfg.num_features)
    ix = int((0.1 - cfg.x_min) / cfg.resolution)
    iy = int((0.1 - cfg.y_min) / cfg.resolution)
    cell = feats[ix, iy]
    assert abs(cell[4] - 0.5) < 1e-6  # max z
    assert abs(cell[5] - np.log(3)) < 1e-6  # log1p(count=2)
    assert abs(cell[3] - 0.6) < 1e-6  # mean intensity
    # out-of-range point contributed nowhere
    assert abs(feats[..., 5].sum() - (np.log(3) + np.log(2))) < 1e-5


def test_targets_heatmap_peak_at_center():
    boxes = np.zeros((4, 8), np.float32)
    boxes[0] = [5.0, -3.0, 0.5, 2.0, 4.5, 1.6, 0.3, 1]
    valid = np.array([True, False, False, False])
    hm, reg, mask = build_targets(
        jnp.asarray(boxes), jnp.asarray(valid), PILLAR, 3, out_stride=2
    )
    hm = np.asarray(hm)
    res = PILLAR.resolution * 2
    ix = int((5.0 - PILLAR.x_min) / res)
    iy = int((-3.0 - PILLAR.y_min) / res)
    assert hm[..., 1].max() == hm[ix, iy, 1]
    assert hm[ix, iy, 1] > 0.9
    assert hm[..., 0].max() == 0  # other classes empty
    assert np.asarray(mask)[ix, iy]
    r = np.asarray(reg)[ix, iy]
    np.testing.assert_allclose(r[3:6], np.log([2.0, 4.5, 1.6]), atol=1e-5)


def test_targets_out_of_grid_box_dropped_not_clamped():
    """A valid box beyond the grid must contribute NO targets — and must
    not clobber a real box sitting in the edge cell its index would clamp
    to (regression: clamping redirected out-of-range writes into cell
    h-1, zeroing the edge box's regression targets)."""
    res = PILLAR.resolution * 2
    h = PILLAR.grid_hw[0] // 2
    edge_x = PILLAR.x_min + (h - 1 + 0.5) * res  # center of the last cell
    boxes = np.zeros((2, 8), np.float32)
    boxes[0] = [edge_x, 0.0, 0.5, 2.0, 4.5, 1.6, 0.3, 1]  # in the edge cell
    boxes[1] = [edge_x + 5.0, 0.0, 0.5, 2.0, 4.5, 1.6, 0.3, 2]  # off-grid
    valid = np.array([True, True])
    hm, reg, mask = build_targets(
        jnp.asarray(boxes), jnp.asarray(valid), PILLAR, 3, out_stride=2
    )
    mask = np.asarray(mask)
    iy = int((0.0 - PILLAR.y_min) / res)
    assert mask[h - 1, iy]
    assert mask.sum() == 1  # the off-grid box wrote nowhere
    r = np.asarray(reg)[h - 1, iy]
    np.testing.assert_allclose(r[3:6], np.log([2.0, 4.5, 1.6]), atol=1e-5)
    assert np.asarray(hm)[..., 2].max() == 0  # and splatted no heatmap


def _make_batch(b=2, n=4096, m=6):
    pts = np.zeros((b, n, 4), np.float32)
    valid = np.zeros((b, n), bool)
    boxes = np.zeros((b, m, 8), np.float32)
    bvalid = np.zeros((b, m), bool)
    for i in range(b):
        bg = RNG.uniform([-25, -25, -2], [25, 25, 0], (n - m * 200, 3))
        allp = [np.concatenate([bg, RNG.random((len(bg), 1))], axis=1)]
        for j in range(m):
            cx, cy = RNG.uniform(-20, 20, 2)
            w, l, h = 2.0, 4.5, 1.6
            yaw = RNG.uniform(-np.pi, np.pi)
            cls = int(RNG.integers(0, 3))
            boxes[i, j] = [cx, cy, 0.8, w, l, h, yaw, cls]
            bvalid[i, j] = True
            cluster = np.concatenate(
                [RNG.normal([cx, cy, 0.8], [l / 4, w / 4, h / 4], (200, 3)),
                 RNG.random((200, 1))], axis=1)
            allp.append(cluster)
        p = np.concatenate(allp)[:n]
        pts[i, : len(p)] = p
        valid[i, : len(p)] = True
    return TrainBatch(jnp.asarray(pts), jnp.asarray(valid),
                      jnp.asarray(boxes), jnp.asarray(bvalid))


@pytest.mark.slow
def test_train_step_overfits_and_decodes():
    state, model, tx = init_state(jax.random.PRNGKey(0), PILLAR, MODEL,
                                  learning_rate=3e-3)
    step = jax.jit(make_train_step(model, tx, PILLAR))
    batch = _make_batch()
    losses = []
    for _ in range(60):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]

    # decode on the overfit batch: top boxes should sit near GT centers
    pillars = jax.vmap(lambda p, v: pillarize(p, v, PILLAR))(
        batch.points, batch.point_valid
    )
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        pillars, train=False,
    )
    boxes, scores, classes = decode_detections(
        jax.tree.map(lambda x: x[0], out), PILLAR, MODEL.out_stride, top_k=8
    )
    gt = np.asarray(batch.boxes[0][:, :2])
    top = np.asarray(boxes)[np.asarray(scores) > float(np.asarray(scores)[0]) * 0.5]
    assert len(top) >= 1
    for b in top[:4]:
        d = np.linalg.norm(gt - b[None, :2], axis=1).min()
        assert d < 3.0, (b, d)


def test_train_step_runs_sharded():
    """The FULL training step jits and executes over the 8-device mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cm3d_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=8)
    state, model, tx = init_state(jax.random.PRNGKey(0), PILLAR, MODEL)
    step = jax.jit(make_train_step(model, tx, PILLAR))
    batch = _make_batch(b=8, n=2048, m=4)
    batch = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        ),
        batch,
    )
    with mesh:
        state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_augment_oracle_geometry():
    """augment_batch: box centers transform exactly like points, sizes
    scale by |det A3|^(1/3), yaw direction follows A3, and cam_to_ego is
    premultiplied so camera-frame points land on the transformed ego
    points."""
    from cm3d_tpu.train.augment import AugmentConfig, augment_batch

    cfg = AugmentConfig(flip_x_prob=0.5, flip_y_prob=0.5, rot_max=0.6,
                        scale_min=0.9, scale_max=1.1, translate_std=0.3)
    b, n, m, c = 3, 16, 5, 2
    pts = RNG.normal(0, 10, (b, n, 4)).astype(np.float32)
    boxes = np.zeros((b, m, 8), np.float32)
    boxes[..., :3] = RNG.normal(0, 10, (b, m, 3))
    boxes[..., 3:6] = RNG.uniform(0.5, 4.0, (b, m, 3))
    boxes[..., 6] = RNG.uniform(-np.pi, np.pi, (b, m))
    boxes[..., 7] = RNG.integers(0, 3, (b, m))
    cams = np.tile(np.eye(4, dtype=np.float32), (b, c, 1, 1))
    cams[..., :3, 3] = RNG.normal(0, 2, (b, c, 3))

    # plant point 0 of every sample at box 0's center
    pts[:, 0, :3] = boxes[:, 0, :3]

    key = jax.random.PRNGKey(11)
    new_pts, new_boxes, new_cams = augment_batch(
        key, jnp.asarray(pts), jnp.asarray(boxes), cfg,
        cam_to_ego=jnp.asarray(cams))
    new_pts, new_boxes, new_cams = map(np.asarray,
                                       (new_pts, new_boxes, new_cams))

    # randomness engaged: at least one sample rotated/scaled
    assert not np.allclose(new_pts[..., :3], pts[..., :3])
    # intensity untouched
    np.testing.assert_array_equal(new_pts[..., 3], pts[..., 3])
    assert not np.allclose(new_boxes[..., 6], boxes[..., 6])
    np.testing.assert_array_equal(new_boxes[..., 7], boxes[..., 7])

    for i in range(b):
        # recover the affine from the cam update: A = new_cams @ inv(cams)
        a = new_cams[i, 0] @ np.linalg.inv(cams[i, 0])
        a3, shift = a[:3, :3], a[:3, 3]
        np.testing.assert_allclose(a, new_cams[i, 1] @
                                   np.linalg.inv(cams[i, 1]), atol=1e-5)
        # points follow A
        np.testing.assert_allclose(
            new_pts[i, :, :3], pts[i, :, :3] @ a3.T + shift, atol=1e-4)
        # centers follow A (point 0 was planted at box 0's center)
        np.testing.assert_allclose(
            new_boxes[i, :, :3], boxes[i, :, :3] @ a3.T + shift, atol=1e-4)
        np.testing.assert_allclose(new_pts[i, 0, :3], new_boxes[i, 0, :3],
                                   atol=1e-4)
        # sizes scale by |det|^(1/3)
        scale = abs(np.linalg.det(a3)) ** (1.0 / 3.0)
        np.testing.assert_allclose(new_boxes[i, :, 3:6],
                                   boxes[i, :, 3:6] * scale, rtol=1e-5)
        # yaw direction follows A3: A3[:2,:2] @ d(yaw) = scale * d(yaw')
        d = np.stack([np.cos(boxes[i, :, 6]), np.sin(boxes[i, :, 6])])
        d2 = np.stack([np.cos(new_boxes[i, :, 6]),
                       np.sin(new_boxes[i, :, 6])])
        np.testing.assert_allclose(a3[:2, :2] @ d, scale * d2, atol=1e-4)

    # same key -> identical transform; different key -> different
    p2, _, _ = augment_batch(key, jnp.asarray(pts), jnp.asarray(boxes), cfg,
                             cam_to_ego=jnp.asarray(cams))
    np.testing.assert_array_equal(np.asarray(p2), new_pts)
    p3, _, _ = augment_batch(jax.random.PRNGKey(12), jnp.asarray(pts),
                             jnp.asarray(boxes), cfg,
                             cam_to_ego=jnp.asarray(cams))
    assert not np.allclose(np.asarray(p3), new_pts)


def test_ema_schedule_clip_and_augmented_step():
    """make_optimizer knobs + EMA tracking + in-step augmentation: the
    step runs green, EMA follows decay*ema + (1-decay)*params, and the
    (seed, step)-keyed augmentation replays exactly across runs."""
    from cm3d_tpu.train import AugmentConfig, make_optimizer

    tx = make_optimizer(3e-3, total_steps=4, schedule="cosine",
                        warmup_steps=1, grad_clip=1.0)
    batch = _make_batch()

    def run():
        state, model, _tx = init_state(jax.random.PRNGKey(0), PILLAR, MODEL,
                                       tx=tx, ema=True)
        step = jax.jit(make_train_step(model, _tx, PILLAR, ema_decay=0.5,
                                       augment=AugmentConfig(),
                                       aug_seed=3))
        ema_ref = state.params
        for _ in range(3):
            prev_ema = ema_ref
            state, metrics = step(state, batch)
            assert np.isfinite(float(np.asarray(metrics["loss"])))
            ema_ref = jax.tree.map(lambda e, p: 0.5 * e + 0.5 * p,
                                   prev_ema, state.params)
        return state, ema_ref

    state, ema_ref = run()
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6, atol=1e-7),
        state.ema_params, ema_ref,
    )
    # EMA lags params (they differ after training)
    diffs = jax.tree_util.tree_leaves(jax.tree.map(
        lambda e, p: float(np.abs(np.asarray(e) - np.asarray(p)).max()),
        state.ema_params, state.params))
    assert max(diffs) > 0

    # exact replay: augmentation is keyed by (aug_seed, step), no host RNG
    state2, _ = run()
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        state.params, state2.params,
    )


@pytest.mark.slow
def test_augment_decorrelates_across_devices():
    """Under a collective step (axis_name set), each device must draw a
    DIFFERENT augmentation for the same (seed, step), and the mutated
    BatchNorm stats must pmean back in sync (per-device stats would
    otherwise silently diverge across replicas). With identical per-device
    batches: replica-synced stats that still differ from the no-axis
    reference run prove the transforms differed — the axis_name=None key
    path draws exactly what every device would draw if the axis_index fold
    were dropped."""
    from cm3d_tpu.train import AugmentConfig

    n_dev = jax.local_device_count()
    assert n_dev >= 2
    state, model, tx = init_state(jax.random.PRNGKey(0), PILLAR, MODEL)
    step = jax.pmap(
        make_train_step(model, tx, PILLAR, axis_name="data",
                        augment=AugmentConfig(), aug_seed=7),
        axis_name="data",
    )
    batch = _make_batch(b=1, n=1024, m=2)
    rep = lambda t: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_dev,) + x.shape), t)
    state2, _ = step(rep(state), rep(batch))
    leaves = jax.tree_util.tree_leaves(state2.batch_stats)
    assert leaves, "model has no batch_stats to observe"
    for l in leaves:  # replicas agree exactly: stats are pmean'd
        arr = np.asarray(l)
        np.testing.assert_array_equal(arr, np.broadcast_to(arr[:1], arr.shape))

    ref_step = jax.jit(make_train_step(model, tx, PILLAR,
                                       augment=AugmentConfig(), aug_seed=7))
    ref_state, _ = ref_step(state, batch)
    ref_leaves = jax.tree_util.tree_leaves(ref_state.batch_stats)
    spread = max(
        float(np.abs(np.asarray(l)[0] - np.asarray(r)).max())
        for l, r in zip(leaves, ref_leaves)
    )
    assert spread > 0, "per-device augmentations were identical"


def test_train_step_state_validation():
    """ema_decay/ema_params mismatches and unrealizable out_stride fail
    loudly at trace/config time instead of cryptic pytree or shape
    errors (or silently frozen EMA / doubled decode coordinates)."""
    from cm3d_tpu.train.centerpoint import CenterPointConfig

    with pytest.raises(ValueError, match="out_stride"):
        CenterPointConfig(out_stride=4)

    batch = _make_batch(b=1, n=512, m=2)
    state, model, tx = init_state(jax.random.PRNGKey(0), PILLAR, MODEL)
    with pytest.raises(ValueError, match="ema_decay > 0 requires"):
        jax.jit(make_train_step(model, tx, PILLAR, ema_decay=0.9))(
            state, batch
        )
    state_e, model, tx = init_state(jax.random.PRNGKey(0), PILLAR, MODEL,
                                    ema=True)
    with pytest.raises(ValueError, match="ema_params but ema_decay"):
        jax.jit(make_train_step(model, tx, PILLAR))(state_e, batch)


def test_make_optimizer_validation():
    from cm3d_tpu.train import make_optimizer

    with pytest.raises(ValueError, match="total_steps"):
        make_optimizer(1e-3, schedule="cosine")
    with pytest.raises(ValueError, match="unknown schedule"):
        make_optimizer(1e-3, schedule="step")
