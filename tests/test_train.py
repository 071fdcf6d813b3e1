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
