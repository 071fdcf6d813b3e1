"""Compaction kernel parity vs the top_k + gather reference (interpret)."""

import numpy as np
import jax
import jax.numpy as jnp

from cm3d_tpu.kernels.compact_pallas import compact_rows_pallas
from cm3d_tpu.ops.lift import _compact_topk

RNG = np.random.default_rng(0)


def _reference(sel, values, limit):
    ids, ok = _compact_topk(jnp.asarray(sel), limit)
    v = jnp.take_along_axis(jnp.asarray(values), ids[:, None, :], axis=2)
    return np.asarray(jnp.where(ok[:, None, :], v, 0.0))


def test_compact_rows_matches_topk_gather():
    r, s, d, limit = 5, 4096, 3, 1024
    sel = RNG.random((r, s)) < 0.3
    sel[1] = False                      # empty row
    sel[2] = True                       # full row (truncates at limit)
    sel[3, : s // 2] = False            # selection concentrated late
    values = RNG.standard_normal((r, d, s)).astype(np.float32)
    out = np.asarray(
        compact_rows_pallas(jnp.asarray(sel), jnp.asarray(values), limit,
                            interpret=True)
    )
    want = _reference(sel, values, limit)
    np.testing.assert_array_equal(out, want)  # EXACT (one-hot f32 matmul)


def test_compact_rows_int_ids_exact():
    """Integer payloads (point ids) survive the f32 matmul exactly."""
    r, s, limit = 2, 2048, 512
    sel = RNG.random((r, s)) < 0.5
    ids = RNG.integers(0, 1 << 23, (r, 1, s)).astype(np.float32)
    out = np.asarray(
        compact_rows_pallas(jnp.asarray(sel), jnp.asarray(ids), limit,
                            interpret=True)
    )
    want = _reference(sel, ids, limit)
    np.testing.assert_array_equal(out, want)
    assert (out == np.round(out)).all()


def test_compact_rows_under_vmap():
    b, r, s, d, limit = 3, 4, 2048, 2, 512
    sel = RNG.random((b, r, s)) < 0.25
    values = RNG.standard_normal((b, r, d, s)).astype(np.float32)
    out = np.asarray(
        jax.vmap(lambda se, va: compact_rows_pallas(se, va, limit,
                                                    interpret=True))(
            jnp.asarray(sel), jnp.asarray(values)
        )
    )
    for i in range(b):
        np.testing.assert_array_equal(out[i], _reference(sel[i], values[i], limit))


def test_compact_rows_odd_shapes_padded():
    """Non-tile-multiple S and limit work (internal padding + slice-back)."""
    r, s, d, limit = 3, 3000, 2, 1000  # 3000 % 2048 != 0, 1000 % 512 != 0
    sel = RNG.random((r, s)) < 0.3
    values = RNG.standard_normal((r, d, s)).astype(np.float32)
    out = np.asarray(
        compact_rows_pallas(jnp.asarray(sel), jnp.asarray(values), limit,
                            interpret=True)
    )
    assert out.shape == (r, d, limit)
    np.testing.assert_array_equal(out, _reference(sel, values, limit))


def test_lift_pallas_branch_matches_topk_on_cpu():
    """The TPU-default compaction branch of lift_keyframe, run through the
    Pallas interpreter, must match the top_k+gather branch bit-for-bit —
    integration coverage for the glue (vals assembly, id roundtrip,
    valid_k) that CI's CPU backend never exercises otherwise."""
    import cm3d_tpu.ops.lift as lift_mod
    from cm3d_tpu.config import LiftStageConfig
    from cm3d_tpu.datasets.synthetic import SyntheticConfig, make_keyframe
    from cm3d_tpu.datasets.types import stack_keyframes
    from cm3d_tpu.parallel import make_keyframe_step_fn

    cfg = LiftStageConfig(
        max_points=1500, max_masks=16, max_points_per_mask=300,
        max_points_per_camera=1024, max_points_in_masks=640,
        max_lane_points=256,
    )
    syn = SyntheticConfig(num_cameras=2, image_w=128, image_h=96,
                          points_per_frame=1200, objects_per_frame=5)
    rng = np.random.default_rng(7)
    batch = stack_keyframes(
        [make_keyframe(syn, cfg, rng) for _ in range(2)]
    )
    outs = {}
    try:
        # (compact mode, folded camera/union stages): the folded variant
        # rides xyz/flat/id/word-halves through the one-hot kernels
        for mode, fold in (("interpret", True), ("interpret", False),
                           (False, False)):
            lift_mod._USE_PALLAS_COMPACT = mode
            lift_mod._FOLD_CAMERA_UNION = fold
            step = jax.jit(make_keyframe_step_fn(cfg))
            outs[(mode, fold)] = jax.tree.map(np.asarray, step(batch.frames))
    finally:
        lift_mod._USE_PALLAS_COMPACT = None
        lift_mod._FOLD_CAMERA_UNION = None
    ref = outs[(False, False)]
    for key in (("interpret", True), ("interpret", False)):
        for got, want in zip(jax.tree.leaves(outs[key]),
                             jax.tree.leaves(ref)):
            np.testing.assert_array_equal(got, want)


def test_compact_rows_small_unaligned_s():
    """S below the chunk size and not a 128-multiple: the chunk rounds up
    to 128 alignment (Mosaic only guarantees dynamic lane offsets at
    128-multiples) and padding absorbs the rest — bit-exact."""
    r, s, d, limit = 4, 1500, 3, 500
    sel = RNG.random((r, s)) < 0.4
    values = RNG.standard_normal((r, d, s)).astype(np.float32)
    out = np.asarray(
        compact_rows_pallas(jnp.asarray(sel), jnp.asarray(values), limit,
                            interpret=True)
    )
    np.testing.assert_array_equal(out, _reference(sel, values, limit))
    # an explicitly unaligned s_tile override must also be legal
    out2 = np.asarray(
        compact_rows_pallas(jnp.asarray(sel), jnp.asarray(values), limit,
                            interpret=True, s_tile=1500)
    )
    np.testing.assert_array_equal(out2, _reference(sel, values, limit))


def test_compact_rows_vmap_broadcasts_unbatched_operand():
    """A closed-over (unbatched) sel must broadcast in the custom_vmap
    rule, not assert — the same latent bug class fixed for the segment
    kernel's constant maxvals (commit 8f5bb07)."""
    b, r, s, d, limit = 3, 2, 1024, 2, 256
    sel = RNG.random((r, s)) < 0.3
    values = RNG.standard_normal((b, r, d, s)).astype(np.float32)
    sel_j = jnp.asarray(sel)
    out = np.asarray(
        jax.vmap(
            lambda v: compact_rows_pallas(sel_j, v, limit, interpret=True)
        )(jnp.asarray(values))
    )
    for i in range(b):
        np.testing.assert_array_equal(
            out[i], _reference(sel, values[i], limit)
        )


def test_vmem_params_loud_overflow():
    """A per-program block set that can't fit even the raised VMEM cap is
    a clear ValueError, not an opaque Mosaic allocation failure."""
    import pytest

    from cm3d_tpu.kernels.compact_pallas import VMEM_LIMIT, _vmem_params

    with pytest.raises(ValueError, match="VMEM"):
        _vmem_params(False, VMEM_LIMIT + 1, "compact_rows_pallas")
    assert _vmem_params(True, 1024, "x") is None  # interpret: no params


def test_fault_frontier_autochunk(monkeypatch):
    """Shapes inside the measured TPU-worker fault region (>= 96 folded
    rows x >= 32768 sources, TPU_QUEUE_r03.log bisection) are auto-chunked
    into _SAFE_ROWS-row kernel launches (the on-chip-validated envelope)
    instead of raising; interpret mode (which executes the same shapes
    safely) and the validated batch-8 / mask-stage shapes stay single
    launches. The chunked path is bit-exact vs the numpy reference,
    including an uneven remainder block."""
    from cm3d_tpu.kernels import compact_pallas as cp

    # dispatch decision at the bisected frontier; chunks are BALANCED
    # (fewest launches then equal sizes) within the r05-validated 80-row
    # envelope (scripts/probe_fold_envelope.py: 64/80 rows bit-exact
    # on-chip at 32768 sources; 96 kills the worker)
    assert cp._SAFE_ROWS == 80
    assert cp._row_chunks(96, 32768, interpret=False) == 48   # 2x48
    assert cp._row_chunks(192, 131072, interpret=False) == 64  # 3x64
    assert cp._row_chunks(240, 131072, interpret=False) == 80  # 3x80
    # the envelope is judged on the PADDED source count: s=32000 pads up
    # to the 1024-multiple 32768 — exactly the measured fault frontier —
    # callers must pass the padded extent (as _compact_rows_impl does)
    assert cp._row_chunks(96, 32768, interpret=False) is not None
    assert cp._row_chunks(96, 131072, interpret=True) is None  # interpreter
    assert cp._row_chunks(48, 131072, interpret=False) is None  # batch-8 fold
    assert cp._row_chunks(2048, 8192, interpret=False) is None  # mask stage
    # within the validated envelope: single launch
    assert cp._row_chunks(64, 32768, interpret=False) is None
    assert cp._row_chunks(80, 32768, interpret=False) is None

    # numeric parity of the chunked code path: force chunking under the
    # interpreter (rows > 4 -> 4-row launches; r=10 leaves a 2-row tail)
    monkeypatch.setattr(
        cp, "_row_chunks",
        lambda rows, s, interpret: 4 if rows > 4 else None,
    )
    rng = np.random.default_rng(3)
    r, s, limit = 10, 640, 96
    sel = rng.random((r, s)) < 0.2
    vals = rng.normal(size=(r, 2, s)).astype(np.float32)
    out = np.asarray(
        compact_rows_pallas(
            jnp.asarray(sel), jnp.asarray(vals), limit, interpret=True
        )
    )
    np.testing.assert_array_equal(out, _reference(sel, vals, limit))
