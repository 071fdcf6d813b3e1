"""Medoid (argmin of pairwise-distance sums) without materializing N x N.

The reference computes `torch.cdist(P.T, P.T).sum(axis=0).argmin()` per mask
(src/nuscenes/2d_to_3d.py:116-119) — an O(K^2) matrix it materializes in full,
per mask, in a Python loop. Here: batched over masks, distance sums
accumulated in row-chunks via `lax.scan` so peak memory is O(M * CHUNK * K),
with exact first-index argmin tie-breaking (same as torch.argmin).

A Pallas tiled kernel (cm3d_tpu.kernels.medoid_pallas) provides the
high-K fast path; this module is the portable reference implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_CHUNK = 128


def medoid_index(points: jax.Array, valid: jax.Array) -> jax.Array:
    """Index of the medoid of a single point set.

    Args:
      points: [K, 3] coordinates (padding rows arbitrary on CPU; on TPU
        the Pallas kernel additionally requires valid rows COMPACTED to
        the front — every producer in this package emits compacted rows).
      valid: [K] bool; invalid rows are excluded from sums and argmin.

    Returns scalar int32 index of the medoid (first-minimum tie-break).
    """
    return masked_medoid(points[None], valid[None])[0]


def masked_medoid(points: jax.Array, valid: jax.Array) -> jax.Array:
    """Batched medoid. points [M, K, 3], valid [M, K] -> [M] int32.

    For each m: argmin_i sum_j valid_j * ||p_i - p_j||_2 over valid i.
    On TPU the distance sums run in a Pallas kernel with exact fp32
    per-dimension differences (cm3d_tpu.kernels.medoid_pallas); elsewhere a
    chunked XLA scan with a centered |a|^2+|b|^2-2ab MXU expansion.

    TPU PRECONDITION (kernel contract, medoid_pallas.py): valid rows must
    be COMPACTED to the front of each row set — the kernel only computes
    tiles covering the first count rows, so a scattered valid mask would
    leave zero-initialized sums that win the argmin. All in-package
    producers (the lift compaction stages) satisfy this; the XLA fallback
    accepts arbitrary masks.
    """
    if jax.default_backend() == "tpu":
        from cm3d_tpu.kernels.medoid_pallas import medoid_distance_sums_pallas

        sums = medoid_distance_sums_pallas(points.astype(jnp.float32), valid)
        sums = jnp.where(valid, sums, jnp.inf)
        return jnp.argmin(sums, axis=-1).astype(jnp.int32)
    return _masked_medoid_xla(points, valid)


def masked_medoid_rows(rows: jax.Array, valid: jax.Array) -> jax.Array:
    """Batched medoid from D-major coords. rows [M, 3, K], valid [M, K].

    Same result as masked_medoid(transpose(rows)), but on TPU the Pallas
    kernel consumes [M, 3, K] directly (the compaction kernel's output
    layout) — no [M, K, 3] intermediate."""
    if jax.default_backend() == "tpu":
        from cm3d_tpu.kernels.medoid_pallas import medoid_distance_sums_rows_pallas

        sums = medoid_distance_sums_rows_pallas(
            rows.astype(jnp.float32), valid
        )
        sums = jnp.where(valid, sums, jnp.inf)
        return jnp.argmin(sums, axis=-1).astype(jnp.int32)
    return _masked_medoid_xla(jnp.moveaxis(rows, 1, -1), valid)


def _masked_medoid_xla(points: jax.Array, valid: jax.Array) -> jax.Array:
    m, k, _ = points.shape
    chunk = min(_CHUNK, k)
    n_chunks = -(-k // chunk)
    pad_k = n_chunks * chunk
    if pad_k != k:
        points = jnp.pad(points, ((0, 0), (0, pad_k - k), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, pad_k - k)))

    validf = valid.astype(jnp.float32)
    # Zero the padding FIRST: inf/NaN padding rows would otherwise poison
    # the mean (inf * 0 = NaN) and, through the cross terms, every row's
    # distance sum — the masking multiplies cannot remove NaN afterwards.
    points = jnp.where(valid[..., None], points, 0.0)

    # Center each mask's point set before the |a|^2+|b|^2-2ab expansion:
    # global-frame coordinates are ~1e3 while object extents are ~1e1, and
    # the matmul trick is catastrophically cancellation-prone at that ratio.
    # After centering, coordinates are object-sized and fp32 squares are safe.
    n_valid = jnp.maximum(jnp.sum(validf, axis=1, keepdims=True), 1.0)
    mean = jnp.sum(points, axis=1, keepdims=True) / n_valid[..., None]
    pts_f32 = ((points - mean) * validf[..., None]).astype(jnp.float32)

    sq = jnp.sum(pts_f32 * pts_f32, axis=-1)  # [M, K]

    def body(carry, i_chunk):
        start = i_chunk * chunk
        rows = jax.lax.dynamic_slice_in_dim(pts_f32, start, chunk, axis=1)
        rows_sq = jax.lax.dynamic_slice_in_dim(sq, start, chunk, axis=1)
        # [M, chunk, K] = rows @ pts^T on the MXU (fp32-exact accumulation).
        cross = jax.lax.dot_general(
            rows,
            pts_f32,
            (((2,), (2,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
        )
        d2 = rows_sq[:, :, None] + sq[:, None, :] - 2.0 * cross
        dist = jnp.sqrt(jnp.maximum(d2, 0.0))
        sums = jnp.sum(dist * validf[:, None, :], axis=-1)  # [M, chunk]
        return carry, sums

    _, all_sums = jax.lax.scan(body, None, jnp.arange(n_chunks))
    # all_sums: [n_chunks, M, chunk] -> [M, K]
    sums = jnp.transpose(all_sums, (1, 0, 2)).reshape(m, pad_k)[:, :k]
    sums = jnp.where(valid[:, :k], sums, jnp.inf)

    # Refinement pass: even centered, the |a|^2+|b|^2-2ab expansion
    # carries ~1e-3-relative cancellation noise at object scale — enough
    # to flip the argmin between close-but-not-tied minima (observed vs
    # the reference's difference-based torch.cdist in the live-oracle
    # composite A/B). Recompute the top-T candidates' sums with EXACT
    # per-dim f32 differences (the reference's own arithmetic; the
    # Pallas path already does this for every row) and argmin over those.
    t = min(8, k)
    raw = points[:, :k].astype(jnp.float32)  # padding rows already zeroed
    valid_k = valid[:, :k]
    validf_k = valid_k.astype(jnp.float32)
    _, cand = jax.lax.top_k(-sums, t)  # T smallest expansion sums
    cand = jnp.sort(cand, axis=1)  # ascending -> first-index tie-break
    cpts = jnp.take_along_axis(raw, cand[..., None], axis=1)  # [M, T, 3]

    def exact_body(carry, ti):
        diff = raw - cpts[:, ti][:, None, :]  # [M, K, 3]
        d = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        return carry, jnp.sum(d * validf_k, axis=-1)  # [M]

    _, es = jax.lax.scan(exact_body, None, jnp.arange(t))  # [T, M]
    es = jnp.where(
        jnp.take_along_axis(valid_k, cand, axis=1), es.T, jnp.inf
    )
    best = jnp.argmin(es, axis=1)
    return jnp.take_along_axis(
        cand, best[:, None], axis=1
    )[:, 0].astype(jnp.int32)
