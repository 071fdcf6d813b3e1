"""A/B: downloading a small multi-leaf pytree from the axon TPU —
per-leaf np.asarray (the run_fused/_deliver pattern) vs one
jax.device_get(tree) vs a single packed-array transfer.

Motivation (PROFILE_E2E_FAST_r05.json): the composed e2e profile spends
~48 ms/kf in boxes download — ~7 leaves x the 28 ms tunnel RTT per
batch. If device_get batches the RPCs (or packing wins), _deliver gets
most of that back.

Run: python -c "exec(open('scripts/ab_download_batch.py').read())"
CM3D_AB_SMOKE=1: tiny CPU plumbing check.
"""

import os
import time

smoke = os.environ.get("CM3D_AB_SMOKE") == "1"

import jax  # noqa: E402

if smoke:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

B, M = 4, 128
reps = 3 if smoke else 20

rng = np.random.default_rng(0)


# a realistic BoxOutputs-shaped tree: 6 small leaves, mixed dtypes
def make_tree(key):
    return {
        "centers": jnp.asarray(rng.normal(size=(B, M, 3)).astype(np.float32)),
        "sizes": jnp.asarray(rng.normal(size=(B, M, 3)).astype(np.float32)),
        "yaws": jnp.asarray(rng.normal(size=(B, M)).astype(np.float32)),
        "scores": jnp.asarray(rng.random((B, M)).astype(np.float32)),
        "labels": jnp.asarray(rng.integers(0, 10, (B, M)).astype(np.int32)),
        "keep": jnp.asarray(rng.random((B, M)) > 0.5),
    }


@jax.jit
def produce(t):
    # a trivial device op so each rep downloads a FRESH buffer
    return jax.tree.map(lambda x: x + (0 if x.dtype == bool else 1), t)


def sync(x):
    return np.asarray(jnp.sum(jnp.asarray(x, jnp.float32)))


tree = make_tree(0)
sync(produce(tree)["centers"])

results = {}

# arm 1: per-leaf np.asarray (current _deliver)
t0 = time.perf_counter()
for _ in range(reps):
    out = produce(tree)
    got = jax.tree.map(np.asarray, out)
results["per_leaf_np_asarray_ms"] = round(
    (time.perf_counter() - t0) / reps * 1000, 1
)

# arm 2: one jax.device_get of the whole tree
t0 = time.perf_counter()
for _ in range(reps):
    out = produce(tree)
    got2 = jax.device_get(out)
results["device_get_tree_ms"] = round(
    (time.perf_counter() - t0) / reps * 1000, 1
)

# arm 3: pack to ONE f32 array on device, single transfer, unpack on host
@jax.jit
def produce_packed(t):
    o = produce(t)
    return jnp.concatenate(
        [o["centers"].reshape(B, -1), o["sizes"].reshape(B, -1),
         o["yaws"], o["scores"],
         o["labels"].astype(jnp.float32), o["keep"].astype(jnp.float32)],
        axis=1,
    )


sync(produce_packed(tree))
t0 = time.perf_counter()
for _ in range(reps):
    packed = np.asarray(produce_packed(tree))
    c = 0
    centers = packed[:, c:c + 3 * M].reshape(B, M, 3); c += 3 * M
    sizes = packed[:, c:c + 3 * M].reshape(B, M, 3); c += 3 * M
    yaws = packed[:, c:c + M]; c += M
    scores = packed[:, c:c + M]; c += M
    labels = packed[:, c:c + M].astype(np.int32); c += M
    keep = packed[:, c:c + M] > 0.5
results["packed_single_ms"] = round(
    (time.perf_counter() - t0) / reps * 1000, 1
)

# sanity: arms agree
np.testing.assert_array_equal(np.asarray(got["centers"]),
                              np.asarray(got2["centers"]))
np.testing.assert_allclose(centers, np.asarray(got["centers"]), rtol=1e-6)
np.testing.assert_array_equal(keep, np.asarray(got["keep"]))

import json  # noqa: E402

print(json.dumps(results), flush=True)
