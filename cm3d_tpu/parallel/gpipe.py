"""GPipe-style pipeline parallelism over a `stage` mesh axis.

The workload's models all fit one chip (SURVEY.md §2.4: pure DP is the
default; tensor/sequence sharding are the latency levers), so cm3d_tpu
does not NEED pipeline parallelism — this module completes the
parallelism toolkit for stacks that outgrow one chip (e.g. scaling the
semi-supervised detector's trunk, or a future SAM-scale encoder across a
pod slice). It is the textbook TPU recipe (scaling-book "pipelining"):

  - layer stack params stacked on a leading stage axis, each device
    holding ONE stage's slice (the only sharded operand);
  - activations flow stage -> stage+1 via `lax.ppermute` over ICI — the
    single collective in the schedule;
  - a `lax.scan` over M + S - 1 ticks implements the GPipe schedule:
    stage 0 ingests microbatch t at tick t, stage s runs microbatch
    t - s, the last stage retires microbatch t - (S - 1); the (S - 1)
    bubble ticks at head and tail run garbage that is never stored.

The executor is DIFFERENTIABLE (scan + ppermute + where transpose
cleanly), so it also serves as the pp building block of a training step:
grad(pipeline_apply) is pinned against grad(sequential) in
tests/test_gpipe.py.

Deliberate simplifications, documented for the production path:
  - microbatch inputs/outputs are replicated across stages (in_specs
    P(None)); at dryrun/test scale this costs nothing, at pod scale the
    input would be sharded to stage 0 and the output kept on the last
    stage;
  - no interleaved/looping schedule (1F1B etc.) — GPipe's fill-drain
    bubble is S - 1 of M + S - 1 ticks, fine for M >> S.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def stage_mesh(n_stages: int, devices=None, n_data: int = 1) -> Mesh:
    """A pipeline mesh with a `stage` axis; ``n_data > 1`` returns the
    composed 2-D ``(data, stage)`` mesh for dp x pp training — stages sit
    adjacent within each data row so the per-tick ppermute rides
    neighboring ICI links while the data axis only carries the (rare)
    gradient all-reduce."""
    if devices is None:
        devices = jax.devices()
    need = n_stages * n_data
    if n_stages < 1 or n_data < 1 or need > len(devices):
        raise ValueError(
            f"need n_stages*n_data in 1..{len(devices)}, got "
            f"{n_stages}*{n_data}"
        )
    if n_data == 1:
        return Mesh(np.array(devices[:n_stages]), axis_names=("stage",))
    return Mesh(
        np.array(devices[:need]).reshape(n_data, n_stages),
        axis_names=("data", "stage"),
    )


def stack_layer_params(layer_params: list) -> dict:
    """Stack per-layer param trees [p_0 .. p_{L-1}] (identical structure)
    into one tree whose leaves carry a leading layer axis — the scan /
    pipeline operand layout."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_params)


def make_pipeline_fn(mesh: Mesh, stage_fn, axis: str = "stage",
                     batch_axis: str | None = None):
    """Build `run(stage_params, x) -> y` executing S pipeline stages.

    stage_fn(params_slice, x_mb) -> y_mb applies ONE stage (any
    jax-traceable function: a flax apply, a lax.scan over the stage's
    own layer sub-stack, ...). stage_params: a pytree whose every leaf
    has leading dim S == mesh.shape[axis] (see stack_layer_params).
    x: [M, ...] microbatch-major inputs; stage_fn input/output shapes
    must match (a residual-stack invariant, same as lax.scan requires).

    Returns y [M, ...] with y[m] = stage_{S-1}(... stage_0(x[m])),
    computed on the GPipe fill-drain schedule in M + S - 1 ticks with
    one ppermute per tick.

    ``batch_axis`` composes pipeline with data parallelism on a 2-D mesh
    (see stage_mesh(n_data=...)): each microbatch's dim 1 shards over
    that axis, every data row runs the same fill-drain schedule on its
    batch shard, and params stay replicated across rows — so under
    jax.grad the shard_map transpose all-reduces the per-row param
    cotangents over ``batch_axis`` (the dp gradient sync), exactly the
    composed dp x pp training layout; parity pinned in tests/test_gpipe.py.
    """
    if axis not in mesh.shape:
        raise ValueError(f"mesh has no {axis!r} axis: {dict(mesh.shape)}")
    if batch_axis is not None and batch_axis not in mesh.shape:
        raise ValueError(
            f"mesh has no {batch_axis!r} axis: {dict(mesh.shape)}"
        )
    s = mesh.shape[axis]

    def spmd(params_local, x):  # params_local: [1, ...] slices; x: [M, ...]
        p = jax.tree.map(lambda t: jnp.squeeze(t, 0), params_local)
        stage = jax.lax.axis_index(axis)
        m = x.shape[0]
        perm = [(i, i + 1) for i in range(s - 1)]

        def tick(carry, t):
            state, outbuf = carry
            # stage 0 ingests microbatch t (clamped: drain ticks t >= M
            # feed a repeat of the last microbatch whose result is never
            # stored — cheaper than a guard, identical output)
            inp = jax.lax.dynamic_index_in_dim(
                x, jnp.clip(t, 0, m - 1), 0, keepdims=False
            )
            cur = jnp.where(stage == 0, inp, state)
            out = stage_fn(p, cur)
            # the last stage retires microbatch t - (S - 1)
            r = t - (s - 1)
            stored = jax.lax.dynamic_update_index_in_dim(
                outbuf, out, jnp.clip(r, 0, m - 1), 0
            )
            outbuf = jnp.where((stage == s - 1) & (r >= 0), stored, outbuf)
            # shift activations one stage forward; stage 0's incoming
            # lane is zeros (unused — it reads from x)
            state = jax.lax.ppermute(out, axis, perm) if s > 1 else out
            return (state, outbuf), None

        carry = (jnp.zeros_like(x[0]), jnp.zeros_like(x))
        (_, outbuf), _ = jax.lax.scan(tick, carry, jnp.arange(m + s - 1))
        return outbuf

    # out_specs P(axis): stages concatenate on dim 0 -> [S * M, ...];
    # every stage but the last contributes zeros, the caller slices the
    # last M rows (avoids a psum broadcast of the whole output). With a
    # batch_axis, dim 1 additionally shards over the data rows.
    x_spec = P(None, batch_axis) if batch_axis else P()
    inner = jax.shard_map(
        spmd, mesh=mesh, in_specs=(P(axis), x_spec),
        out_specs=P(axis, batch_axis) if batch_axis else P(axis),
        check_vma=False,
    )

    def run(stage_params, x):
        lead = {None if t.ndim == 0 else t.shape[0]
                for t in jax.tree.leaves(stage_params)}
        if lead != {s}:
            raise ValueError(
                f"stage_params leading dims {lead} != mesh {axis}={s} — "
                "every leaf needs a stacked stage axis (stack_layer_params)"
            )
        if batch_axis:
            # x shards dim 1 over the data axis; catch violations here
            # instead of as opaque shard_map/GSPMD errors
            n_data = mesh.shape[batch_axis]
            if x.ndim < 2:
                raise ValueError(
                    f"batch_axis={batch_axis!r} needs x of rank >= 2 "
                    f"([microbatch, data_rows, ...]); got shape {x.shape}"
                )
            if x.shape[1] % n_data:
                raise ValueError(
                    f"x dim 1 ({x.shape[1]}) must divide evenly over mesh "
                    f"{batch_axis!r}={n_data}"
                )
        return inner(stage_params, x)[-x.shape[0]:]

    return run
