"""AOT deployment artifacts via ``jax.export`` (serialized StableHLO).

The reference has no deployment story at all — its pipelines re-build the
torch graph from source on every host. cm3d-tpu's serving artifact is the
TPU-native equivalent: ``cm3d-export`` serializes a flagship jitted program
(the pseudo-label lift step, or the trained-detector inference step from
pipelines/detect.make_detect_fn) to a versioned StableHLO blob that a serving
host loads and calls without re-tracing or re-compiling any framework code —
deserialize + ``.call``. (The ``cm3d_tpu`` package must still be importable
on the serving host: ``load_artifact`` imports the NamedTuple definitions to
register their pytree serialization. No flax model building, Pallas
lowering, or jit tracing runs at load time.)
Checkpointed parameters stay runtime ARGUMENTS of the artifact (the repo's
house rule: params must be jit arguments, never baked constants), so one
artifact serves every checkpoint of the same shape.

Notes:

- Shapes are static by design: the whole framework is fixed-shape for XLA
  (docs/ARCHITECTURE.md), so build one artifact per (config, batch)
  deployment point.
- Kernel selection (Pallas vs portable XLA, ops/lift.py) happens at TRACE
  time from the host's default backend: exporting ON a TPU host embeds the
  Pallas kernels; `--platform tpu` from a CPU-only host cross-lowers the
  portable XLA path (numerically identical, slower). Build on the target
  platform for peak-speed artifacts.
- Round-trip bit-exactness vs the in-process jit is pinned in
  tests/test_deploy.py.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Sequence

_SERIALIZED = False


def _register_serializations() -> None:
    """Idempotently register the framework NamedTuples with jax.export so
    artifact inputs/outputs keep their pytree structure across hosts."""
    global _SERIALIZED
    if _SERIALIZED:
        return
    from jax import export

    from cm3d_tpu.datasets.types import CameraParams, Keyframe
    from cm3d_tpu.ops.lift import BoxOutputs, LiftOutputs

    for t in (CameraParams, Keyframe, LiftOutputs, BoxOutputs):
        try:
            export.register_namedtuple_serialization(
                t, serialized_name=f"cm3d_tpu.{t.__name__}"
            )
        except ValueError:
            pass  # already registered in this process
    _SERIALIZED = True


def _shape_only(tree):
    import jax

    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jax.numpy.shape(x), x.dtype), tree
    )


def export_lift_step(
    lift_cfg=None,
    batch_size: int = 8,
    platforms: Sequence[str] | None = None,
):
    """Export the batched keyframe lift step (KeyframeBatch.frames ->
    (LiftOutputs, BoxOutputs)) as a jax.export.Exported."""
    import jax
    import numpy as np
    from jax import export

    from cm3d_tpu.config import LiftStageConfig
    from cm3d_tpu.datasets.synthetic import SyntheticConfig, make_keyframe
    from cm3d_tpu.datasets.types import stack_keyframes
    from cm3d_tpu.parallel import make_keyframe_step_fn

    _register_serializations()
    lift_cfg = lift_cfg or LiftStageConfig()
    # One synthetic frame fixes the per-frame shapes; the batch avals are
    # shape-only (values never reach the tracer), so don't pay for
    # batch_size full production-scale keyframes.
    frame = make_keyframe(SyntheticConfig(), lift_cfg, np.random.default_rng(0))
    batch = stack_keyframes([frame])
    batched_avals = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct((batch_size,) + x.shape[1:], x.dtype),
        batch.frames,
    )
    step = jax.jit(make_keyframe_step_fn(lift_cfg))
    return export.export(step, platforms=platforms)(batched_avals)


def export_detect_step(
    batch_size: int = 4,
    top_k: int = 128,
    score_thresh: float = 0.1,
    max_points: int = 32768,
    use_camera: bool = False,
    image_hw=(144, 256),
    camera_backbone: str = "conv",
    platforms: Sequence[str] | None = None,
):
    """Export the trained-detector inference step
    (params, batch_stats, points, valid[, images, intrinsics, cam_to_ego])
    -> (boxes, scores, classes, keep). Params are artifact ARGUMENTS: the
    serving host loads any same-shape checkpoint (orbax) and passes it in."""
    import jax
    import jax.numpy as jnp
    from jax import export

    from cm3d_tpu.config import class_arrays
    from cm3d_tpu.pipelines.detect import make_detect_fn
    from cm3d_tpu.train import CenterPointConfig, PillarConfig

    _register_serializations()
    pillar_cfg = PillarConfig()
    h, w = pillar_cfg.grid_hw
    if use_camera:
        from cm3d_tpu.train.bevfusion import BevFusionConfig, BevFusionDetector

        fusion_cfg = BevFusionConfig(
            centerpoint=CenterPointConfig(), camera_backbone=camera_backbone
        )
        model_cfg = fusion_cfg.centerpoint
        model = BevFusionDetector(fusion_cfg, pillar_cfg)
        ih, iw = image_hw
        camera = (
            jnp.zeros((batch_size, 6, ih, iw, 3)),
            jnp.tile(jnp.eye(3), (batch_size, 6, 1, 1)),
            jnp.tile(jnp.eye(4), (batch_size, 6, 1, 1)),
        )
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, h, w, pillar_cfg.num_features)),
            *(c[:1] for c in camera),
            train=True,
        )
    else:
        from cm3d_tpu.train.centerpoint import CenterPointDetector

        model_cfg = CenterPointConfig()
        model = CenterPointDetector(model_cfg)
        camera = ()
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, h, w, pillar_cfg.num_features)), train=True,
        )

    _, _, radii = class_arrays()
    detect = make_detect_fn(
        model, pillar_cfg, radii[: model_cfg.num_classes],
        top_k=top_k, score_thresh=score_thresh, fusion=use_camera,
    )
    args = (
        variables["params"],
        variables.get("batch_stats", {}),
        jnp.zeros((batch_size, max_points, 4)),
        jnp.zeros((batch_size, max_points), bool),
        *camera,
    )
    return export.export(detect, platforms=platforms)(*map(_shape_only, args))


def save_artifact(exported, path: str | Path) -> Path:
    path = Path(path)
    path.write_bytes(exported.serialize())
    return path


def load_artifact(path: str | Path):
    """Deserialize a saved artifact; run it via ``.call(*args)``."""
    from jax import export

    _register_serializations()
    return export.deserialize(bytearray(Path(path).read_bytes()))


def main(argv=None):
    from cm3d_tpu.config import DATASET_LIFT_PRESETS

    p = argparse.ArgumentParser(
        description="Export a jitted cm3d-tpu program as a StableHLO artifact"
    )
    p.add_argument("--what", choices=("lift", "detect"), default="lift")
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--platform", default="",
                   help="comma list (cpu,tpu); default = current backend")
    p.add_argument("--dataset", default="nuscenes",
                   choices=tuple(sorted(DATASET_LIFT_PRESETS)),
                   help="lift: which dataset's LiftStageConfig preset to trace")
    p.add_argument("--use_camera", action="store_true",
                   help="detect: export the BEVFusion-lite variant")
    p.add_argument("--camera_backbone", default="conv",
                   choices=("conv", "swin_t"))
    p.add_argument("--top_k", type=int, default=128)
    p.add_argument("--max_points", type=int, default=32768)
    args = p.parse_args(argv)

    platforms = [s for s in args.platform.split(",") if s] or None
    if platforms and "tpu" not in platforms:
        # Trace on the host: a CPU-only export must not pay (or hang on)
        # the tunneled TPU backend — lowering needs no device anyway.
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.what == "lift":
        # Fail loud on flags the lift artifact would silently ignore.
        ignored = [
            name for name, on in (
                ("--use_camera", args.use_camera),
                ("--camera_backbone", args.camera_backbone != "conv"),
                ("--top_k", args.top_k != 128),
                ("--max_points", args.max_points != 32768),
            ) if on
        ]
        if ignored:
            p.error(f"{', '.join(ignored)} only apply to --what detect")
        exported = export_lift_step(
            lift_cfg=DATASET_LIFT_PRESETS[args.dataset],
            batch_size=args.batch, platforms=platforms,
        )
    else:
        if args.dataset != "nuscenes":
            p.error("--dataset only applies to --what lift")
        exported = export_detect_step(
            batch_size=args.batch, top_k=args.top_k,
            max_points=args.max_points, use_camera=args.use_camera,
            camera_backbone=args.camera_backbone, platforms=platforms,
        )
    out = save_artifact(exported, args.out)
    print(
        f"wrote {out} ({out.stat().st_size} bytes) "
        f"platforms={list(exported.platforms)} "
        f"in_avals={len(exported.in_avals)}"
    )
    return out


if __name__ == "__main__":
    main()
