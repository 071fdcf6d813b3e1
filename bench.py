"""Driver benchmark entry point. The default run prints exactly ONE JSON
line: the lift-stage throughput (the fused 3D lift step; reference: the
src/nuscenes/2d_to_3d.py main loop). This is NOT the end-to-end number —
the full pipeline is 2D-mask-stage-bound; the fused end-to-end
images->masks->boxes throughput is a separate bench (`--stage e2e`,
through pipelines.e2e.run_fused at production geometry with random
full-size weights — see cm3d_tpu/benchmarks.py for the protocol and its
content-swap caveat) whose measured numbers are recorded in
MASK_BENCH_r0*.json (current: r05).

Modes: --stage lift | masks | e2e | train | fusion_train (single metric
each). `--stage e2e --profile fast` sweeps the composed opt-in speed modes
(sam_size x rect_encode x int8) in one process and prints ONE JSON line
whose points list carries per-mode ms/kf + accuracy envelopes (VERDICT r03
item 3 — the max-throughput deploy profile).
"""

from __future__ import annotations

import json
import sys


def _emit(d: dict) -> None:
    print(json.dumps(d), flush=True)


def main() -> None:
    from cm3d_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    from cm3d_tpu import benchmarks

    stage = None
    if "--stage" in sys.argv:
        i = sys.argv.index("--stage") + 1
        if i >= len(sys.argv):
            raise SystemExit(
                "--stage needs a value: lift | masks | e2e | train | "
                "fusion_train"
            )
        stage = sys.argv[i]
    if stage not in (None, "lift", "masks", "e2e", "train", "fusion_train"):
        # NEVER fall through to the lift headline on a typo: a driver that
        # asked for a specific stage would record a lift number as that
        # stage's result.
        raise SystemExit(f"unknown --stage {stage!r}")

    rect_encode = "--rect_encode" in sys.argv
    quant_int8 = "--quant_int8" in sys.argv
    quant_static = "--quant_static" in sys.argv
    if quant_static and not quant_int8:
        raise SystemExit("--quant_static requires --quant_int8")
    sam_size = "vit_h"
    if "--sam_size" in sys.argv:
        i = sys.argv.index("--sam_size") + 1
        if i >= len(sys.argv) or sys.argv[i] not in ("vit_h", "vit_l",
                                                     "vit_b"):
            raise SystemExit("--sam_size needs vit_h | vit_l | vit_b")
        sam_size = sys.argv[i]
    profile = None
    if "--profile" in sys.argv:
        i = sys.argv.index("--profile") + 1
        if i >= len(sys.argv) or sys.argv[i] != "fast":
            raise SystemExit("--profile supports: fast")
        profile = sys.argv[i]
    if (rect_encode or quant_int8 or sam_size != "vit_h") and \
            stage not in ("masks", "e2e"):
        # same silent-mismeasurement class as the strict --stage check:
        # a run asking for the fast-mode models must not record float
        # numbers as if they were the fast mode's.
        raise SystemExit(
            "--rect_encode/--quant_int8/--sam_size only apply to "
            "--stage masks|e2e"
        )
    if profile and (stage != "e2e" or rect_encode or quant_int8
                    or sam_size != "vit_h"):
        raise SystemExit(
            "--profile fast is an e2e sweep of the speed modes; use it "
            "alone with --stage e2e"
        )
    swin_camera = "--swin_camera" in sys.argv
    camera_bf16 = "--camera_bf16" in sys.argv
    # fused is the production default (the unfused full step kills the
    # TPU worker — see train/bevfusion.py SWIN_T_CAMERA); the negative
    # flag exists for the crash-confirm / XLA-baseline A/B only.
    no_camera_fused = "--no_camera_fused" in sys.argv
    if (swin_camera or camera_bf16 or no_camera_fused) and \
            stage != "fusion_train":
        raise SystemExit(
            "--swin_camera/--camera_bf16/--no_camera_fused only apply to "
            "--stage fusion_train"
        )
    if no_camera_fused and not swin_camera:
        raise SystemExit("--no_camera_fused requires --swin_camera")

    if stage == "masks":
        _emit(benchmarks.bench_mask_stage(
            rect_encode=rect_encode, quant_int8=quant_int8,
            quant_static=quant_static, sam_size=sam_size,
        ))
        return
    if stage == "e2e":
        if profile == "fast":
            _emit(benchmarks.bench_e2e_fast_profile())
            return
        _emit(benchmarks.bench_e2e(
            rect_encode=rect_encode, quant_int8=quant_int8,
            quant_static=quant_static, sam_size=sam_size,
        ))
        return
    if stage == "train":
        _emit(benchmarks.bench_train())
        return
    if stage == "fusion_train":
        _emit(benchmarks.bench_fusion_train(
            camera_backbone="swin_t" if swin_camera else "conv",
            camera_bf16=camera_bf16,
            camera_fused=not no_camera_fused,
        ))
        return
    if stage == "lift":
        _emit(benchmarks.bench_lift())
        return

    # default: exactly ONE JSON line (the driver contract) — the lift-stage
    # headline. The fused end-to-end number is a separate, much slower
    # bench (`--stage e2e`, full-scale 2D-model compiles); its measured
    # values are recorded in MASK_BENCH_r0*.json (current: r05).
    line = benchmarks.bench_lift()
    line["note"] = ("lift stage only; fused images->masks->boxes e2e is "
                    "benched via --stage e2e (see MASK_BENCH_r05.json)")
    _emit(line)


if __name__ == "__main__":
    main()
