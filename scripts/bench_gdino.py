"""On-chip masks-stage bench with GroundingDINO as the detector
(VERDICT r03 item 6: --detector gdino had zero recorded device numbers).

Builds the production fake-model set, swaps the detector for a
random-weight GroundingDINO at the FULL GDINO_SWINT geometry (synthetic
WordPiece vocab over the class list; FLOPs match a converted checkpoint),
wraps with the realistic content swap, and runs bench_mask_stage — the
same pipelined protocol the Detic number (MASK_BENCH_r03) uses, so the
two are directly comparable. The deformable-attention sampling is
take_along_axis gathers (models/gdino.py documents the ~12 cyc/element
TPU cost — the documented offline-alternative path, not production).

Run from repo root: python -c "exec(open('scripts/bench_gdino.py').read())"
CM3D_AB_SMOKE=1: tiny GDINO_TEST scale on CPU (plumbing only).
"""

import json
import os

smoke = os.environ.get("CM3D_AB_SMOKE") == "1"

import jax  # noqa: E402

if smoke:
    jax.config.update("jax_platforms", "cpu")

from cm3d_tpu import benchmarks  # noqa: E402
from cm3d_tpu.pipelines.masks import attach_gdino  # noqa: E402

print(f"bench_gdino smoke={smoke} backend={jax.default_backend()}",
      flush=True)

bf16 = os.environ.get("CM3D_GDINO_BF16") == "1"
models = benchmarks.build_production_fake_models()
models = attach_gdino(models, test=True,
                      fake_scale="test" if smoke else "swint",
                      dtype="bfloat16" if bf16 else "float32")
models = benchmarks._realistic_load(models)

if smoke:
    # plumbing check only: the detector closure built, content swap holds
    import numpy as np

    frame = {"images": [
        np.zeros((benchmarks.IMG_H, benchmarks.IMG_W, 3), np.uint8)
        for _ in range(6)
    ]}
    boxes, scores, classes, valid = models.detic(frame)
    print("smoke ok", np.asarray(scores).shape, flush=True)
else:
    r = benchmarks.bench_mask_stage(models=models)
    r["metric"] = "masks_gdino_keyframes_per_sec_per_chip"
    r["detector"] = "gdino_swint_random_weights"
    r["gdino_bf16"] = bf16
    print(json.dumps(r), flush=True)
