"""GDINO_SWINT on-chip crash bisection (r04: the full-geometry gdino
masks bench killed the TPU worker at its first device dispatch,
TPU_QUEUE_r04.log 12:56).

Arms (CM3D_DIAG_ARM), each meant to run in its OWN process — a worker
kill poisons everything after it in-process:

  backbone_unfused — SwinTransformer alone at 800x1216, XLA attention
  backbone_fused   — SwinTransformer alone, fused Pallas window kernel
  full_unfused     — whole GroundingDino fwd, swin fused OFF
  full_fused       — whole GroundingDino fwd, default (fused on TPU)

Run: CM3D_DIAG_ARM=backbone_unfused python -c "exec(open('scripts/diag_gdino.py').read())"
CM3D_AB_SMOKE=1 shrinks to GDINO_TEST geometry on CPU (plumbing).
"""

import dataclasses as dc
import os
import time

arm = os.environ.get("CM3D_DIAG_ARM", "backbone_unfused")
smoke = os.environ.get("CM3D_AB_SMOKE") == "1"
# batch: the masks-stage bench dispatches the 6-camera ring as ONE B=6
# call; all four B=1 arms passed on-chip (TPU_QUEUE_r04.log 13:07-13:43),
# so the kill is batch-dependent — probe with CM3D_DIAG_B=6
B = int(os.environ.get("CM3D_DIAG_B", "1"))
# CM3D_DIAG_DTYPE=bfloat16 probes the compute-dtype axis: the bf16
# fused arm at chunk 3 faulted the worker where f32 chunk 3 passed
# (TPU_QUEUE_r04.log 17:46) — the fault envelope is dtype-dependent
DTYPE = os.environ.get("CM3D_DIAG_DTYPE", "float32")

import jax  # noqa: E402

if smoke:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cm3d_tpu.models.gdino import GDINO_SWINT, GDINO_TEST  # noqa: E402

base = GDINO_TEST if smoke else GDINO_SWINT
fused = arm.endswith("fused") and not arm.endswith("unfused")
swin = dc.replace(base.swin, dtype=DTYPE,
                  fused_attn=("interpret" if smoke and fused else fused))
cfg = dc.replace(base, swin=swin, dtype=DTYPE)
h, w = cfg.img_hw
print(f"diag_gdino arm={arm} B={B} dtype={DTYPE} smoke={smoke} hw={h}x{w} "
      f"backend={jax.default_backend()}", flush=True)

rng = np.random.default_rng(0)
img = jnp.asarray(rng.normal(size=(B, h, w, 3)).astype(np.float32))

if arm.startswith("backbone"):
    from cm3d_tpu.models.swin import SwinTransformer

    model = SwinTransformer(cfg.swin)
    params = model.init(jax.random.PRNGKey(0), img)["params"]
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
    t0 = time.perf_counter()
    out = fwd(params, img)
    s = float(np.asarray(sum(jnp.sum(v) for v in jax.tree.leaves(out))))
    print(f"{arm}: OK sum={s:.4f} "
          f"({time.perf_counter() - t0:.1f}s incl compile)", flush=True)
else:
    from cm3d_tpu.models.gdino import GroundingDino

    L = cfg.max_text_len
    model = GroundingDino(cfg)
    args = (img, jnp.zeros((B, L), jnp.int32), jnp.zeros((B, L), jnp.int32),
            jnp.ones((B, L, L), bool), jnp.ones((B, L), bool))
    params = model.init(jax.random.PRNGKey(0), *(a[:1] for a in args))["params"]
    fwd = jax.jit(lambda p, *a: model.apply({"params": p}, *a))
    t0 = time.perf_counter()
    logits, boxes = fwd(params, *args)
    s = float(np.asarray(jnp.sum(boxes)))
    print(f"{arm}: OK sum={s:.4f} "
          f"({time.perf_counter() - t0:.1f}s incl compile)", flush=True)
