"""Swin-camera fusion-train crash bisection (r03 queue: fusion_swin kills
the TPU worker; the conv-camera step is fine at 30.95 ms). Run from repo
root: `CM3D_DIAG_ARM=<arm> python -c "exec(open('scripts/diag_swin.py').read())"`.

Context: the UNFUSED Swin window-attention path has never executed on the
axon TPU — Detic inference auto-selects the fused Pallas kernel there —
so the crash may be anywhere in the unfused forward OR its backward.
Arms (each in its own process; a worker crash kills the client):

  trunk_fwd   — CameraTrunk(swin_t) forward only, bench shapes [48,144,256,3]
  trunk_bwd   — grad(sum(trunk)) — unfused backward
  fused_fwd   — same forward with fused_attn on (Pallas kernel at Swin-T
                lane widths: also validates C=96 tiles on-chip)
  fused_step  — FULL fusion train step with camera_fused=True (fused fwd +
                custom_vjp XLA-recompute bwd)
  step        — full train step, unfused (the known crash; confirm only)

CM3D_AB_SMOKE=1 runs tiny shapes on CPU to validate plumbing.
"""

import os

arm = os.environ.get("CM3D_DIAG_ARM", "trunk_fwd")
smoke = os.environ.get("CM3D_AB_SMOKE") == "1"

import dataclasses as dc  # noqa: E402

import jax  # noqa: E402

if smoke:
    # the env var alone does not stop the axon plugin from registering;
    # the config update must land before backend init (verify skill note)
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cm3d_tpu.train.bevfusion import BevFusionConfig, CameraTrunk  # noqa: E402

print(f"diag_swin arm={arm} smoke={smoke} backend={jax.default_backend()}")

if smoke:
    bsz, ih, iw = 2, 48, 64
else:
    bsz, ih, iw = 48, 144, 256  # bench_fusion_train's flattened B*C batch

interp = "interpret" if smoke else None  # None = backend auto (on for TPU)

if arm in ("trunk_fwd", "trunk_bwd", "fused_fwd"):
    # camera_fused now defaults True — trunk arms pin it OFF so they
    # keep exercising the unfused XLA path they were built to bisect
    cfg = BevFusionConfig(camera_backbone="swin_t", cam_channels=8,
                          depth_bins=8, camera_fused=arm == "fused_fwd")
    if arm == "fused_fwd" and smoke:
        cfg = dc.replace(cfg, swin=dc.replace(cfg.swin, fused_attn=interp))
    imgs = jnp.asarray(
        np.random.default_rng(0).random((bsz, ih, iw, 3), np.float32))
    trunk = CameraTrunk(cfg)
    v = trunk.init(jax.random.PRNGKey(0), imgs)

    if arm == "trunk_bwd":
        @jax.jit
        def run(v, imgs):
            def loss(v):
                f, d = trunk.apply(v, imgs)
                return jnp.sum(f * f) + jnp.sum(d * d)
            return jax.grad(loss)(v)

        out = run(v, imgs)
        s = sum(float(np.asarray(jnp.sum(jnp.abs(g))))
                for g in jax.tree_util.tree_leaves(out))
    else:
        @jax.jit
        def run(v, imgs):
            f, d = trunk.apply(v, imgs)
            return jnp.sum(f) + jnp.sum(d)

        s = float(np.asarray(run(v, imgs)))
    print(f"{arm} ok: {s:.4f}")
elif arm in ("fused_step", "step"):
    from cm3d_tpu import benchmarks

    if smoke:
        print("step arms have no CPU smoke (production bench only); "
              "plumbing-checking the kwargs instead")
        import inspect

        sig = inspect.signature(benchmarks.bench_fusion_train)
        assert "camera_fused" in sig.parameters
        print("smoke ok")
    else:
        print(benchmarks.bench_fusion_train(
            camera_backbone="swin_t",
            camera_fused=arm == "fused_step",
        ))
else:
    raise SystemExit(f"unknown CM3D_DIAG_ARM={arm}")
