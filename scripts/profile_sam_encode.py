"""Profile the (unfused) SAM ViT-H encode on the axon chip and print the
top device ops from the captured xplane, via the hand proto parser
(tensorboard_plugin_profile is broken in-image; field numbers pinned in
CLAUDE.md: XSpace.plane=1 {name=2, lines=3, event_metadata=4};
line.events=4; event {metadata_id=1, duration_ps=3}).

Run: python -c "exec(open('scripts/profile_sam_encode.py').read())"
"""

import dataclasses as dc
import glob
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from cm3d_tpu.datasets.waymo.proto import _iter_fields
from cm3d_tpu.models.sam import SAM_VIT_H, Sam

LOGDIR = "/tmp/sam_encode_profile"
ITERS = 4


def sync(x):
    return float(np.asarray(jnp.sum(x.astype(jnp.float32))))


def top_ops(pb_path, iters, n=40):
    buf = open(pb_path, "rb").read()
    for fp, _, pv in _iter_fields(buf):
        if fp != 1:  # plane
            continue
        name = ""
        metas = {}
        events = []  # (metadata_id, dur_ps)
        lines = []
        for f2, _, v2 in _iter_fields(pv):
            if f2 == 2:
                name = v2.decode("utf-8", "replace")
            elif f2 == 3:
                lines.append(v2)
            elif f2 == 4:  # event_metadata map entry
                mid, mname = None, ""
                for f3, _, v3 in _iter_fields(v2):
                    if f3 == 1:
                        mid = v3
                    elif f3 == 2:  # XEventMetadata
                        for f4, _, v4 in _iter_fields(v3):
                            if f4 == 2:
                                mname = v4.decode("utf-8", "replace")
                metas[mid] = mname
        if "TPU" not in name or "pid" not in name.lower() and ":" not in name:
            pass
        for lv in lines:
            for f3, _, v3 in _iter_fields(lv):
                if f3 == 4:  # event
                    mid, dur = None, 0
                    for f4, _, v4 in _iter_fields(v3):
                        if f4 == 1:
                            mid = v4
                        elif f4 == 3:
                            dur = v4
                    events.append((mid, dur))
        if not events or "TPU" not in name:
            continue
        import re

        def norm(nm):
            # "%fusion.3335 = (bf16[16,4096]{...}, ...) fusion(...)" ->
            # "fusion (bf16[16,4096],bf16[16,4096,4096])" — opcode + output
            # shapes with layout annotations stripped, numeric ids dropped.
            m = re.match(r"%([a-z-]+)[.\d]* = (.*)", nm)
            if not m:
                return nm
            op, rhs = m.groups()
            rhs = rhs.split(f" {op}(")[0] if f" {op}(" in rhs else rhs
            rhs = re.sub(r"\{[^}]*\}", "", rhs)
            return f"{op} {rhs[:90]}"

        agg = {}
        jit_total = 0
        for mid, dur in events:
            nm = metas.get(mid, str(mid))
            if nm.startswith("jit"):
                jit_total += dur
                continue
            a = agg.setdefault(norm(nm), [0, 0])
            a[0] += dur
            a[1] += 1
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
        total = sum(v[0] for _, v in rows)
        print(f"\n=== plane '{name}': HLO sum {total/1e9/iters:.2f} "
              f"ms/iter (outer jit {jit_total/1e9/iters:.2f}) ===")
        for nm, (dur, cnt) in rows[:n]:
            print(f"{dur/total*100:5.1f}%  {dur/1e9/iters:7.3f} ms  "
                  f"x{cnt:<5d} {nm[:120]}")


def main():
    cfg = dc.replace(SAM_VIT_H, dtype="bfloat16")
    model = Sam(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((1, 1024, 1024, 3)).astype(np.float32))
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((64, 64, 3)), jnp.zeros((1, 4)))
    )["params"]
    params = jax.tree.map(
        lambda p: jnp.asarray(
            np.random.default_rng(1).standard_normal(p.shape) * 0.02,
            p.dtype),
        params)
    enc = jax.jit(lambda p, xi: model.apply(
        {"params": p}, xi, method=model.encode_image))
    for _ in range(2):
        sync(enc(params, x))

    shutil.rmtree(LOGDIR, ignore_errors=True)
    jax.profiler.start_trace(LOGDIR)
    out = None
    for _ in range(ITERS):
        out = enc(params, x)
    sync(out)
    jax.profiler.stop_trace()

    for pb in glob.glob(LOGDIR + "/**/*.xplane.pb", recursive=True):
        top_ops(pb, ITERS)


main()
