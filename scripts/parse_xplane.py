"""Parse captured xplane profiles -> top-op table.

Run: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python -c \
    "exec(open('scripts/parse_xplane.py').read())" [dirs via PROF_DIRS env]
"""

import glob
import json
import os

from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd


def show(logdir, iters=3):
    xplanes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not xplanes:
        print("no xplane in", logdir)
        return
    data, _ = rtd.xspace_to_tool_data(xplanes, "op_profile", {})
    d = json.loads(data)
    rows = []

    def walk(node, path):
        ch = node.get("children", [])
        m = node.get("metrics", {})
        if not ch and m:
            rows.append(
                (m.get("rawTime", 0.0), node.get("name", "?"), path)
            )
        for c in ch:
            walk(c, path + "/" + node.get("name", ""))

    root = d.get("byProgram", d)
    walk(root, "")
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"\n=== {logdir}: device total {total/1e12/iters*1000:.1f} ms/iter "
          f"(raw units) ===")
    for t, name, path in rows[:30]:
        print(f"{t/total*100:5.1f}%  {name[:100]}")


for d in os.environ.get("PROF_DIRS", "/tmp/prof_sam_enc_bf16").split(","):
    show(d)
