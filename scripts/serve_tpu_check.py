"""On-chip validation of the cm3d-export -> cm3d-serve path.

Exports a production-geometry detect artifact (CenterPoint head, params as
runtime arguments), serves it via serve.make_server on localhost, and
drives real HTTP requests through the micro-batching dispatcher:

- parity: a served request matches the in-process jit oracle exactly;
- latency: p50/p90 single-request round trip (HTTP + pad + device call);
- batched throughput: batch_size concurrent requests grouped into one
  device call.

Prints ONE JSON line. CM3D_AB_SMOKE=1 shrinks geometry and forces CPU so
queue scripts can be validated without the tunnel (house rule: smoke every
queue script before queuing).
"""

import io
import json
import os
import threading
import time
import urllib.request

import numpy as np

SMOKE = os.environ.get("CM3D_AB_SMOKE") == "1"


def main():
    if SMOKE:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from cm3d_tpu.config import class_arrays
    from cm3d_tpu.deploy import export_detect_step, save_artifact
    from cm3d_tpu.pipelines.detect import make_detect_fn
    from cm3d_tpu.serve import make_server
    from cm3d_tpu.train import CenterPointConfig, PillarConfig
    from cm3d_tpu.train.centerpoint import CenterPointDetector

    backend = jax.default_backend()
    batch = 2 if SMOKE else 4
    max_points = 256 if SMOKE else 32768
    top_k = 8 if SMOKE else 128
    reps = 3 if SMOKE else 50

    import tempfile

    t0 = time.monotonic()
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/detect.stablehlo"
        save_artifact(
            export_detect_step(batch_size=batch, max_points=max_points,
                               top_k=top_k, score_thresh=0.0),
            path,
        )
        export_s = time.monotonic() - t0

        pillar_cfg = PillarConfig()
        h, w = pillar_cfg.grid_hw
        model = CenterPointDetector(CenterPointConfig())
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, h, w, pillar_cfg.num_features)), train=True,
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        _, _, radii = class_arrays()
        oracle = make_detect_fn(model, pillar_cfg,
                                radii[: model.cfg.num_classes],
                                top_k=top_k, score_thresh=0.0)

        server = make_server(path, params, batch_stats, port=0,
                             flush_ms=2.0, verbose=False)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        url = "http://127.0.0.1:%d" % server.server_address[1]

        rng = np.random.default_rng(0)

        def cloud(n):
            pts = np.zeros((n, 4), np.float32)
            pts[:, :3] = rng.uniform(-40, 40, (n, 3))
            pts[:, 3] = rng.uniform(0, 1, n)
            return pts

        def post(points):
            buf = io.BytesIO()
            np.save(buf, points)
            req = urllib.request.Request(
                url + "/v1/detect", data=buf.getvalue(),
                headers={"Content-Type": "application/octet-stream"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                return json.loads(r.read())

        # parity vs the in-process jit (slot 0, padded batch)
        c = cloud(max_points // 2)
        resp = post(c)  # also the compile/warmup call
        pts = np.zeros((batch, max_points, 4), np.float32)
        val = np.zeros((batch, max_points), bool)
        pts[0, : len(c)] = c
        val[0, : len(c)] = True
        boxes, scores, classes, keep = (
            np.asarray(a)
            for a in oracle(params, batch_stats, jnp.asarray(pts),
                            jnp.asarray(val))
        )
        k = keep[0]
        got = np.asarray(resp["boxes"], np.float32).reshape(-1, 7)
        np.testing.assert_array_equal(got, boxes[0][k])
        np.testing.assert_array_equal(
            np.asarray(resp["scores"], np.float32), scores[0][k])

        # single-request latency
        lat = []
        for _ in range(reps):
            t = time.monotonic()
            post(c)
            lat.append((time.monotonic() - t) * 1e3)
        p50 = float(np.percentile(lat, 50))
        p90 = float(np.percentile(lat, 90))

        # full-batch concurrent throughput (one device call per group)
        b0 = server.detect.stats["batches"]
        threads = [threading.Thread(target=post, args=(cloud(max_points // 2),))
                   for _ in range(batch)]
        t = time.monotonic()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        group_ms = (time.monotonic() - t) * 1e3
        batches_used = server.detect.stats["batches"] - b0

        server.shutdown()
        server.detect.close()
        server.server_close()

    print(json.dumps({
        "metric": "serve_detect_latency_ms_p50",
        "value": round(p50, 2), "unit": "ms/request (HTTP round trip)",
        "vs_baseline": None, "p90_ms": round(p90, 2),
        "batch": batch, "max_points": max_points,
        "concurrent_batch_ms": round(group_ms, 2),
        "concurrent_device_batches": int(batches_used),
        "export_s": round(export_s, 1), "backend": backend,
        "parity": "exact", "smoke": SMOKE,
    }))


if __name__ == "__main__":
    main()
