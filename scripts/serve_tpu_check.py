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

        # ---- lift artifact (the flagship workload as a service) -------
        import dataclasses as dc

        from cm3d_tpu.config import LiftStageConfig
        from cm3d_tpu.datasets.synthetic import SyntheticConfig, make_keyframe
        from cm3d_tpu.datasets.types import stack_keyframes
        from cm3d_tpu.deploy import export_lift_step
        from cm3d_tpu.parallel import make_keyframe_step_fn
        from cm3d_tpu.serve import _keyframe_fields, make_lift_server

        if SMOKE:
            lift_cfg = dc.replace(
                LiftStageConfig(), max_points=2048, max_masks=16,
                max_points_per_mask=256, max_points_per_camera=1024,
                max_points_in_masks=512, max_lane_points=256,
            )
            # frame geometry (camera ring, mask canvas) must match
            # export_lift_step's aval frame, which is built from the
            # DEFAULT SyntheticConfig — only the lift capacities shrink
            syn = SyntheticConfig()
        else:
            lift_cfg, syn = LiftStageConfig(), SyntheticConfig()
        lift_batch = 2 if SMOKE else 4

        t0 = time.monotonic()
        # batch BUCKETS {1, lift_batch}: singleton requests ride the
        # batch-1 artifact (no padded-batch upload — the measured
        # latency dominator), concurrent groups the batch-N one
        lpath1 = f"{tmp}/lift_b1.stablehlo"
        lpath = f"{tmp}/lift.stablehlo"
        save_artifact(export_lift_step(lift_cfg, batch_size=1), lpath1)
        save_artifact(export_lift_step(lift_cfg, batch_size=lift_batch),
                      lpath)
        lift_export_s = time.monotonic() - t0

        lserver = make_lift_server([lpath1, lpath], port=0, flush_ms=2.0,
                                   verbose=False)
        threading.Thread(target=lserver.serve_forever, daemon=True).start()
        lurl = "http://127.0.0.1:%d" % lserver.server_address[1]

        rng2 = np.random.default_rng(1)
        frames = [make_keyframe(syn, lift_cfg, rng2)
                  for _ in range(lift_batch)]
        kb = stack_keyframes(frames)
        all_fields = _keyframe_fields(kb.frames)

        def frame_npz(i):
            return {k: np.asarray(v)[i] for k, v in all_fields.items()}

        wire_bytes = {}

        def post_lift(fields, compress=False, gzip_level=None):
            import gzip as _gzip

            buf = io.BytesIO()
            (np.savez_compressed if compress else np.savez)(buf, **fields)
            body = buf.getvalue()
            headers = {"Content-Type": "application/octet-stream"}
            key = "compressed" if compress else "plain"
            if gzip_level is not None:
                body = _gzip.compress(body, compresslevel=gzip_level)
                headers["Content-Encoding"] = "gzip"
                key = f"gzip{gzip_level}"
            wire_bytes[key] = len(body)
            req = urllib.request.Request(
                lurl + "/v1/lift", data=body, headers=headers,
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                return json.loads(r.read())

        lresp = post_lift(frame_npz(0))  # compile/warmup

        # in-process oracle on the SAME device batch the server built:
        # frame 0 in slot 0, zero padding elsewhere
        def zero_tail(x):
            x = np.asarray(x)
            out = np.zeros_like(x)
            out[0] = x[0]
            return out

        step = jax.jit(make_keyframe_step_fn(lift_cfg))
        lift_out, box_out = step(jax.tree.map(zero_tail, kb.frames))
        keep0 = np.asarray(box_out.keep)[0]
        want = np.concatenate(
            [np.asarray(box_out.centers)[0][keep0],
             np.asarray(box_out.sizes)[0][keep0],
             np.asarray(box_out.yaws)[0][keep0][:, None]], axis=1,
        )
        got_l = np.asarray(lresp["boxes"], np.float32).reshape(-1, 7)
        np.testing.assert_array_equal(got_l, want.astype(np.float32))
        assert lresp["n_masks_with_points"] == int(
            np.asarray(lift_out.has_points)[0].sum()
        )

        # Three wire arms — plain npz / savez_compressed (zlib-6) /
        # transport gzip level 1 (Content-Encoding) — INTERLEAVED per
        # repetition so tunnel drift (minutes-scale, +-30%+) hits every
        # arm equally instead of poisoning sequential blocks.
        lresp_c = post_lift(frame_npz(0), compress=True)
        assert lresp_c == post_lift(frame_npz(0)), "compressed wire parity"
        assert post_lift(frame_npz(0), gzip_level=1) == lresp_c, \
            "gzip wire parity"
        arms = {"plain": dict(), "compressed": dict(compress=True),
                "gzip1": dict(gzip_level=1)}
        lat = {k: [] for k in arms}
        for _ in range(reps):
            for name, kw in arms.items():
                t = time.monotonic()
                post_lift(frame_npz(0), **kw)
                lat[name].append((time.monotonic() - t) * 1e3)
        lp50 = float(np.percentile(lat["plain"], 50))
        lp90 = float(np.percentile(lat["plain"], 90))
        lcp50 = float(np.percentile(lat["compressed"], 50))
        lcp90 = float(np.percentile(lat["compressed"], 90))
        lgp50 = float(np.percentile(lat["gzip1"], 50))
        lgp90 = float(np.percentile(lat["gzip1"], 90))

        lb0 = lserver.backend.stats["batches"]
        threads = [
            threading.Thread(target=post_lift, args=(frame_npz(i),))
            for i in range(lift_batch)
        ]
        t = time.monotonic()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        lgroup_ms = (time.monotonic() - t) * 1e3
        lbatches_used = lserver.backend.stats["batches"] - lb0

        lserver.shutdown()
        lserver.backend.close()
        lserver.server_close()

    print(json.dumps({
        "metric": "serve_detect_latency_ms_p50",
        "value": round(p50, 2), "unit": "ms/request (HTTP round trip)",
        "vs_baseline": None, "p90_ms": round(p90, 2),
        "batch": batch, "max_points": max_points,
        "concurrent_batch_ms": round(group_ms, 2),
        "concurrent_device_batches": int(batches_used),
        "export_s": round(export_s, 1), "backend": backend,
        "parity": "exact", "smoke": SMOKE,
        "lift": {
            "p50_ms": round(lp50, 2), "p90_ms": round(lp90, 2),
            "compressed_p50_ms": round(lcp50, 2),
            "compressed_p90_ms": round(lcp90, 2),
            "gzip1_p50_ms": round(lgp50, 2),
            "gzip1_p90_ms": round(lgp90, 2),
            "wire_bytes": wire_bytes,
            "batch": lift_batch,
            "concurrent_batch_ms": round(lgroup_ms, 2),
            "concurrent_device_batches": int(lbatches_used),
            "export_s": round(lift_export_s, 1),
            "n_boxes": int(lresp["n_kept"]),
            "parity": "exact",
        },
    }))


if __name__ == "__main__":
    main()
