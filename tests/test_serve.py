"""Serving host (serve.py): micro-batching over the AOT detect artifact.

Pins the contract the module documents: grouped requests produce ONE
device call, per-slot outputs are independent of what shares the batch
(padding invariance), both wire formats work, and client errors are 400s.
"""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def served():
    """One tiny detect artifact + in-process oracle + running HTTP server."""
    import jax
    import jax.numpy as jnp

    from cm3d_tpu.config import class_arrays
    from cm3d_tpu.deploy import export_detect_step, save_artifact
    from cm3d_tpu.pipelines.detect import make_detect_fn
    from cm3d_tpu.serve import make_server
    from cm3d_tpu.train import CenterPointConfig, PillarConfig
    from cm3d_tpu.train.centerpoint import CenterPointDetector

    import tempfile

    max_points, batch, top_k = 256, 2, 8
    tmp = tempfile.TemporaryDirectory()
    path = f"{tmp.name}/detect_b2.stablehlo"
    # score_thresh=0 so the random-init model keeps real detections
    save_artifact(
        export_detect_step(batch_size=batch, max_points=max_points,
                           top_k=top_k, score_thresh=0.0),
        path,
    )

    # identical params in-process (same seed as the exporter)
    pillar_cfg = PillarConfig()
    h, w = pillar_cfg.grid_hw
    model = CenterPointDetector(CenterPointConfig())
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, h, w, pillar_cfg.num_features)), train=True,
    )
    _, _, radii = class_arrays()
    oracle = make_detect_fn(model, pillar_cfg,
                            radii[: model.cfg.num_classes], top_k=top_k,
                            score_thresh=0.0)

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    server = make_server(path, params, batch_stats, port=0,
                         flush_ms=1000.0, verbose=False)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = "http://127.0.0.1:%d" % server.server_address[1]

    def oracle_single(points):
        """Direct jit call with the cloud alone in slot 0 — the reference
        result a served request must match regardless of batching."""
        pts = np.zeros((batch, max_points, 4), np.float32)
        val = np.zeros((batch, max_points), bool)
        pts[0, : len(points)] = points
        val[0, : len(points)] = True
        boxes, scores, classes, keep = (
            np.asarray(a) for a in oracle(params, batch_stats,
                                          jnp.asarray(pts), jnp.asarray(val))
        )
        k = keep[0]
        return boxes[0][k], scores[0][k], classes[0][k]

    yield {"server": server, "url": url, "oracle_single": oracle_single,
           "max_points": max_points}

    server.shutdown()
    server.detect.close()
    server.server_close()
    tmp.cleanup()


def _cloud(seed, n=200):
    rng = np.random.default_rng(seed)
    pts = np.zeros((n, 4), np.float32)
    pts[:, :3] = rng.uniform(-40, 40, (n, 3))
    pts[:, 3] = rng.uniform(0, 1, n)
    return pts


def _post(url, body, content_type):
    req = urllib.request.Request(
        url + "/v1/detect", data=body,
        headers={"Content-Type": content_type},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def _post_json(url, points):
    return _post(url, json.dumps({"points": points.tolist()}).encode(),
                 "application/json")


def _post_npy(url, points):
    buf = io.BytesIO()
    np.save(buf, points)
    return _post(url, buf.getvalue(), "application/octet-stream")


def _check(resp, want):
    boxes, scores, classes = want
    assert resp["n_kept"] == len(scores)
    # JSON empty lists lose the trailing box axis; reshape before comparing.
    got_boxes = np.asarray(resp["boxes"], np.float32).reshape(-1, 7)
    np.testing.assert_array_equal(got_boxes, boxes)
    np.testing.assert_array_equal(np.asarray(resp["scores"], np.float32),
                                  scores)
    np.testing.assert_array_equal(np.asarray(resp["classes"]), classes)


def test_concurrent_requests_share_one_device_call(served):
    """Two concurrent requests (one JSON, one .npy) group into a single
    batched call, and each result matches its solo-oracle exactly."""
    stats0 = dict(served["server"].detect.stats)
    clouds = [_cloud(1), _cloud(2)]
    results = [None, None]

    def call(i, post):
        results[i] = post(served["url"], clouds[i])

    threads = [threading.Thread(target=call, args=(0, _post_json)),
               threading.Thread(target=call, args=(1, _post_npy))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    stats = served["server"].detect.stats
    assert stats["requests"] - stats0["requests"] == 2
    assert stats["batches"] - stats0["batches"] == 1  # micro-batched
    for cloud, resp in zip(clouds, results):
        _check(resp, served["oracle_single"](cloud))
    # the run produced real detections, not empty keeps
    assert sum(r["n_kept"] for r in results) > 0


def test_single_request_pads_without_changing_result(served):
    cloud = _cloud(3)
    resp = _post_json(served["url"], cloud)
    _check(resp, served["oracle_single"](cloud))


def test_healthz_reports_geometry(served):
    with urllib.request.urlopen(served["url"] + "/healthz", timeout=30) as r:
        h = json.loads(r.read())
    assert h["ok"] and h["batch_size"] == 2
    assert h["max_points"] == served["max_points"]
    assert h["stats"]["batches"] >= 1


@pytest.mark.parametrize("payload, ctype", [
    (b'{"points": "nope"}', "application/json"),
    (b"not npy", "application/octet-stream"),
])
def test_malformed_requests_are_400(served, payload, ctype):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(served["url"], payload, ctype)
    assert e.value.code == 400


def test_oversized_and_misshapen_clouds_are_400(served):
    too_many = np.zeros((served["max_points"] + 1, 4), np.float32)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post_json(served["url"], too_many)
    assert e.value.code == 400
    assert "capacity" in json.loads(e.value.read())["error"]

    with pytest.raises(urllib.error.HTTPError) as e:
        _post_json(served["url"], np.zeros((8, 3), np.float32))
    assert e.value.code == 400


def test_truncated_npy_body_is_400(served):
    buf = io.BytesIO()
    np.save(buf, _cloud(4))
    body = buf.getvalue()[:20]  # valid magic, cut mid-header
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(served["url"], body, "application/octet-stream")
    assert e.value.code == 400


def test_dispatch_failure_is_500(served):
    """A server-side failure must come back as a JSON 500, not a dropped
    connection with no status line."""
    detect = served["server"].detect
    orig = detect.submit

    def boom(points, timeout=60.0):
        raise RuntimeError("device fell over")

    detect.submit = boom
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_json(served["url"], _cloud(5))
        assert e.value.code == 500
        assert "device fell over" in json.loads(e.value.read())["error"]
    finally:
        detect.submit = orig


def test_unknown_route_is_404(served):
    req = urllib.request.Request(served["url"] + "/v1/nope", data=b"{}")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 404
