"""Serving host for cm3d-tpu AOT artifacts: HTTP + micro-batching.

The reference has no serving story — its scripts rebuild the torch graph
from source and run offline. ``cm3d-serve`` is the online half of the
deployment path started by ``cm3d-export`` (deploy.py): it loads a
*detect* StableHLO artifact (whose parameters are runtime ARGUMENTS, so
one artifact serves every same-shape checkpoint) plus an orbax checkpoint
dir, and serves point clouds over HTTP.

TPU-native serving shape: the artifact is compiled for ONE static batch
size B (XLA static shapes), so the host runs a micro-batching dispatcher —
requests queue, a single dispatcher thread groups up to B of them within a
flush window, pads empty slots with valid=False rows, and issues ONE
device call per group. Per-slot outputs are independent (the exported
program vmaps over the batch axis), so padding slots never changes a
request's result; tests/test_serve.py pins that invariance.

Request formats (POST /v1/detect):
- ``application/json``: ``{"points": [[x, y, z, intensity], ...]}``
- anything else: the body is a ``.npy`` blob of a float32 [n, 4] array
  (``np.save`` — the fast path; no JSON float printing).
Response: ``{"boxes": [[x,y,z,w,l,h,yaw]...], "scores": [...],
"classes": [...], "n_kept": k}`` — kept detections only, ego frame.
``GET /healthz`` reports the artifact geometry and serving counters.
"""

from __future__ import annotations

import argparse
import io
import json
import queue
import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Any, Optional

import numpy as np


class RequestError(ValueError):
    """Client-side error (HTTP 400): malformed or oversized request."""


@dataclass
class _Pending:
    points: np.ndarray  # [n, 4] float32, n <= max_points
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[dict] = None
    error: Optional[BaseException] = None


class DetectServer:
    """Micro-batching executor over a detect artifact.

    Owns the single dispatcher thread that talks to the device; any number
    of request threads call :meth:`submit` concurrently. ``flush_ms`` is
    the max time the dispatcher waits to fill a batch after the first
    request of a group arrives (latency/occupancy knob).
    """

    def __init__(self, artifact_path: str | Path, params: Any,
                 batch_stats: Any = None, flush_ms: float = 5.0):
        import jax

        from cm3d_tpu.deploy import load_artifact

        self._exported = load_artifact(artifact_path)
        # Locate the batch geometry from the artifact's own avals: the
        # validity mask is the unique bool input, shaped [B, max_points].
        bool_avals = [a for a in self._exported.in_avals
                      if a.dtype == np.bool_]
        if len(bool_avals) != 1 or len(bool_avals[0].shape) != 2:
            raise ValueError(
                "not a detect artifact: expected exactly one [B, N] bool "
                f"valid-mask input, got avals {self._exported.in_avals}"
            )
        self.batch_size, self.max_points = map(int, bool_avals[0].shape)
        # Camera-fusion artifacts take 3 extra operands; serving those
        # needs per-request images, which this host does not accept.
        n_leaves = len(jax.tree.leaves((params, batch_stats or {})))
        if len(self._exported.in_avals) != n_leaves + 2:
            raise ValueError(
                "artifact expects operands beyond (params, batch_stats, "
                "points, valid) — camera-fusion artifacts are not servable "
                "by this host"
            )
        self._params = jax.device_put(params)
        self._batch_stats = jax.device_put(batch_stats or {})
        self.flush_ms = float(flush_ms)
        self.stats = {"requests": 0, "batches": 0, "slots_used": 0,
                      "last_batch_ms": 0.0}
        self._queue: queue.Queue[_Pending] = queue.Queue()
        self._closed = False
        self._thread = threading.Thread(target=self._dispatch_loop,
                                        name="cm3d-serve-dispatch",
                                        daemon=True)
        self._thread.start()

    # ---- request side -------------------------------------------------

    def validate(self, points: np.ndarray) -> np.ndarray:
        points = np.asarray(points, np.float32)
        if points.ndim != 2 or points.shape[1] != 4:
            raise RequestError(
                f"points must be [n, 4] (x, y, z, intensity); got "
                f"{points.shape}"
            )
        if len(points) > self.max_points:
            raise RequestError(
                f"{len(points)} points exceeds the artifact capacity "
                f"{self.max_points}; re-export with a larger --max_points"
            )
        return points

    def submit(self, points: np.ndarray, timeout: float = 60.0) -> dict:
        """Block until the batched device call returns this request's
        detections: dict(boxes [k,7], scores [k], classes [k])."""
        if self._closed:
            raise RuntimeError("server is closed")
        pending = _Pending(self.validate(points))
        self._queue.put(pending)
        if not pending.done.wait(timeout):
            raise TimeoutError("detect call did not return in time")
        if pending.error is not None:
            raise pending.error
        assert pending.result is not None
        return pending.result

    def close(self) -> None:
        self._closed = True
        self._queue.put(None)  # type: ignore[arg-type]  # wake the loop
        self._thread.join(timeout=10)

    # ---- device side (single thread) ----------------------------------

    def _dispatch_loop(self) -> None:
        while True:
            first = self._queue.get()
            if first is None:
                return
            group = [first]
            # fill the batch for up to flush_ms after the first arrival
            deadline = _now() + self.flush_ms / 1e3
            while len(group) < self.batch_size:
                try:
                    nxt = self._queue.get(timeout=max(0.0, deadline - _now()))
                except queue.Empty:
                    break
                if nxt is None:
                    self._run_group(group)
                    return
                group.append(nxt)
            self._run_group(group)

    def _run_group(self, group: list) -> None:
        t0 = _now()
        try:
            pts = np.zeros((self.batch_size, self.max_points, 4), np.float32)
            val = np.zeros((self.batch_size, self.max_points), bool)
            for j, pending in enumerate(group):
                n = len(pending.points)
                pts[j, :n] = pending.points
                val[j, :n] = True
            boxes, scores, classes, keep = (
                np.asarray(a) for a in self._exported.call(
                    self._params, self._batch_stats, pts, val
                )
            )
            for j, pending in enumerate(group):
                k = keep[j]
                pending.result = {
                    "boxes": boxes[j][k],
                    "scores": scores[j][k],
                    "classes": classes[j][k],
                }
        except BaseException as e:  # propagate to every waiter
            for pending in group:
                pending.error = e
        finally:
            self.stats["requests"] += len(group)
            self.stats["batches"] += 1
            self.stats["slots_used"] += len(group)
            self.stats["last_batch_ms"] = round((_now() - t0) * 1e3, 3)
            for pending in group:
                pending.done.set()


def _now() -> float:
    import time

    return time.monotonic()


# ---- HTTP layer --------------------------------------------------------


def _parse_points(body: bytes, content_type: str) -> np.ndarray:
    if content_type.startswith("application/json"):
        try:
            payload = json.loads(body)
            return np.asarray(payload["points"], np.float32)
        except (json.JSONDecodeError, KeyError, TypeError, ValueError) as e:
            raise RequestError(f"bad JSON request: {e}") from e
    try:
        return np.load(io.BytesIO(body), allow_pickle=False)
    except (ValueError, EOFError, OSError) as e:
        # np.load raises ValueError on bad magic, EOFError/OSError on
        # truncated or otherwise unreadable bodies — all client errors.
        raise RequestError(f"bad .npy request body: {e}") from e


class _Handler(BaseHTTPRequestHandler):
    server: "ServingHTTPServer"

    def _reply(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self) -> None:  # noqa: N802 (http.server API)
        if self.path != "/healthz":
            return self._reply(404, {"error": f"no route {self.path}"})
        d = self.server.detect
        self._reply(200, {
            "ok": True, "batch_size": d.batch_size,
            "max_points": d.max_points, "flush_ms": d.flush_ms,
            "stats": dict(d.stats),
        })

    def do_POST(self) -> None:  # noqa: N802
        if self.path != "/v1/detect":
            return self._reply(404, {"error": f"no route {self.path}"})
        try:
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            points = _parse_points(body, self.headers.get("Content-Type", ""))
            out = self.server.detect.submit(points)
        except RequestError as e:
            return self._reply(400, {"error": str(e)})
        except TimeoutError as e:
            return self._reply(503, {"error": str(e)})
        except Exception as e:
            # Device/dispatch failure: the client still deserves a JSON
            # error, not a dropped connection with no status line.
            return self._reply(500, {"error": f"{type(e).__name__}: {e}"})
        self._reply(200, {
            "boxes": out["boxes"].tolist(),
            "scores": out["scores"].tolist(),
            "classes": out["classes"].tolist(),
            "n_kept": int(len(out["scores"])),
        })

    def log_message(self, fmt: str, *args: Any) -> None:
        if self.server.verbose:
            super().log_message(fmt, *args)


class ServingHTTPServer(ThreadingHTTPServer):
    daemon_threads = True

    def __init__(self, address, detect: DetectServer, verbose: bool = True):
        self.detect = detect
        self.verbose = verbose
        super().__init__(address, _Handler)


def make_server(artifact: str | Path, params: Any, batch_stats: Any = None,
                host: str = "127.0.0.1", port: int = 0,
                flush_ms: float = 5.0, verbose: bool = True
                ) -> ServingHTTPServer:
    """Build the HTTP server (unstarted). ``port=0`` binds an ephemeral
    port — read it back from ``server.server_address``."""
    detect = DetectServer(artifact, params, batch_stats, flush_ms=flush_ms)
    return ServingHTTPServer((host, port), detect, verbose=verbose)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="serve a cm3d-export detect artifact over HTTP"
    )
    p.add_argument("--artifact", required=True,
                   help="StableHLO blob from cm3d-export --what detect")
    p.add_argument("--ckpt", required=True,
                   help="orbax checkpoint dir (pretrain's {out}/centerpoint)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8712)
    p.add_argument("--flush_ms", type=float, default=5.0,
                   help="max wait to fill a device batch after the first "
                   "request of a group arrives")
    args = p.parse_args(argv)

    from cm3d_tpu.models.checkpoints import load_params

    restored = load_params(args.ckpt)
    params = restored["params"] if "params" in restored else restored
    batch_stats = restored.get("batch_stats", {})
    server = make_server(args.artifact, params, batch_stats,
                         host=args.host, port=args.port,
                         flush_ms=args.flush_ms)
    host, port = server.server_address[:2]
    d = server.detect
    print(f"cm3d-serve on http://{host}:{port}  batch={d.batch_size} "
          f"max_points={d.max_points} flush_ms={d.flush_ms}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.detect.close()
        server.server_close()


if __name__ == "__main__":
    main()
