"""Zero-dependency HTTP front door for the serving engine.

The reference has no serving surface at all (SURVEY §5) — its only
inference helper is ``RendererTrainer.predict``
(``src/train/renderer_trainer.py:431-445``), which needs a fully
constructed trainer just to classify clouds, and only from Python. The
rebuild's production path is :class:`pointvit_tpu.serve.InferenceSession`
(bucket-compiled, mesh-DP) behind :class:`pointvit_tpu.serve.MicroBatcher`
(request coalescing); this module puts an HTTP/1.1 API in front of both
using only the standard library, so non-Python clients can classify point
clouds against a TPU without shipping any model code.

The concurrency model is deliberately simple and TPU-correct:
``ThreadingHTTPServer`` gives every request its own thread, and each
single-cloud request blocks in ``MicroBatcher.submit`` — so concurrent
HTTP callers coalesce into ONE padded device dispatch per batcher tick,
which is exactly how small online requests reach TPU-efficient batch
sizes (measured ladder in DESIGN.md: conc-64 → 559 clouds/s online).

Endpoints
---------
- ``GET  /v1/health`` → ``{"status": "ok", "buckets": [...], ...}``
- ``POST /v1/classify`` — ONE cloud. Body: JSON ``{"points": [[x,y,z(,h)],
  ...]}`` or a little-endian ``.npy`` array (``Content-Type:
  application/x-npy`` or ``application/octet-stream``), shape (N, C).
  → ``{"class_id": k, "logits": [...]}``. Rides the micro-batcher.
- ``POST /v1/classify_batch`` — n clouds, shape (n, N, C), same two body
  encodings. → ``{"class_ids": [...], "logits": [[...], ...]}``. Goes
  straight to the session's padded bucket ladder (it is already a batch).

Both POST endpoints honour ``Accept: application/x-npy`` (or
octet-stream) by responding with a binary float32 ``.npy`` logits array
instead of JSON (``/v1/classify`` adds an ``X-Class-Id`` header) —
measured on device, float64-JSON-text logits dominate the batch
endpoint's round-trip, so throughput clients should use binary both ways.

Malformed bodies get ``400 {"error": ...}``; unknown routes ``404``;
oversized bodies ``413``; server-side faults ``500``.
"""

from __future__ import annotations

import io
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from pointvit_tpu.serve import InferenceSession, MicroBatcher

__all__ = ["ServingServer", "make_server"]


class _BadRequest(ValueError):
    """Client error → HTTP 400 with the message in the JSON body."""


class _PayloadTooLarge(ValueError):
    """Body above the configured cap → HTTP 413 (connection closed: the
    oversized body is never read, so keep-alive reuse would desync)."""


def _decode_clouds(body: bytes, content_type: str, *, ndim: int) -> np.ndarray:
    """Request body → float32 array of exactly `ndim` dimensions."""
    if not body:
        raise _BadRequest("empty request body")
    if "x-npy" in content_type or "octet-stream" in content_type:
        try:
            arr = np.load(io.BytesIO(body), allow_pickle=False)
        except Exception as e:
            raise _BadRequest(f"invalid .npy body: {e}") from None
    else:
        try:
            obj = json.loads(body)
        except json.JSONDecodeError as e:
            raise _BadRequest(f"invalid JSON body: {e}") from None
        if not isinstance(obj, dict) or "points" not in obj:
            raise _BadRequest('JSON body must be an object with a "points" key')
        try:
            arr = np.asarray(obj["points"], dtype=np.float32)
        except (ValueError, TypeError) as e:
            raise _BadRequest(f'"points" is not a numeric array: {e}') from None
    if arr.ndim != ndim:
        raise _BadRequest(
            f"expected a {ndim}-d array "
            f"({'(N, C) one cloud' if ndim == 2 else '(n, N, C) clouds'}), "
            f"got shape {tuple(arr.shape)}"
        )
    if arr.size == 0:
        raise _BadRequest("empty point array")
    return np.ascontiguousarray(arr, dtype=np.float32)


class _Handler(BaseHTTPRequestHandler):
    server_version = "pointvit-tpu"
    protocol_version = "HTTP/1.1"

    # server attribute is the ServingServer below
    def log_message(self, fmt, *args):  # noqa: D102 — quiet by default
        if getattr(self.server, "verbose", False):
            super().log_message(fmt, *args)

    def _wants_npy(self) -> bool:
        """Content negotiation: ``Accept: application/x-npy`` (or
        octet-stream) asks for binary little-endian ``.npy`` responses —
        measured on device (r5): float64-JSON-text logits dominate the
        batch endpoint's round-trip, and binary responses remove that
        entirely for throughput clients."""
        accept = self.headers.get("Accept", "")
        return "x-npy" in accept or "octet-stream" in accept

    def _send_npy(self, arr: np.ndarray, headers: dict[str, str]) -> None:
        buf = io.BytesIO()
        np.save(buf, np.ascontiguousarray(arr, dtype=np.float32))
        body = buf.getvalue()
        self.send_response(200)
        self.send_header("Content-Type", "application/x-npy")
        self.send_header("Content-Length", str(len(body)))
        for k, v in headers.items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def _send_json(self, code: int, obj: dict, *, close: bool = False) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        if close:
            self.send_header("Connection", "close")
            self.close_connection = True
        self.end_headers()
        self.wfile.write(body)

    def _read_body(self) -> bytes:
        length = int(self.headers.get("Content-Length") or 0)
        cap = getattr(self.server, "max_body_bytes", None)
        if cap is not None and length > cap:
            raise _PayloadTooLarge(
                f"request body {length} bytes exceeds the {cap}-byte cap"
            )
        return self.rfile.read(length) if length > 0 else b""

    def do_GET(self) -> None:  # noqa: N802 — http.server contract
        if self.path == "/v1/health":
            s: InferenceSession = self.server.session
            self._send_json(200, {
                "status": "ok",
                "buckets": list(s.buckets),
                "mesh": list(s.mesh.devices.shape) if s.mesh is not None else None,
                "model": type(s.model).__name__ if s.model is not None else "exported",
            })
        else:
            self._send_json(404, {"error": f"unknown route {self.path}"})

    def do_POST(self) -> None:  # noqa: N802 — http.server contract
        try:
            # Drain the body first, whatever the route: with HTTP/1.1
            # keep-alive, unread body bytes would be parsed as the next
            # request on a persistent connection (advisor r4).
            body = self._read_body()
            if self.path == "/v1/classify":
                cloud = _decode_clouds(
                    body, self.headers.get("Content-Type", ""), ndim=2
                )
                logits = self.server.batcher.submit(cloud)
                if self._wants_npy():
                    self._send_npy(np.asarray(logits), {
                        "X-Class-Id": str(int(np.argmax(logits))),
                    })
                else:
                    self._send_json(200, {
                        "class_id": int(np.argmax(logits)),
                        "logits": np.asarray(logits, dtype=np.float64).tolist(),
                    })
            elif self.path == "/v1/classify_batch":
                clouds = _decode_clouds(
                    body, self.headers.get("Content-Type", ""), ndim=3
                )
                logits = self.server.session.predict_logits(clouds)
                if self._wants_npy():
                    self._send_npy(np.asarray(logits), {})
                else:
                    self._send_json(200, {
                        "class_ids": np.argmax(logits, axis=-1).astype(int).tolist(),
                        "logits": np.asarray(logits, dtype=np.float64).tolist(),
                    })
            else:
                self._send_json(404, {"error": f"unknown route {self.path}"})
        except _PayloadTooLarge as e:
            # the body was never read — close so keep-alive can't desync
            self._send_json(413, {"error": str(e)}, close=True)
        except _BadRequest as e:
            self._send_json(400, {"error": str(e)})
        except Exception as e:  # genuine server-side fault, not client error
            self._send_json(500, {"error": f"{type(e).__name__}: {e}"})


class ServingServer(ThreadingHTTPServer):
    """ThreadingHTTPServer owning one session + one micro-batcher.

    ``server_close`` drains and closes the batcher, so ``with`` /
    try-finally shutdown never leaves callers blocked on a dead queue.
    """

    daemon_threads = True

    def __init__(
        self,
        addr: tuple[str, int],
        session: InferenceSession,
        *,
        max_batch: int = 256,
        max_delay_ms: float = 5.0,
        max_body_bytes: int = 64 * 1024 * 1024,
        verbose: bool = False,
    ) -> None:
        self.session = session
        self.max_body_bytes = int(max_body_bytes)
        self.verbose = verbose
        self.batcher = MicroBatcher(
            session, max_batch=max_batch, max_delay_ms=max_delay_ms
        )
        super().__init__(addr, _Handler)

    def server_close(self) -> None:
        super().server_close()
        self.batcher.close()


def make_server(
    session: InferenceSession,
    *,
    host: str = "127.0.0.1",
    port: int = 8000,
    max_batch: int = 256,
    max_delay_ms: float = 5.0,
    max_body_bytes: int = 64 * 1024 * 1024,
    verbose: bool = False,
) -> ServingServer:
    """Bind a :class:`ServingServer`; ``port=0`` picks a free port
    (read it back from ``server.server_address[1]``). Call
    ``serve_forever()`` to run and ``shutdown()`` + ``server_close()``
    to stop. Bodies above ``max_body_bytes`` are refused with 413 before
    any allocation."""
    return ServingServer(
        (host, port), session,
        max_batch=max_batch, max_delay_ms=max_delay_ms,
        max_body_bytes=max_body_bytes, verbose=verbose,
    )
