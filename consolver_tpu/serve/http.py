"""Stdlib HTTP front-end for :class:`~consolver_tpu.serve.InferenceEngine`.

Endpoints
---------
``GET /healthz``          liveness probe -> ``{"ok": true}``
``GET /v1/stats``         engine counters (batches, occupancy, errors)
``POST /v1/generate``     JSON body ``{"prompt", "seed", "num_inference_steps",
                          "guidance_scale", "solver"}`` -> JSON with a
                          base64 PNG (``image_png_b64``) + timing.

A ``ThreadingHTTPServer`` handles sockets; every handler thread blocks on
the engine's Future, so concurrent HTTP requests coalesce into one compiled
TPU batch — the whole point of the engine.  The reference has no serving
layer at all (its inference surface is gen_ppo.py's script-level thread
pool); this is deployment surface beyond parity.
"""

from __future__ import annotations

import base64
import io
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from consolver_tpu.serve.engine import GenerationRequest, InferenceEngine

_REQUEST_FIELDS = {
    "prompt": str,
    "seed": int,
    "num_inference_steps": int,
    "guidance_scale": float,
    "solver": str,
}


def _png_b64(image) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(image).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


class ServeHandler(BaseHTTPRequestHandler):
    server: "ServeServer"

    # silence the default per-request stderr log line
    def log_message(self, fmt, *args):  # noqa: A003 - stdlib signature
        pass

    def _reply(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 - stdlib name
        if self.path == "/healthz":
            self._reply(200, {"ok": True})
        elif self.path == "/v1/stats":
            self._reply(200, self.server.engine.stats())
        else:
            self._reply(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):  # noqa: N802 - stdlib name
        if self.path != "/v1/generate":
            self._reply(404, {"error": f"unknown path {self.path}"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(length) or b"{}")
            if "prompt" not in payload:
                raise ValueError("missing required field 'prompt'")
            kwargs = {}
            for name, cast in _REQUEST_FIELDS.items():
                if name in payload:
                    kwargs[name] = cast(payload[name])
            request = GenerationRequest(**kwargs)
        except (ValueError, TypeError, json.JSONDecodeError) as exc:
            self._reply(400, {"error": str(exc)})
            return
        t0 = time.monotonic()
        try:
            image = self.server.engine.generate(
                request, timeout=self.server.request_timeout
            )
        except Exception as exc:  # engine/solver error -> 500 with message
            self._reply(500, {"error": f"{type(exc).__name__}: {exc}"})
            return
        self._reply(
            200,
            {
                "image_png_b64": _png_b64(image),
                "height": int(image.shape[0]),
                "width": int(image.shape[1]),
                "seed": request.seed,
                "latency_ms": round((time.monotonic() - t0) * 1e3, 1),
            },
        )


class ServeServer(ThreadingHTTPServer):
    daemon_threads = True

    def __init__(self, address, engine: InferenceEngine,
                 request_timeout: float = 600.0):
        super().__init__(address, ServeHandler)
        self.engine = engine
        self.request_timeout = request_timeout


def make_server(
    engine: InferenceEngine,
    host: str = "127.0.0.1",
    port: int = 8000,
    request_timeout: float = 600.0,
) -> ServeServer:
    """Bind (``port=0`` picks a free one; read ``server.server_address``)."""
    return ServeServer((host, port), engine, request_timeout)
