"""Stdlib HTTP front-end for the serving engines.

Endpoints
---------
``GET /healthz``          liveness probe -> ``{"ok": true}``
``GET /v1/stats``         engine counters (batches, occupancy, errors)
``POST /v1/generate``     JSON body ``{"prompt", "seed", "num_inference_steps",
                          "guidance_scale", "solver", "deterministic"}``
                          -> JSON with a base64 PNG (``image_png_b64``) + timing.
``POST /v1/edit``         JSON body ``{"instruction", "image_png_b64", "seed",
                          "num_inference_steps", "guidance_scale", "solver",
                          "deterministic"}`` -> edited image as base64 PNG.
                          404 unless the server was built with an edit engine.
``POST /v1/refine``       same body as ``/v1/generate`` but defaulting to the
                          TEACHER configuration (40-step multistep-DPM — the
                          reference's own teacher, gen_pretrain/gen.sh:1-2):
                          the preview->refine product loop (readme.md:135-150).
                          A request's initial noise derives only from its
                          ``seed``, so refining with the preview's seed
                          continues the exact same trajectory start.
``POST /v1/edit/refine``  the edit-family twin: same body as ``/v1/edit`` but
                          defaulting to the reference's full-quality Kontext
                          signature (28-step Euler FM at guidance 2.5,
                          edit_ppo/edit_pretrain/generate.py:28-29).  Same
                          seed-sharing contract as ``/v1/refine``.
``POST /v1/admin/reload_factor``  hot-reload the policy from a server-side
                          checkpoint path: ``{"path": "runs/checkpoint-300",
                          "engine": "generate"|"edit"}`` (``engine`` optional
                          with a single engine).  The product loop writes a
                          policy checkpoint every N train steps
                          (train_ppo.py:445-449); this swaps it into the
                          resident engine with NO re-trace (params are jit
                          arguments) — in-flight batches finish on the old
                          policy, later requests use the new one.  Mismatched
                          dims (a different compiled program) are rejected
                          409.  ``path`` is resolved on the SERVER host —
                          keep the port unexposed or front it with auth.

Limits: bodies over ``MAX_BODY_BYTES`` are rejected 413 before being read;
``image_png_b64`` images over ``MAX_EDIT_PIXELS`` are rejected 400 before
pixel decode (PIL reads the header lazily).  A request that exceeds the
engine's ``max_wait_s`` queue deadline returns 503 (shed, retryable).

A ``ThreadingHTTPServer`` handles sockets; every handler thread blocks on
the engine's Future, so concurrent HTTP requests coalesce into one compiled
TPU batch — the whole point of the engine.  The reference has no serving
layer at all (its inference surface is gen_ppo.py's script-level thread
pool and the edit drivers' fork-per-GPU, edit_ppo/generate_ours.py:176-189);
this is deployment surface beyond parity.
"""

from __future__ import annotations

import base64
import io
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from consolver_tpu.serve.engine import (
    EditInferenceEngine,
    EditRequest,
    GenerationRequest,
    InferenceEngine,
    RequestExpired,
)

# one oversized /v1/edit body would otherwise balloon host RAM before any
# validation ran; 64 MB comfortably covers a 16 MP PNG in base64
MAX_BODY_BYTES = 64 * 1024 * 1024
# edit engines center-crop-resize to <= 1024^2 anyway; 16 MP bounds the
# decoded-pixel allocation (checked from the PNG header, pre-decode)
MAX_EDIT_PIXELS = 16 * 1024 * 1024

# /v1/refine: the teacher-grade signature (reference gen_pretrain/gen.sh:1-2
# generates teacher data with 40-step multistep DPM-Solver); clients override
# per-field.  Sharing the preview's seed reproduces the preview's exact
# initial noise (engine noise is a pure function of seed).
REFINE_DEFAULTS = {"num_inference_steps": 40, "solver": "multistep-dpm"}

# /v1/edit/refine: the edit family's full-quality signature — the
# reference generates its Kontext teacher data with 28-step Euler FM at
# guidance 2.5 (edit_ppo/edit_pretrain/generate.py:28-29)
EDIT_REFINE_DEFAULTS = {
    "num_inference_steps": 28,
    "solver": "euler",
    "guidance_scale": 2.5,
}

def _json_bool(value) -> bool:
    """Strict JSON-boolean parse: bool("false") is True, so a permissive
    cast would silently flip the determinism knob (and fork a fresh
    compiled program) on a string-typed field."""
    if not isinstance(value, bool):
        raise ValueError(
            f"'deterministic' must be a JSON boolean, got {value!r}"
        )
    return value


_COMMON_FIELDS = {
    "seed": int,
    "num_inference_steps": int,
    "guidance_scale": float,
    "solver": str,
    "deterministic": _json_bool,
}
_GENERATE_FIELDS = {"prompt": str, **_COMMON_FIELDS}
_EDIT_FIELDS = {"instruction": str, **_COMMON_FIELDS}


def _png_b64(image) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(image).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def _decode_image_b64(b64: str) -> np.ndarray:
    from PIL import Image

    raw = base64.b64decode(b64, validate=True)
    img = Image.open(io.BytesIO(raw))
    # PIL reads only the header here — bound the pixel allocation BEFORE
    # any actual decode so an oversized body can't balloon host RAM
    w, h = img.size
    if w * h > MAX_EDIT_PIXELS:
        raise ValueError(
            f"image {w}x{h} = {w * h} pixels exceeds the "
            f"{MAX_EDIT_PIXELS}-pixel limit"
        )
    return np.asarray(img.convert("RGB"), np.uint8)


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
            stats = {}
            if self.server.engine is not None:
                stats["generate"] = self.server.engine.stats()
            if self.server.edit_engine is not None:
                stats["edit"] = self.server.edit_engine.stats()
            if len(stats) == 1:  # single-engine servers keep the flat shape
                stats = next(iter(stats.values()))
            self._reply(200, stats)
        else:
            self._reply(404, {"error": f"unknown path {self.path}"})

    def _parse(self, fields: dict, payload: dict, required: str) -> dict:
        if required not in payload:
            raise ValueError(f"missing required field '{required}'")
        return {
            name: cast(payload[name])
            for name, cast in fields.items()
            if name in payload
        }

    def do_POST(self):  # noqa: N802 - stdlib name
        try:
            length = int(self.headers.get("Content-Length", 0))
            if length > MAX_BODY_BYTES:
                self._reply(413, {
                    "error": f"body {length} bytes exceeds the "
                             f"{MAX_BODY_BYTES}-byte limit"
                })
                return
            payload = json.loads(self.rfile.read(length) or b"{}")
        except (ValueError, json.JSONDecodeError) as exc:
            self._reply(400, {"error": str(exc)})
            return

        if self.path == "/v1/admin/reload_factor":
            self._admin_reload_factor(payload)
            return
        if self.path in ("/v1/generate", "/v1/refine"):
            engine = self.server.engine
            if engine is None:
                self._reply(404, {"error": "no text-to-image engine configured"})
                return
            try:
                kwargs = self._parse(_GENERATE_FIELDS, payload, "prompt")
                if self.path == "/v1/refine":
                    for name, val in REFINE_DEFAULTS.items():
                        kwargs.setdefault(name, val)
                request = GenerationRequest(**kwargs)
            except (ValueError, TypeError) as exc:
                self._reply(400, {"error": str(exc)})
                return
        elif self.path in ("/v1/edit", "/v1/edit/refine"):
            engine = self.server.edit_engine
            if engine is None:
                self._reply(404, {"error": "no edit engine configured"})
                return
            try:
                kwargs = self._parse(_EDIT_FIELDS, payload, "instruction")
                if self.path == "/v1/edit/refine":
                    for name, val in EDIT_REFINE_DEFAULTS.items():
                        kwargs.setdefault(name, val)
                if "image_png_b64" not in payload:
                    raise ValueError("missing required field 'image_png_b64'")
                kwargs["image"] = _decode_image_b64(payload["image_png_b64"])
                request = EditRequest(**kwargs)
            # OSError covers PIL.UnidentifiedImageError + truncated images
            except (ValueError, TypeError, OSError,
                    base64.binascii.Error) as exc:
                self._reply(400, {"error": str(exc)})
                return
        else:
            self._reply(404, {"error": f"unknown path {self.path}"})
            return

        t0 = time.monotonic()
        try:
            image = engine.generate(request, timeout=self.server.request_timeout)
        except RequestExpired as exc:  # queue deadline: shed, retryable
            self._reply(503, {"error": f"RequestExpired: {exc}"})
            return
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


    def _admin_reload_factor(self, payload: dict) -> None:
        engines = {}
        if self.server.engine is not None:
            engines["generate"] = self.server.engine
        if self.server.edit_engine is not None:
            engines["edit"] = self.server.edit_engine
        name = payload.get("engine")
        if name is None and len(engines) == 1:
            name = next(iter(engines))
        if name not in engines:
            self._reply(400, {
                "error": f"'engine' must be one of {sorted(engines)}"
            })
            return
        path = payload.get("path")
        if not isinstance(path, str) or not path:
            self._reply(400, {"error": "missing required field 'path'"})
            return
        try:
            out = engines[name].load_factor_ckpt(path)
        except ValueError as exc:  # dim/config mismatch: program property
            self._reply(409, {"error": str(exc)})
            return
        except Exception as exc:  # unreadable/corrupt checkpoint
            self._reply(400, {"error": f"{type(exc).__name__}: {exc}"})
            return
        self._reply(200, {"ok": True, "engine": name, **out})


class ServeServer(ThreadingHTTPServer):
    daemon_threads = True

    def __init__(self, address, engine: Optional[InferenceEngine],
                 request_timeout: float = 600.0,
                 edit_engine: Optional[EditInferenceEngine] = None):
        super().__init__(address, ServeHandler)
        self.engine = engine
        self.edit_engine = edit_engine
        self.request_timeout = request_timeout


def make_server(
    engine: Optional[InferenceEngine] = None,
    host: str = "127.0.0.1",
    port: int = 8000,
    request_timeout: float = 600.0,
    edit_engine: Optional[EditInferenceEngine] = None,
) -> ServeServer:
    """Bind (``port=0`` picks a free one; read ``server.server_address``).

    Pass ``engine`` for ``/v1/generate`` (SD family), ``edit_engine`` for
    ``/v1/edit`` (FLUX-Kontext), or both to serve the two families from one
    process (each engine owns its own resident compiled programs)."""
    if engine is None and edit_engine is None:
        raise ValueError("need at least one engine")
    return ServeServer((host, port), engine, request_timeout,
                       edit_engine=edit_engine)
