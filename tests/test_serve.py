"""Serving subsystem: micro-batching engine + HTTP front-end.

The engine's determinism contract (engine.py docstring): a request's image
depends only on its own (prompt, seed, program key) — never on which other
requests shared its batch — because per-request noise comes from the
request seed and every model op is per-sample.  These tests pin that, the
batching/padding accounting, program-key isolation, and the HTTP surface.
"""

import base64
import io
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from consolver_tpu.core import schedules
from consolver_tpu.pipelines.t2i import TextToImagePipeline
from consolver_tpu.serve import GenerationRequest, InferenceEngine, make_server
from test_pipeline import make_tiny_stack

BATCH = 4
LATENT = 8
# the tiny VAE has 2 levels -> 2x upscale (SD-1.5's 4 levels -> 8x)
IMG = LATENT * 2
SHAPE = (IMG, IMG, 3)


@pytest.fixture(scope="module")
def pipeline():
    (unet, up), (te, tp), (vae, vp) = make_tiny_stack()
    return TextToImagePipeline(
        unet, up, te, tp, vae, vp, schedules.DiffusionSchedule.sd15()
    )


@pytest.fixture()
def engine(pipeline):
    eng = InferenceEngine(
        pipeline, batch_size=BATCH, latent_size=LATENT, flush_ms=150.0
    )
    yield eng
    eng.shutdown()


def _req(i, **kw):
    kw.setdefault("num_inference_steps", 2)
    return GenerationRequest(prompt=f"prompt {i}", seed=100 + i, **kw)


def test_single_request_pads_and_serves(engine):
    img = engine.generate(_req(0), timeout=300)
    assert img.shape == SHAPE and img.dtype == np.uint8
    s = engine.stats()
    assert s["batches"] == 1 and s["batched_rows"] == 1
    assert s["padded_rows"] == BATCH - 1 and s["completed"] == 1


def test_batched_result_identical_to_solo(engine):
    """Bit-identical pixels whether a request rides alone or packed."""
    solo = engine.generate(_req(0), timeout=300)
    futs = [engine.submit(_req(i)) for i in range(BATCH)]
    packed = [f.result(timeout=300) for f in futs]
    np.testing.assert_array_equal(solo, packed[0])
    s = engine.stats()
    # the 4 concurrent submits coalesced into one full batch
    assert s["batches"] == 2 and s["batched_rows"] == 1 + BATCH
    assert s["mean_batch_occupancy"] == pytest.approx((1 + BATCH) / (2 * BATCH))
    # distinct seeds/prompts produced distinct images
    assert any(not np.array_equal(packed[0], p) for p in packed[1:])


def test_program_keys_never_mix(engine):
    """steps=2 and steps=3 requests need different XLA programs — the
    engine must dispatch them as separate batches, preserving results."""
    futs = [engine.submit(_req(i)) for i in range(2)]
    futs += [engine.submit(_req(i, num_inference_steps=3)) for i in range(2)]
    imgs = [f.result(timeout=300) for f in futs]
    assert all(im.shape == SHAPE for im in imgs)
    s = engine.stats()
    assert s["batches"] == 2 and s["batched_rows"] == 4
    # same seed, different step count -> different image
    assert not np.array_equal(imgs[0], imgs[2])


def test_solver_zoo_requests_serve(engine):
    img = engine.generate(_req(0, solver="ddim"), timeout=300)
    assert img.shape == SHAPE


def test_engine_error_propagates_and_engine_survives(engine):
    bad = GenerationRequest(prompt="x", num_inference_steps=2,
                            solver="no-such-solver")
    with pytest.raises(Exception):
        engine.generate(bad, timeout=300)
    assert engine.stats()["errors"] == 1
    # engine still serves after a failed batch
    img = engine.generate(_req(1), timeout=300)
    assert img.shape == SHAPE


def test_http_roundtrip(pipeline):
    eng = InferenceEngine(
        pipeline, batch_size=2, latent_size=LATENT, flush_ms=10.0
    )
    server = make_server(eng, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.load(r) == {"ok": True}

        body = json.dumps({
            "prompt": "a corgi", "seed": 7, "num_inference_steps": 2,
        }).encode()
        req = urllib.request.Request(
            f"{base}/v1/generate", data=body, method="POST"
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            payload = json.load(r)
        from PIL import Image

        png = base64.b64decode(payload["image_png_b64"])
        img = np.asarray(Image.open(io.BytesIO(png)))
        assert img.shape == SHAPE
        # HTTP path matches a direct engine call exactly
        direct = eng.generate(
            GenerationRequest(prompt="a corgi", seed=7,
                              num_inference_steps=2),
            timeout=300,
        )
        np.testing.assert_array_equal(img, direct)

        with urllib.request.urlopen(f"{base}/v1/stats", timeout=30) as r:
            stats = json.load(r)
        assert stats["completed"] >= 2 and stats["batch_size"] == 2

        # missing prompt -> 400, not a crash
        bad = urllib.request.Request(
            f"{base}/v1/generate", data=b"{}", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(bad, timeout=30)
        assert err.value.code == 400
    finally:
        server.shutdown()
        eng.shutdown()


def test_shutdown_fails_queued_requests(pipeline):
    eng = InferenceEngine(
        pipeline, batch_size=2, latent_size=LATENT, flush_ms=10.0
    )
    eng.generate(_req(0), timeout=300)  # warm so shutdown is quick
    eng.shutdown()
    with pytest.raises(Exception):
        eng.submit(_req(1))
