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
import time
import urllib.request

import jax
import numpy as np
import pytest

from consolver_tpu.core import schedules
from consolver_tpu.pipelines.t2i import TextToImagePipeline
from consolver_tpu.serve import (
    EditInferenceEngine,
    EditRequest,
    GenerationRequest,
    InferenceEngine,
    make_server,
)
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


def test_prewarm_compiles_one_program_per_signature(engine):
    """prewarm dedupes by program_key and leaves the compiled denoise fn
    resident in the pipeline cache, so the first real request skips it."""
    n = engine.prewarm(
        _req(0), _req(1), _req(2, num_inference_steps=3), timeout=300
    )
    assert n == 2  # two distinct (steps, cfg, solver, det) signatures
    cache_keys = set(engine.pipeline._denoise_cache)
    assert (2, 3.0, False, "consistencysolver", False) in cache_keys
    assert (3, 3.0, False, "consistencysolver", False) in cache_keys
    before = engine.stats()["batches"]
    img = engine.generate(_req(5), timeout=300)
    assert img.shape == SHAPE
    assert engine.stats()["batches"] == before + 1


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


def test_stats_latency_percentiles(engine):
    engine.generate(_req(0), timeout=300)
    engine.generate(_req(1), timeout=300)
    s = engine.stats()
    assert s["execute_ms_p50"] > 0 and s["execute_ms_p95"] >= s["execute_ms_p50"]
    assert s["queue_wait_ms_p50"] >= 0


def test_zoo_solver_deterministic_does_not_fork_programs():
    """deterministic is a policy knob; zoo solvers have no policy, so it
    must not split programs/batches (review fix)."""
    a = GenerationRequest(prompt="x", solver="dpmsolver", deterministic=True)
    b = GenerationRequest(prompt="x", solver="dpmsolver", deterministic=False)
    assert a.program_key == b.program_key
    c = GenerationRequest(prompt="x", deterministic=True)  # learnable
    d = GenerationRequest(prompt="x", deterministic=False)
    assert c.program_key != d.program_key
    e = EditRequest(instruction="x", image=np.zeros((4, 4, 3), np.uint8),
                    solver="euler", deterministic=True)
    f = EditRequest(instruction="x", image=np.zeros((4, 4, 3), np.uint8),
                    solver="euler")
    assert e.program_key == f.program_key


def test_padded_serving_one_program_many_step_counts(pipeline):
    """padded_max_steps: requests with different step counts share ONE
    compiled pad-to-max program, and each result equals the per-count
    program's (valid-prefix equivalence, tests/test_pipeline.py)."""
    eng = InferenceEngine(
        pipeline, batch_size=BATCH, latent_size=LATENT, flush_ms=50.0,
        padded_max_steps=4,
    )
    try:
        img2 = eng.generate(_req(0, num_inference_steps=2), timeout=300)
        img3 = eng.generate(_req(0, num_inference_steps=3), timeout=300)
        padded_keys = [
            k for k in eng.pipeline._denoise_cache if k[0] == "padded"
        ]
        assert len(padded_keys) == 1  # one program served both counts
        assert not np.array_equal(img2, img3)
    finally:
        eng.shutdown()
    with InferenceEngine(
        pipeline, batch_size=BATCH, latent_size=LATENT, flush_ms=50.0
    ) as per_count:
        np.testing.assert_array_equal(
            img2, per_count.generate(_req(0, num_inference_steps=2),
                                     timeout=300)
        )
        np.testing.assert_array_equal(
            img3, per_count.generate(_req(0, num_inference_steps=3),
                                     timeout=300)
        )


# ------------------------------------------------------------------ mesh
# --shard serving: one SPMD program over a data mesh, params replicated,
# batch sharded.  Per-request results must match the unsharded engine.


def test_mesh_sharded_engine_matches_unsharded(pipeline):
    from consolver_tpu.dist.mesh import make_mesh

    mesh = make_mesh()  # 8 virtual CPU devices (conftest)
    eng = InferenceEngine(
        pipeline, batch_size=8, latent_size=LATENT, mesh=mesh, flush_ms=200.0
    )
    try:
        futs = [eng.submit(_req(i)) for i in range(8)]
        sharded = [f.result(timeout=300) for f in futs]
        assert eng.stats()["batches"] == 1  # coalesced into ONE sharded batch
        # partial batch pads to the global batch and still shards
        part = eng.generate(_req(0), timeout=300)
    finally:
        eng.shutdown()
    with InferenceEngine(
        pipeline, batch_size=BATCH, latent_size=LATENT
    ) as single:
        solo = single.generate(_req(3), timeout=300)
    np.testing.assert_array_equal(sharded[3], solo)
    np.testing.assert_array_equal(part, sharded[0])
    assert any(not np.array_equal(sharded[0], s) for s in sharded[1:])


def test_serving_mesh_cli_semantics():
    """--tp without --shard uses exactly N chips (data axis 1: --batch-size
    is NOT silently multiplied); with --shard the leftover chips form the
    data axis (review fix)."""
    import argparse

    from scripts.serve import _data_shards, _serving_mesh

    def ns(**kw):
        return argparse.Namespace(**{"shard": False, "tp": 1, **kw})
    assert _serving_mesh(ns()) is None
    m = _serving_mesh(ns(tp=2))
    assert dict(m.shape) == {"data": 1, "model": 2} and _data_shards(m) == 1
    m = _serving_mesh(ns(shard=True, tp=2))
    assert dict(m.shape) == {"data": 4, "model": 2} and _data_shards(m) == 4
    m = _serving_mesh(ns(shard=True))
    assert dict(m.shape) == {"data": 8} and _data_shards(m) == 8


def test_mesh_batch_size_must_divide(pipeline):
    from consolver_tpu.dist.mesh import make_mesh

    with pytest.raises(ValueError, match="divide"):
        InferenceEngine(pipeline, batch_size=3, latent_size=LATENT,
                        mesh=make_mesh())


# ---------------------------------------------------------------- policy
# With a learnable policy attached, SAMPLED actions come from one
# batch-shared key (a request's actions depend on its batch slot);
# deterministic=True switches to mode actions (FactorNet.mode_action) and
# restores the engine's determinism contract.


@pytest.fixture(scope="module")
def policy_pipeline():
    from consolver_tpu.policy import FactorNet, FactorNetConfig

    (unet, up), (te, tp), (vae, vp) = make_tiny_stack()
    fcfg = FactorNetConfig(order_dim=2, scaler_dim=0, num_actions=11,
                           family="sd")
    fnet = FactorNet(fcfg)
    return TextToImagePipeline(
        unet, up, te, tp, vae, vp, schedules.DiffusionSchedule.sd15(),
        factor_net=fnet, factor_params=fnet.init(jax.random.key(3)),
    )


def test_deterministic_policy_is_slot_independent(policy_pipeline):
    eng = InferenceEngine(
        policy_pipeline, batch_size=BATCH, latent_size=LATENT, flush_ms=150.0
    )
    try:
        req = _req(0, deterministic=True)
        solo = eng.generate(req, timeout=300)
        # same request now rides in slot 2 of a full batch
        futs = [eng.submit(_req(i + 10, deterministic=True)) for i in range(2)]
        futs.append(eng.submit(req))
        futs.append(eng.submit(_req(13, deterministic=True)))
        packed = [f.result(timeout=300) for f in futs]
        np.testing.assert_array_equal(solo, packed[2])
        # deterministic and sampled share neither program nor batch
        assert eng.generate(_req(0), timeout=300).shape == SHAPE
        assert eng.stats()["batches"] == 3
    finally:
        eng.shutdown()


def test_mode_action_matches_argmax(policy_pipeline):
    """mode_action returns the argmax-probability grid values, RNG-free."""
    import jax.numpy as jnp

    fnet = policy_pipeline.factor_net
    params = policy_pipeline.factor_params
    conds = {
        "x": jax.random.normal(jax.random.key(0), (2, fnet.config.input_dim)),
        "epsilon": jax.random.normal(
            jax.random.key(1), (2, fnet.config.order_dim, 8, 8, 4)
        ),
    }
    values, probs = fnet.mode_action(params, conds)
    logp = fnet.log_probs(params, conds)
    idx = jnp.argmax(logp, axis=-1)
    expect = fnet.action_values[jnp.arange(fnet.config.action_dims)[None, :], idx]
    np.testing.assert_array_equal(np.asarray(values), np.asarray(expect))
    assert float(probs.min()) > 0.0
    # mode probability must be the max probability per dim
    np.testing.assert_allclose(
        np.asarray(probs), np.asarray(jnp.exp(logp).max(-1)), rtol=1e-6
    )


# ------------------------------------------------------------------ edit


@pytest.fixture(scope="module")
def edit_pipe():
    from test_edit import make_tiny_flux_pipeline

    return make_tiny_flux_pipeline()


@pytest.fixture(scope="module")
def edit_engine(edit_pipe):
    from consolver_tpu.serve import EditInferenceEngine

    eng = EditInferenceEngine(
        edit_pipe,
        resolution=16,  # tiny 2-level VAE (stride 2) x 2x2 packing
        batch_size=2,
        t5_max_length=4,
        clip_max_length=4,
        flush_ms=100.0,
    )
    yield eng
    eng.shutdown()


def _edit_req(i, **kw):
    kw.setdefault("num_inference_steps", 2)
    rng = np.random.default_rng(i)
    image = rng.integers(0, 256, (24, 20, 3), np.uint8)  # non-square input
    return EditRequest(instruction=f"edit {i}", image=image, seed=200 + i, **kw)


def test_edit_single_request(edit_engine):
    img = edit_engine.generate(_edit_req(0), timeout=300)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    s = edit_engine.stats()
    assert s["batches"] == 1 and s["padded_rows"] == 1


def test_edit_deterministic_slot_independent(edit_engine):
    req = _edit_req(1, deterministic=True)
    solo = edit_engine.generate(req, timeout=300)
    futs = [edit_engine.submit(_edit_req(9, deterministic=True)),
            edit_engine.submit(req)]
    packed = [f.result(timeout=300) for f in futs]
    np.testing.assert_array_equal(solo, packed[1])
    assert not np.array_equal(packed[0], packed[1])


def test_edit_mesh_sharded_matches_unsharded(edit_pipe, edit_engine):
    from consolver_tpu.dist.mesh import make_mesh
    from consolver_tpu.serve import EditInferenceEngine

    # the fixture pipeline carries a sampling policy, whose actions are
    # batch-slot dependent by design — mode actions isolate the mesh check
    solo = edit_engine.generate(_edit_req(4, deterministic=True), timeout=300)
    eng = EditInferenceEngine(
        edit_pipe, resolution=16, batch_size=8, t5_max_length=4,
        clip_max_length=4, flush_ms=200.0, mesh=make_mesh(),
    )
    try:
        futs = [eng.submit(_edit_req(i, deterministic=True))
                for i in range(3, 9)]
        sharded = [f.result(timeout=300) for f in futs]
        assert eng.stats()["batches"] == 1
    finally:
        eng.shutdown()
    np.testing.assert_array_equal(sharded[1], solo)


def test_edit_tp_mesh_serving(edit_pipe, edit_engine):
    """2-D (data=4, model=2) mesh: the DiT tensor-shards by FLUX_TP_RULES
    while the batch shards over data.  TP all-reduces reorder partial sums,
    so compare within one uint8 quantization step of the unsharded image."""
    from consolver_tpu.dist import mesh as meshlib
    from consolver_tpu.serve import EditInferenceEngine

    solo = edit_engine.generate(_edit_req(7, deterministic=True), timeout=300)
    mesh = meshlib.make_mesh(
        axis_shape=(4, 2), axis_names=(meshlib.DATA_AXIS, meshlib.MODEL_AXIS)
    )
    eng = EditInferenceEngine(
        edit_pipe, resolution=16, batch_size=4, t5_max_length=4,
        clip_max_length=4, flush_ms=50.0, mesh=mesh,
    )
    try:
        # the DiT params really live TENSOR-sharded (replicated leaves also
        # span all devices, so device_set size alone would be vacuous)
        leaves = jax.tree.leaves(eng.pipeline.transformer_params)
        assert any(not l.sharding.is_fully_replicated for l in leaves)
        img = eng.generate(_edit_req(7, deterministic=True), timeout=300)
    finally:
        eng.shutdown()
    diff = np.abs(img.astype(np.int32) - solo.astype(np.int32))
    assert diff.max() <= 1, f"TP image deviates: max abs diff {diff.max()}"


def test_edit_padded_serving_one_program(edit_pipe):
    from consolver_tpu.serve import EditInferenceEngine

    eng = EditInferenceEngine(
        edit_pipe, resolution=16, batch_size=2, t5_max_length=4,
        clip_max_length=4, flush_ms=50.0, padded_max_steps=4,
    )
    try:
        a = eng.generate(_edit_req(20, num_inference_steps=2), timeout=300)
        b = eng.generate(_edit_req(20, num_inference_steps=3), timeout=300)
        padded_keys = [
            k for k in eng.pipeline._denoise_cache if k[0] == "padded"
        ]
        assert len(padded_keys) == 1  # one program served both counts
        assert not np.array_equal(a, b)
    finally:
        eng.shutdown()


@pytest.mark.slow
def test_serve_cli_family_both_smoke(monkeypatch):
    """The exact serve.py CLI wiring (--family both --prewarm, smoke
    models): both endpoints live on one server, prewarm compiled one
    program per engine before the bind."""
    import sys

    import scripts.serve as serve_mod

    monkeypatch.setattr(sys, "argv", [
        "serve.py", "--family", "both", "--port", "0",
        "--batch-size", "2", "--flush-ms", "20", "--prewarm",
    ])
    # run main() through parsing + engine/server assembly, stopping before
    # the blocking serve_forever loop
    captured = {}
    real_build = serve_mod.build_server

    class _Assembled(Exception):
        pass

    def capture(args):
        captured["result"] = real_build(args)
        raise _Assembled

    monkeypatch.setattr(serve_mod, "build_server", capture)
    with pytest.raises(_Assembled):
        serve_mod.main()
    server, engines, descs = captured["result"]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}"
    try:
        assert len(engines) == 2 and len(descs) == 2
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.load(r)["ok"]
        body = json.dumps({"prompt": "smoke", "seed": 1,
                           "num_inference_steps": 2}).encode()
        req = urllib.request.Request(f"{base}/v1/generate", data=body,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            assert "image_png_b64" in json.load(r)
        with urllib.request.urlopen(f"{base}/v1/stats", timeout=30) as r:
            stats = json.load(r)
        assert set(stats) == {"generate", "edit"}
        # --prewarm warmed one program per engine before the bind
        assert stats["generate"]["prewarmed"] >= 1
        assert stats["edit"]["prewarmed"] >= 1
    finally:
        server.shutdown()
        for eng in engines:
            eng.shutdown()


def test_edit_http_roundtrip(edit_engine):
    from PIL import Image

    server = make_server(edit_engine=edit_engine, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}"
    try:
        buf = io.BytesIO()
        rng = np.random.default_rng(5)
        Image.fromarray(rng.integers(0, 256, (20, 24, 3), np.uint8)).save(
            buf, format="PNG"
        )
        body = json.dumps({
            "instruction": "make it snow",
            "image_png_b64": base64.b64encode(buf.getvalue()).decode(),
            "seed": 11,
            "num_inference_steps": 2,
        }).encode()
        req = urllib.request.Request(f"{base}/v1/edit", data=body, method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            payload = json.load(r)
        png = base64.b64decode(payload["image_png_b64"])
        img = np.asarray(Image.open(io.BytesIO(png)))
        assert img.shape == (16, 16, 3)

        # edit-only server: /v1/generate is 404, missing image is 400
        gen = urllib.request.Request(
            f"{base}/v1/generate", data=json.dumps({"prompt": "x"}).encode(),
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(gen, timeout=30)
        assert err.value.code == 404
        bad = urllib.request.Request(
            f"{base}/v1/edit",
            data=json.dumps({"instruction": "x"}).encode(), method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(bad, timeout=30)
        assert err.value.code == 400

        # valid base64 that is NOT an image -> 400, not a dropped socket
        not_png = urllib.request.Request(
            f"{base}/v1/edit",
            data=json.dumps({
                "instruction": "x",
                "image_png_b64": base64.b64encode(b"not a png").decode(),
            }).encode(), method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(not_png, timeout=30)
        assert err.value.code == 400

        # string-typed deterministic -> 400 (bool("false") would be True)
        str_det = urllib.request.Request(
            f"{base}/v1/edit",
            data=json.dumps({
                "instruction": "x",
                "image_png_b64": base64.b64encode(buf.getvalue()).decode(),
                "deterministic": "false",
            }).encode(), method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(str_det, timeout=30)
        assert err.value.code == 400

        with urllib.request.urlopen(f"{base}/v1/stats", timeout=30) as r:
            stats = json.load(r)
        assert stats["completed"] >= 1
    finally:
        server.shutdown()


# --------------------------------------------------------------- replicas
# The third multi-chip serving mode: N independent single-chip engines
# with full param copies and least-loaded dispatch (serve/engine.py
# ReplicaGroup) — vs --shard's one SPMD program.  Results must be
# bit-identical to a single engine; work must actually reach every chip.


def test_replica_group_matches_single_engine(pipeline):
    from consolver_tpu.serve import make_replicas

    with InferenceEngine(
        pipeline, batch_size=BATCH, latent_size=LATENT
    ) as single:
        solo = single.generate(_req(3), timeout=300)
    with make_replicas(
        pipeline, InferenceEngine, 2,
        batch_size=BATCH, latent_size=LATENT, flush_ms=50.0,
    ) as group:
        # params are committed to two DIFFERENT devices
        devs = [
            next(iter(jax.tree.leaves(e.pipeline.unet_params)[0].devices()))
            for e in group.engines
        ]
        assert devs[0] != devs[1]
        got = group.generate(_req(3), timeout=300)
        np.testing.assert_array_equal(solo, got)
        # a burst wide enough to need both replicas
        futs = [group.submit(_req(i)) for i in range(2 * BATCH)]
        outs = [f.result(timeout=300) for f in futs]
        s = group.stats()
        assert s["replicas"] == 2
        assert s["completed"] == 1 + 2 * BATCH
        assert sum(p["batches"] for p in s["per_replica"]) == s["batches"]
        # least-loaded dispatch spread the burst over both replicas
        assert all(p["requests"] > 0 for p in s["per_replica"])
        # replica placement never changes results
        with InferenceEngine(
            pipeline, batch_size=BATCH, latent_size=LATENT
        ) as single2:
            np.testing.assert_array_equal(
                outs[5], single2.generate(_req(5), timeout=300)
            )


def test_replica_cli_semantics(pipeline, monkeypatch):
    import argparse

    from scripts.serve import _replica_count

    def ns(**kw):
        return argparse.Namespace(
            **{"shard": False, "tp": 1, "replicas": 0, **kw}
        )

    assert _replica_count(ns()) == 0
    assert _replica_count(ns(replicas=1)) == 0  # 1 replica = plain engine
    assert _replica_count(ns(replicas=4)) == 4
    with pytest.raises(SystemExit, match="mutually exclusive"):
        _replica_count(ns(replicas=2, shard=True))
    with pytest.raises(SystemExit, match="mutually exclusive"):
        _replica_count(ns(replicas=2, tp=2))
    with pytest.raises(SystemExit, match="visible devices"):
        _replica_count(ns(replicas=99))


def test_make_replicas_caps_at_device_count(pipeline):
    from consolver_tpu.serve import make_replicas

    with pytest.raises(ValueError, match="visible devices"):
        make_replicas(pipeline, InferenceEngine, 99,
                      batch_size=BATCH, latent_size=LATENT)


def test_edit_replicas_pin_transformer_params(edit_pipe):
    """Edit-family replicas commit the FLUX param trees per device and
    serve bit-equal to a single engine."""
    from consolver_tpu.serve import EditInferenceEngine, make_replicas

    kw = dict(resolution=16, batch_size=2, t5_max_length=4,
              clip_max_length=4, flush_ms=50.0)
    with EditInferenceEngine(edit_pipe, **kw) as single:
        solo = single.generate(_edit_req(2, deterministic=True), timeout=300)
    with make_replicas(edit_pipe, EditInferenceEngine, 2, **kw) as group:
        devs = [
            next(iter(jax.tree.leaves(
                e.pipeline.transformer_params)[0].devices()))
            for e in group.engines
        ]
        assert devs[0] != devs[1]
        got = group.generate(_edit_req(2, deterministic=True), timeout=300)
    np.testing.assert_array_equal(solo, got)


# --------------------------------------------------------------- hardening
class _SlowEngine(InferenceEngine):
    """Test double: _dispatch sleeps so a batch can be caught in flight."""

    EXEC_S = 0.8

    def _dispatch(self, requests):
        import time as _t

        _t.sleep(self.EXEC_S)
        return [np.zeros(SHAPE, np.uint8) for _ in requests]


def test_dispatch_overlaps_fetch(pipeline):
    """The pipelining contract (serve/engine._BatchingEngine): the worker
    dispatches batch N+1 while batch N is still being fetched.  Pinned
    with events (no timing sleeps): batch A's fetch BLOCKS until batch
    B's dispatch has been observed — if dispatch waited on fetch (the
    old serial engine), this would deadlock (joined via timeout)."""
    import threading as _th

    dispatched = []
    second_dispatch = _th.Event()
    release_fetch = _th.Event()

    class _OverlapEngine(InferenceEngine):
        def _dispatch(self, requests):
            dispatched.append(requests[0].seed)
            if len(dispatched) >= 2:
                second_dispatch.set()
            return [np.zeros(SHAPE, np.uint8) for _ in requests]

        def _fetch(self, images, n):  # instance override of the static
            release_fetch.wait(timeout=30)
            return images[:n]

    eng = _OverlapEngine(pipeline, batch_size=1, latent_size=LATENT,
                         flush_ms=1.0)
    try:
        fut_a = eng.submit(_req(0))
        fut_b = eng.submit(_req(1))
        # B must dispatch while A sits unfetched (fetch is blocked)
        assert second_dispatch.wait(timeout=10), \
            "batch B never dispatched while batch A's fetch was pending"
        release_fetch.set()
        assert fut_a.result(timeout=30).shape == SHAPE
        assert fut_b.result(timeout=30).shape == SHAPE
        assert eng.stats()["batches"] == 2
    finally:
        release_fetch.set()
        eng.shutdown(timeout=10)


def test_shutdown_with_inflight_batch_completes_it(pipeline):
    """shutdown() whose join times out mid-execute must not race the
    worker's _pending: the in-flight batch completes normally, everything
    still queued fails EngineShutDown once the worker exits
    (serve/engine.py shutdown contract)."""
    from consolver_tpu.serve import EngineShutDown

    eng = _SlowEngine(pipeline, batch_size=1, latent_size=LATENT,
                      flush_ms=1.0)
    try:
        fut_a = eng.submit(_req(0))  # enters _dispatch (batch_size=1)
        import time as _t

        _t.sleep(0.2)  # let the worker pick A up
        fut_b = eng.submit(_req(1))  # still queued behind A
        eng.shutdown(timeout=0.05)  # join expires while A is in flight
        # A completes with a real result; B is failed by the worker drain
        assert fut_a.result(timeout=10).shape == SHAPE
        with pytest.raises(EngineShutDown):
            fut_b.result(timeout=10)
        with pytest.raises(EngineShutDown):
            eng.submit(_req(2))
    finally:
        eng.shutdown(timeout=10)


def test_request_deadline_expires_queued_requests(pipeline):
    """max_wait_s: requests older than the deadline at batch-forming time
    fail RequestExpired instead of being served stale."""
    from consolver_tpu.serve import RequestExpired

    eng = InferenceEngine(pipeline, batch_size=2, latent_size=LATENT,
                          flush_ms=1.0, max_wait_s=0.0)
    try:
        with pytest.raises(RequestExpired):
            eng.generate(_req(0), timeout=30)
        assert eng.stats()["expired"] == 1
        assert eng.stats()["batches"] == 0  # nothing reached _execute
    finally:
        eng.shutdown()


def test_no_deadline_by_default(engine):
    """max_wait_s=None (default): requests never expire."""
    img = engine.generate(_req(0), timeout=300)
    assert img.shape == SHAPE and engine.stats()["expired"] == 0


def test_oversized_edit_image_rejected_pre_decode():
    """/v1/edit bounds the decoded-pixel count from the PNG header BEFORE
    decoding pixels (serve/http.py MAX_EDIT_PIXELS)."""
    from PIL import Image

    from consolver_tpu.serve.http import MAX_EDIT_PIXELS, _decode_image_b64

    side = int(np.sqrt(MAX_EDIT_PIXELS)) + 8  # just over the pixel bound
    buf = io.BytesIO()
    Image.new("L", (side, side)).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    with pytest.raises(ValueError, match="exceeds"):
        _decode_image_b64(b64)
    # a normal image still decodes
    buf2 = io.BytesIO()
    Image.new("RGB", (20, 24)).save(buf2, format="PNG")
    img = _decode_image_b64(base64.b64encode(buf2.getvalue()).decode())
    assert img.shape == (24, 20, 3)


def test_oversized_body_rejected_413(edit_engine):
    """Bodies over MAX_BODY_BYTES are refused from the Content-Length
    header, before any bytes are read into RAM."""
    import http.client

    from consolver_tpu.serve.http import MAX_BODY_BYTES

    server = make_server(edit_engine=edit_engine, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address[:2]
    try:
        conn = http.client.HTTPConnection(host, port, timeout=30)
        conn.putrequest("POST", "/v1/edit")
        conn.putheader("Content-Length", str(MAX_BODY_BYTES + 1))
        conn.endheaders()  # never send the body; the server must not wait
        resp = conn.getresponse()
        assert resp.status == 413
        assert b"exceeds" in resp.read()
        conn.close()
    finally:
        server.shutdown()


def test_expired_request_maps_to_503(pipeline):
    """A RequestExpired out of the engine surfaces as HTTP 503."""
    eng = InferenceEngine(pipeline, batch_size=2, latent_size=LATENT,
                          flush_ms=1.0, max_wait_s=0.0)
    server = make_server(eng, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address[:2]
    try:
        body = json.dumps({"prompt": "x", "num_inference_steps": 2}).encode()
        req = urllib.request.Request(
            f"http://{host}:{port}/v1/generate", data=body, method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req, timeout=60)
        assert err.value.code == 503
        assert "RequestExpired" in err.value.read().decode()
    finally:
        server.shutdown()
        eng.shutdown()


# ------------------------------------------------------------- /v1/refine
def test_refine_applies_teacher_defaults_and_shares_noise(pipeline):
    """/v1/refine defaults to the teacher signature (40-step multistep-DPM,
    gen_pretrain/gen.sh:1-2) and — the product loop's contract
    (readme.md:135-150) — a refine sharing the preview's seed receives the
    EXACT same initial noise (noise is a pure function of request seed)."""
    captured = []

    class _CapturePipe:
        """Duck-typed pipeline recording the engine's STATIC program args
        (steps, solver) at trace time and echoing the initial noise through
        the program output — the engine traces the whole hot path into one
        fused program now, so per-call noise values can't be captured
        host-side; noise identity is asserted via output bit-equality
        instead (the output below is a pure function of the noise only)."""

        tokenizer = None
        text_encoder = pipeline.text_encoder
        unet = pipeline.unet
        _denoise_cache = {}
        # the engine passes these as jit arguments (engine._PARAM_ATTRS)
        unet_params = text_params = vae_params = factor_params = None

        def denoise_fn(self, *a, **k):  # engine pre-builds eagerly
            return None

        def padded_denoise_fn(self, *a, **k):
            return None

        def __call__(self, key, ids, noise, num_inference_steps,
                     guidance_scale, solver, deterministic_policy,
                     padded_max_steps, record):
            captured.append((num_inference_steps, solver))
            b = noise.shape[0]
            # [0,1) image that injectively encodes the noise's first 3
            # channels: equal outputs <=> equal initial noise
            img = jax.numpy.clip(
                jax.numpy.tile(noise[:, :, :, :3], (1, 2, 2, 1)) * 0.05 + 0.5,
                0.0, 1.0,
            )
            return img, None

    eng = InferenceEngine(_CapturePipe(), batch_size=2, latent_size=LATENT,
                          flush_ms=1.0)
    server = make_server(eng, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}"
    try:
        preview = json.dumps({
            "prompt": "a corgi", "seed": 7, "num_inference_steps": 2,
        }).encode()
        with urllib.request.urlopen(urllib.request.Request(
                f"{base}/v1/generate", data=preview, method="POST"),
                timeout=60) as r:
            body_p = json.load(r)
            assert body_p["seed"] == 7
        refine = json.dumps({"prompt": "a corgi", "seed": 7}).encode()
        with urllib.request.urlopen(urllib.request.Request(
                f"{base}/v1/refine", data=refine, method="POST"),
                timeout=60) as r:
            body_r = json.load(r)
            assert body_r["seed"] == 7

        (steps_p, solver_p), (steps_r, solver_r) = captured
        assert (steps_p, solver_p) == (2, "consistencysolver")
        assert (steps_r, solver_r) == (40, "multistep-dpm")
        # same seed -> bit-identical initial noise: the refine continues
        # the preview's exact trajectory start.  The capture pipe's output
        # is a pure function of the noise (steps/solver unused), so equal
        # pngs <=> equal initial noise.
        assert body_p["image_png_b64"] == body_r["image_png_b64"]

        # client overrides still win over the refine defaults
        refine2 = json.dumps({
            "prompt": "a corgi", "seed": 7, "num_inference_steps": 12,
        }).encode()
        with urllib.request.urlopen(urllib.request.Request(
                f"{base}/v1/refine", data=refine2, method="POST"),
                timeout=60):
            pass
        assert captured[-1] == (12, "multistep-dpm")
    finally:
        server.shutdown()
        eng.shutdown()


def test_refine_prewarm_signature():
    """--prewarm-refine adds the non-expandable teacher signature to the
    prewarm list (scripts/serve.py) without re-stepping it."""
    from consolver_tpu.serve.http import REFINE_DEFAULTS

    req = GenerationRequest(prompt="prewarm", **REFINE_DEFAULTS)
    assert req.num_inference_steps == 40
    assert req.solver == "multistep-dpm"
    # distinct program from the preview default -> a second compile
    assert req.program_key != GenerationRequest(prompt="prewarm").program_key


def test_edit_refine_applies_teacher_defaults_and_shares_noise(edit_pipe):
    """/v1/edit/refine defaults to the reference's full-quality Kontext
    signature (28-step Euler FM at guidance 2.5,
    edit_ppo/edit_pretrain/generate.py:28-29) and shares the preview's
    initial noise when given the preview's seed (noise is a pure function
    of request seed — same contract as the sd /v1/refine)."""
    captured = []

    class _CapturePipe:
        """Duck-typed edit pipeline: records STATIC program args at trace
        time, output is a pure function of the initial noise (so equal
        pngs <=> equal noise)."""

        vae = edit_pipe.vae
        t5 = edit_pipe.t5
        clip = edit_pipe.clip
        _denoise_cache = {}
        transformer_params = t5_params = clip_params = None
        vae_params = factor_params = None

        def denoise_fn(self, *a, **k):  # engine pre-builds eagerly
            return None

        def padded_denoise_fn(self, *a, **k):
            return None

        def __call__(self, key, t5_ids, clip_ids, ref, noise,
                     num_inference_steps, guidance_scale, solver,
                     deterministic_policy, record, padded_max_steps):
            captured.append(
                (num_inference_steps, solver, float(guidance_scale))
            )
            # [B,8,8,C] noise -> [B,16,16,3] image, injective in noise
            img = jax.numpy.clip(
                jax.numpy.tile(noise[:, :, :, :3], (1, 2, 2, 1)) * 0.05 + 0.5,
                0.0, 1.0,
            )
            return img, None

    eng = EditInferenceEngine(_CapturePipe(), resolution=16, batch_size=1,
                              t5_max_length=4, clip_max_length=4,
                              flush_ms=1.0)
    server = make_server(edit_engine=eng, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}"
    try:
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(
            np.random.default_rng(5).integers(0, 256, (20, 24, 3), np.uint8)
        ).save(buf, format="PNG")
        img_b64 = base64.b64encode(buf.getvalue()).decode()
        preview = json.dumps({
            "instruction": "make it snow", "image_png_b64": img_b64,
            "seed": 7, "num_inference_steps": 2,
        }).encode()
        with urllib.request.urlopen(urllib.request.Request(
                f"{base}/v1/edit", data=preview, method="POST"),
                timeout=60) as r:
            body_p = json.load(r)
        refine = json.dumps({
            "instruction": "make it snow", "image_png_b64": img_b64,
            "seed": 7,
        }).encode()
        with urllib.request.urlopen(urllib.request.Request(
                f"{base}/v1/edit/refine", data=refine, method="POST"),
                timeout=60) as r:
            body_r = json.load(r)

        assert captured[0] == (2, "fmppo", 2.5)
        assert captured[1] == (28, "euler", 2.5)
        # same seed -> same initial noise -> identical capture-pipe output
        assert body_p["image_png_b64"] == body_r["image_png_b64"]

        # client overrides still beat the refine defaults
        refine2 = json.dumps({
            "instruction": "make it snow", "image_png_b64": img_b64,
            "seed": 7, "num_inference_steps": 12, "guidance_scale": 4.0,
        }).encode()
        with urllib.request.urlopen(urllib.request.Request(
                f"{base}/v1/edit/refine", data=refine2, method="POST"),
                timeout=60):
            pass
        assert captured[-1] == (12, "euler", 4.0)
    finally:
        server.shutdown()
        eng.shutdown()


def test_edit_refine_prewarm_signature():
    """--prewarm-refine warms the edit teacher signature too
    (scripts/serve.py): 28-step Euler FM at cfg 2.5 — a distinct compiled
    program from the 5-step fmppo preview default."""
    from consolver_tpu.serve.http import EDIT_REFINE_DEFAULTS

    gray = np.full((16, 16, 3), 127, np.uint8)
    req = EditRequest(instruction="prewarm", image=gray,
                      **EDIT_REFINE_DEFAULTS)
    assert req.num_inference_steps == 28
    assert req.solver == "euler"
    assert req.guidance_scale == 2.5
    assert req.program_key != EditRequest(
        instruction="prewarm", image=gray).program_key


def test_sigterm_routes_to_graceful_drain():
    """scripts/serve.py installs a SIGTERM handler that raises
    KeyboardInterrupt so orchestrator stops (k8s/systemd/docker) drain
    in-flight batches through the same path as Ctrl-C."""
    import signal

    from scripts.serve import install_sigterm_handler

    old = signal.getsignal(signal.SIGTERM)
    try:
        install_sigterm_handler()
        handler = signal.getsignal(signal.SIGTERM)
        assert handler is not old
        with pytest.raises(KeyboardInterrupt):
            handler(signal.SIGTERM, None)
    finally:
        signal.signal(signal.SIGTERM, old)


# ---------------------------------------------------- multi-size batching
# VERDICT r4 Weak #1: a fixed-size program pads every partial batch to the
# full batch, so sub-saturating load burns most compute on pad rows.  With
# batch_sizes=(2, 4) a partial batch pads to the smallest listed shape that
# fits.  Shape choice is numerics-visible on TPU (different shapes compile
# to different programs whose bf16 tilings differ at the LSB — measured on
# chip, round 5), so DETERMINISTIC requests always pin to the max shape;
# sampled traffic takes the smallest.  The cross-engine equality asserted
# below holds on the CPU backend (shape-invariant numerics there).


def test_batch_sizes_pick_smallest_shape(pipeline):
    eng = InferenceEngine(
        pipeline, batch_size=BATCH, batch_sizes=(2, BATCH),
        latent_size=LATENT, flush_ms=150.0,
    )
    try:
        assert eng.batch_sizes == (2, BATCH) and eng.batch_size == BATCH
        img = eng.generate(_req(0), timeout=300)
        s = eng.stats()
        # a single request padded to the SMALL shape, not the full batch
        assert s["batches"] == 1 and s["padded_rows"] == 1
        assert s["pad_waste_pct"] == pytest.approx(50.0)
        # 3 concurrent requests overflow the small shape -> full batch
        futs = [eng.submit(_req(i)) for i in range(3)]
        imgs = [f.result(timeout=300) for f in futs]
        s = eng.stats()
        assert s["batches"] == 2
        assert s["padded_rows"] == 1 + (BATCH - 3)
        assert all(im.shape == SHAPE for im in imgs)
    finally:
        eng.shutdown()
    # determinism across batch shapes: the same request in a plain
    # full-batch engine produces bit-identical pixels
    eng_full = InferenceEngine(
        pipeline, batch_size=BATCH, latent_size=LATENT, flush_ms=150.0
    )
    try:
        np.testing.assert_array_equal(
            img, eng_full.generate(_req(0), timeout=300)
        )
    finally:
        eng_full.shutdown()


def test_batch_sizes_deterministic_pins_max_shape(pipeline):
    """A deterministic request must never be served at a smaller batch
    shape: on TPU each shape is a different XLA program with LSB-different
    bf16 numerics, which would make the output depend on queue depth."""
    eng = InferenceEngine(
        pipeline, batch_size=BATCH, batch_sizes=(2, BATCH),
        latent_size=LATENT, flush_ms=150.0,
    )
    # Spy on the ACTUAL dispatched device-batch shape: the round-5 chip
    # mismatch came from _dispatch padding derived values (prompts/seeds)
    # without the deterministic flag, so stats said shape 8 while the
    # program really ran at shape 4 — stats alone cannot catch that.
    dispatched = []
    orig_dispatch = eng._dispatch

    def _spy(requests):
        out = orig_dispatch(requests)
        dispatched.append(int(out.shape[0]))
        return out

    eng._dispatch = _spy
    try:
        img = eng.generate(_req(0, deterministic=True), timeout=300)
        s = eng.stats()
        # one request, padded to the FULL batch (not the small shape)
        assert s["batches"] == 1 and s["padded_rows"] == BATCH - 1
        assert dispatched == [BATCH]
        assert img.shape == SHAPE
        # a mixed batch (any deterministic member) pins too
        futs = [eng.submit(_req(0, deterministic=True)),
                eng.submit(_req(1, deterministic=True))]
        imgs = [f.result(timeout=300) for f in futs]
        s = eng.stats()
        assert s["padded_rows"] == (BATCH - 1) + (BATCH - 2)
        assert set(dispatched) == {BATCH}
        # same request, same program, same shape -> bit-equal across calls
        np.testing.assert_array_equal(img, imgs[0])
        # prewarm of a deterministic signature warms ONLY the max shape
        n = eng.prewarm(_req(7, deterministic=True), timeout=300)
        assert n == 1
    finally:
        eng.shutdown()


def test_adaptive_boundary_stop_dispatches_at_shape_boundary(pipeline):
    """At sub-saturating load the adaptive collector must dispatch as soon
    as pending sits on a compiled shape boundary that the arrival-rate
    estimate says won't grow to the next boundary in time — zero pad rows
    and no full flush-window latency (the r5 sweep padded 20-30% of rows
    below the knee with full-batch targeting)."""
    eng = InferenceEngine(
        pipeline, batch_size=BATCH, batch_sizes=(2, BATCH),
        latent_size=LATENT, flush_ms=30_000.0, adaptive_flush=True,
    )
    dispatched = []
    orig_dispatch = eng._dispatch

    def _spy(requests):
        out = orig_dispatch(requests)
        dispatched.append(int(out.shape[0]))
        return out

    eng._dispatch = _spy
    try:
        # prime the arrival-rate estimate: gap so large the next boundary
        # (BATCH) can never fill inside the window
        with eng._lock:
            eng._ema_gap_s = 30.0
            eng._last_submit = time.monotonic()
        t0 = time.monotonic()
        futs = [eng.submit(_req(0)), eng.submit(_req(1))]
        imgs = [f.result(timeout=300) for f in futs]
        elapsed = time.monotonic() - t0
        # dispatched at the 2-boundary: no pad rows, well inside the 30 s
        # flush window (compile headroom aside, the wait itself is gone)
        assert dispatched == [2]
        s = eng.stats()
        assert s["padded_rows"] == 0 and s["batches"] == 1
        assert elapsed < 25.0, f"boundary-stop did not fire ({elapsed:.1f}s)"
        assert all(img.shape == SHAPE for img in imgs)
        # the helper itself: at a boundary with a huge gap -> stop; off
        # boundary or at the max shape or with no estimate -> never
        assert eng._boundary_stop(2, remain_s=5.0)
        assert not eng._boundary_stop(1, remain_s=5.0)
        assert not eng._boundary_stop(BATCH, remain_s=5.0)
        with eng._lock:
            eng._ema_gap_s = None
        assert not eng._boundary_stop(2, remain_s=5.0)
    finally:
        eng.shutdown()


def test_adaptive_split_flush_dispatches_exact_shapes(pipeline):
    """A flush window that expires OFF a shape boundary must dispatch the
    largest configured shape that fits and re-queue the remainder (one
    extra window of latency) instead of padding up to the next shape:
    3 pending rows with shapes (2, 8) previously dispatched one batch-8
    program with 5 pad rows; split-flush runs two batch-2 programs with
    a single pad row (the final lone row has no smaller program)."""
    eng = InferenceEngine(
        pipeline, batch_size=BATCH, batch_sizes=(2, BATCH),
        latent_size=LATENT, flush_ms=300.0, adaptive_flush=True,
    )
    dispatched = []
    orig_dispatch = eng._dispatch

    def _spy(requests):
        out = orig_dispatch(requests)
        dispatched.append(int(out.shape[0]))
        return out

    eng._dispatch = _spy
    try:
        futs = [eng.submit(_req(i)) for i in range(3)]
        imgs = [f.result(timeout=300) for f in futs]
        # whatever the worker's window landed on (n=3 trim, or n=1 pad
        # then n=2 exact), the dispatched shapes are two batch-2 programs
        # with exactly one pad row — never a padded batch-8
        assert dispatched == [2, 2], dispatched
        s = eng.stats()
        assert s["batches"] == 2 and s["padded_rows"] == 1
        assert all(img.shape == SHAPE for img in imgs)
        # the helper itself: expiry at a non-shape count dispatches the
        # largest fitting shape; below the smallest shape it must pad
        # (no smaller program exists); exact shapes pass through
        assert eng._expiry_trim(3) == 2
        assert eng._expiry_trim(1) == 1
        assert eng._expiry_trim(2) == 2
        assert eng._expiry_trim(BATCH) == BATCH
    finally:
        eng.shutdown()


def test_batch_sizes_prewarm_warms_every_shape(pipeline):
    eng = InferenceEngine(
        pipeline, batch_size=BATCH, batch_sizes=(2, BATCH),
        latent_size=LATENT, flush_ms=150.0,
    )
    try:
        n = eng.prewarm(_req(0), _req(1), timeout=300)
        assert n == 2  # one program_key x two batch shapes
        assert len(eng._programs) == 1
        prog = next(iter(eng._programs.values()))
        if hasattr(prog, "_cache_size"):
            assert prog._cache_size() == 2  # one trace per shape
        # real requests at either occupancy hit the warm traces
        before = eng.stats()["batches"]
        assert eng.generate(_req(5), timeout=300).shape == SHAPE
        if hasattr(prog, "_cache_size"):
            assert prog._cache_size() == 2  # no new trace
        assert eng.stats()["batches"] == before + 1
    finally:
        eng.shutdown()


def test_adaptive_flush_window_scales_with_arrivals(pipeline):
    eng = InferenceEngine(
        pipeline, batch_size=BATCH, latent_size=LATENT, flush_ms=200.0,
        adaptive_flush=True,
    )
    try:
        # no arrival estimate yet -> the configured cap
        assert eng._flush_window() == pytest.approx(0.2)
        eng._ema_gap_s = 0.010  # 100 req/s estimate
        # 4 empty slots x 10 ms gap = 40 ms, under the 200 ms cap
        assert eng._flush_window() == pytest.approx(0.04)
        eng._ema_gap_s = 1.0  # slow arrivals: the cap bounds the wait
        assert eng._flush_window() == pytest.approx(0.2)
        # the engine still serves normally with the adaptive path on
        assert eng.generate(_req(0), timeout=300).shape == SHAPE
    finally:
        eng.shutdown()


def _blocked_dispatch_spy(eng):
    """Patch eng._dispatch so the FIRST call parks until ``release`` is
    set (holding the worker inside _serve_batch while the test loads the
    queue), recording every dispatched request-prompt list."""
    order = []
    entered, release = threading.Event(), threading.Event()
    orig_dispatch = eng._dispatch

    def _spy(requests):
        entered.set()
        assert release.wait(30), "test never released the worker"
        order.append([r.prompt for r in requests])
        return orig_dispatch(requests)

    eng._dispatch = _spy
    return order, entered, release


def test_split_flush_remainder_does_not_starve_other_signature(pipeline):
    """The off-boundary remainder of a split-flush must NOT jump the
    queue: re-queued at the head it would permanently front-run an
    earlier-arrived request of another program signature under steady
    off-boundary traffic — starving (and with max_wait_s, expiring) the
    minority signature (review fix).  The remainder merges back by
    ARRIVAL time, so dispatch order stays global-FIFO:
    [A0,A1] -> [B] -> [A2], never [A0,A1] -> [A2] -> [B]."""
    eng = InferenceEngine(
        pipeline, batch_size=BATCH, batch_sizes=(2, BATCH),
        latent_size=LATENT, flush_ms=200.0, adaptive_flush=True,
    )
    order, entered, release = _blocked_dispatch_spy(eng)
    try:
        primer = eng.submit(_req(99))
        assert entered.wait(30)
        # worker parked mid-dispatch: load the queue in arrival order
        # A0, A1, B, A2 (B is a different program signature)
        futs = [eng.submit(_req(0)), eng.submit(_req(1)),
                eng.submit(_req(3, num_inference_steps=3)),
                eng.submit(_req(2))]
        release.set()
        primer.result(timeout=300)
        for f in futs:
            f.result(timeout=300)
        assert order == [
            ["prompt 99"],
            ["prompt 0", "prompt 1"],   # split-flush at the 2-boundary
            ["prompt 3"],               # earlier-arrived B rides next
            ["prompt 2"],               # the remainder follows FIFO
        ], order
    finally:
        release.set()
        eng.shutdown()


def test_post_idle_burst_fills_the_batch(pipeline):
    """A burst arriving after a long idle period must dispatch as ONE
    full batch: the stale idle-inflated EMA gap must neither chop it at
    a smaller shape boundary (requests already in the queue disprove the
    rate estimate) nor survive un-clamped into the next window's
    estimate (review fix)."""
    eng = InferenceEngine(
        pipeline, batch_size=BATCH, batch_sizes=(2, BATCH),
        latent_size=LATENT, flush_ms=200.0, adaptive_flush=True,
    )
    order, entered, release = _blocked_dispatch_spy(eng)
    try:
        primer = eng.submit(_req(99))
        assert entered.wait(30)
        with eng._lock:  # simulate: engine idle for an hour, stale EMA
            eng._ema_gap_s = 50.0
            eng._last_submit = time.monotonic() - 3600.0
        futs = [eng.submit(_req(i)) for i in range(BATCH)]
        with eng._lock:  # the idle gap entered the EMA clamped at flush_s
            assert eng._ema_gap_s < 50.0
        release.set()
        primer.result(timeout=300)
        for f in futs:
            f.result(timeout=300)
        assert [len(b) for b in order] == [1, BATCH], order
    finally:
        release.set()
        eng.shutdown()


def test_prewarm_timeout_bounds_a_hung_compile(pipeline):
    """prewarm(timeout=...) must raise TimeoutError instead of blocking
    forever when a dispatch hangs (the known axon-tunnel outage mode:
    backend calls block indefinitely) — scripts/serve.py passes
    --request-timeout here to bound server startup (review fix)."""
    eng = InferenceEngine(
        pipeline, batch_size=BATCH, latent_size=LATENT, flush_ms=150.0
    )
    release = threading.Event()

    def _hang(requests):
        release.wait(30)
        raise RuntimeError("abandoned prewarm dispatch")

    eng._dispatch = _hang
    try:
        t0 = time.monotonic()
        with pytest.raises(TimeoutError):
            eng.prewarm(_req(0), timeout=0.3)
        assert time.monotonic() - t0 < 10.0
    finally:
        release.set()
        eng.shutdown()


# -------------------------------------------------------- policy hot-reload
# VERDICT r4 task #2: the product loop trains a policy checkpoint every N
# steps (train_ppo.py:445-449) and inference loads it into the scheduler
# (gen_ppo.py:189-195); a resident engine must pick it up WITHOUT a restart
# (and without re-tracing: params are jit arguments).


def _fresh_policy_engine(policy_pipeline, **kw):
    import copy as _copy

    pipe = _copy.copy(policy_pipeline)  # engine swaps must not leak into
    return InferenceEngine(             # the module-scoped fixture
        pipe, batch_size=2, latent_size=LATENT, flush_ms=1.0, **kw
    )


def _biased_policy_params(fnet, hot: int = 7):
    """A policy tree whose mode actions PROVABLY differ from a fresh init:
    zero_init_head makes every fresh init emit all-zero logits (argmax
    index 0 per dim), so hot-reload tests need a head bias that moves the
    argmax to a different grid index."""
    import jax.numpy as jnp

    cfg = fnet.config
    params = jax.tree.map(lambda x: x, fnet.init(jax.random.key(99)))
    bias = np.zeros((cfg.action_dims, cfg.num_actions), np.float32)
    bias[:, hot] = 5.0
    params["params"]["head"]["bias"] = jnp.asarray(bias.reshape(-1))
    return params


def _save_factor_ckpt(dirpath, params, cfg):
    import dataclasses
    import os

    import orbax.checkpoint as ocp

    path = os.path.join(str(dirpath), "factor_net")
    ocp.PyTreeCheckpointer().save(path, params)
    with open(os.path.join(str(dirpath), "factor_net_config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f)
    return path


def test_hot_reload_swaps_policy_without_retrace(policy_pipeline, tmp_path):
    fnet = policy_pipeline.factor_net
    new_params = _biased_policy_params(fnet)
    ckpt = _save_factor_ckpt(tmp_path, new_params, fnet.config)

    eng = _fresh_policy_engine(policy_pipeline)
    try:
        req = _req(0, deterministic=True)
        golden_old = eng.generate(req, timeout=300)

        # gate the fetch so a batch is provably IN FLIGHT (dispatched, old
        # params captured as jit arguments) when the swap lands
        fetch_started, swap_done = threading.Event(), threading.Event()

        def gated_fetch(images, n):
            fetch_started.set()
            assert swap_done.wait(60)
            return InferenceEngine._fetch(images, n)

        eng._fetch = gated_fetch
        fut = eng.submit(req)
        assert fetch_started.wait(120)
        out = eng.load_factor_ckpt(ckpt)
        swap_done.set()
        inflight = fut.result(timeout=300)
        del eng._fetch  # restore the class staticmethod

        # the in-flight batch finished on the OLD policy
        np.testing.assert_array_equal(inflight, golden_old)
        assert out["factor_net_config"]["order_dim"] == fnet.config.order_dim

        # subsequent requests use the NEW policy...
        after = eng.generate(req, timeout=300)
        assert not np.array_equal(after, golden_old)
        # ...and match a fresh engine built directly on the new params
        import copy as _copy

        pipe2 = _copy.copy(policy_pipeline)
        pipe2.factor_params = new_params
        pipe2._denoise_cache = {}
        eng2 = InferenceEngine(pipe2, batch_size=2, latent_size=LATENT,
                               flush_ms=1.0)
        try:
            np.testing.assert_array_equal(
                after, eng2.generate(req, timeout=300)
            )
        finally:
            eng2.shutdown()

        # no re-trace: one program, one trace, across the whole sequence
        assert len(eng._programs) == 1
        prog = next(iter(eng._programs.values()))
        if hasattr(prog, "_cache_size"):
            assert prog._cache_size() == 1
    finally:
        eng.shutdown()


def test_hot_reload_rejects_mismatched_dims(policy_pipeline, tmp_path):
    import dataclasses

    from consolver_tpu.policy import FactorNet

    fnet = policy_pipeline.factor_net
    other_cfg = dataclasses.replace(fnet.config, num_actions=21)
    other = FactorNet(other_cfg)
    ckpt = _save_factor_ckpt(tmp_path, other.init(jax.random.key(1)),
                             other_cfg)
    eng = _fresh_policy_engine(policy_pipeline)
    try:
        with pytest.raises(ValueError, match="restart"):
            eng.load_factor_ckpt(ckpt)
        # shape-mismatched raw trees are rejected too
        with pytest.raises(ValueError, match="shape mismatch|tree mismatch"):
            eng.update_factor_params(other.init(jax.random.key(2)))
    finally:
        eng.shutdown()


def test_hot_reload_requires_a_policy(pipeline):
    eng = InferenceEngine(pipeline, batch_size=2, latent_size=LATENT,
                          flush_ms=1.0)
    try:
        with pytest.raises(ValueError, match="factor_params is None"):
            eng.update_factor_params({"x": np.zeros(3)})
    finally:
        eng.shutdown()


def test_admin_reload_endpoint(policy_pipeline, tmp_path):
    """POST /v1/admin/reload_factor end-to-end: 200 + the policy actually
    swaps; 409 on dim mismatch; 400 on a missing path."""
    import dataclasses
    import urllib.error

    from consolver_tpu.policy import FactorNet

    fnet = policy_pipeline.factor_net
    good = _save_factor_ckpt(tmp_path / "good",
                             _biased_policy_params(fnet), fnet.config)
    bad_cfg = dataclasses.replace(fnet.config, num_actions=21)
    bad = _save_factor_ckpt(tmp_path / "bad",
                            FactorNet(bad_cfg).init(jax.random.key(1)),
                            bad_cfg)

    eng = _fresh_policy_engine(policy_pipeline)
    server = make_server(eng, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address[:2]
    base = f"http://{host}:{port}"

    def post(payload, expect):
        req = urllib.request.Request(
            f"{base}/v1/admin/reload_factor",
            data=json.dumps(payload).encode(), method="POST",
        )
        try:
            with urllib.request.urlopen(req) as resp:
                assert resp.status == expect
                return json.loads(resp.read())
        except urllib.error.HTTPError as exc:
            assert exc.code == expect, exc.read()
            return json.loads(exc.read() or b"{}")

    try:
        probe = _req(0, deterministic=True)
        before = eng.generate(probe, timeout=300)
        out = post({"path": good}, 200)
        assert out["ok"] and out["engine"] == "generate"
        assert not np.array_equal(eng.generate(probe, timeout=300), before)
        post({"path": bad}, 409)
        post({}, 400)
        post({"path": good, "engine": "edit"}, 400)
    finally:
        server.shutdown()
        eng.shutdown()
