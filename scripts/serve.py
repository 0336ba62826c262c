#!/usr/bin/env python
"""Production serving CLI: resident micro-batching HTTP server.

  # text-to-image (SD family)
  python scripts/serve.py --pretrained ckpts/sd15 \
      [--factor-ckpt runs/ppo/checkpoint-3000] [--quantize] \
      [--port 8000] [--batch-size 8]

  # instructional editing (FLUX-Kontext family)
  python scripts/serve.py --family edit --pretrained ckpts/flux \
      [--factor-ckpt runs/edit/checkpoint-1000] [--quantize] \
      [--resolution 1024]

Runs the stack as a resident TPU program behind a batching queue
(consolver_tpu/serve): concurrent POST /v1/generate (or /v1/edit) requests
with the same (steps, cfg, solver) signature coalesce into one compiled
batch — the measured SD serving knee is batch 8 (int8 hybrid
8.3 img/s/chip); the int8 11.9B Kontext DiT fits ONE v5e chip at ~6.8 s
per 5-step 1024^2 edit (docs/SERVING.md).  --quantize flips the pipeline
to the W8A8 serving path (pipelines .quantize()).

The reference has no serving layer (its inference surfaces are gen_ppo.py's
script-level GPU thread pool, gen_ppo.py:446-462, and the edit drivers'
fork-per-GPU, edit_ppo/generate_ours.py:176-189) — this is deployment
surface beyond parity.  Smoke mode (no --pretrained) serves tiny random
models for integration testing:

  curl -s localhost:8000/healthz
  curl -s -X POST localhost:8000/v1/generate \
      -d '{"prompt": "a photo of a corgi", "seed": 7}'
  curl -s -X POST localhost:8000/v1/edit \
      -d "{\"instruction\": \"make it snow\", \"image_png_b64\": \"$(base64 -w0 in.png)\"}"
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def _serving_mesh(args):
    """--shard / --tp: one SPMD program over a mesh of all visible devices.

    --shard alone = 1-D data mesh over all chips (batch sharded, params
    replicated).  --tp N adds a model axis of size N (denoiser
    tensor-shards by the dist/tp Megatron rules — the bf16 >=2-chip FLUX
    deployment); WITHOUT --shard it uses exactly N chips (data axis 1),
    WITH --shard the remaining chips form the data axis and --batch-size
    means PER-DATA-SHARD batch."""
    tp = getattr(args, "tp", 1) or 1
    if not (args.shard or tp > 1):
        return None
    from consolver_tpu.dist.mesh import DATA_AXIS, MODEL_AXIS, make_mesh

    ndev = jax.device_count()
    if ndev % tp:
        raise SystemExit(f"--tp {tp} must divide device count {ndev}")
    if tp > 1:
        dp = ndev // tp if args.shard else 1
        return make_mesh(num_devices=dp * tp, axis_shape=(dp, tp),
                         axis_names=(DATA_AXIS, MODEL_AXIS))
    return make_mesh()


def _replica_count(args) -> int:
    """--replicas N: N independent single-chip engines (full param copy +
    own programs per chip, least-loaded dispatch) — the third multi-chip
    mode next to --shard (one SPMD batch-sharded program) and --tp
    (tensor-sharded denoiser).  0 = off."""
    n = getattr(args, "replicas", 0) or 0
    if n <= 1:
        return 0
    if args.shard or (getattr(args, "tp", 1) or 1) > 1:
        raise SystemExit("--replicas is mutually exclusive with "
                         "--shard/--tp (pick one multi-chip mode)")
    ndev = jax.device_count()
    if n > ndev:
        raise SystemExit(f"--replicas {n} > {ndev} visible devices")
    return n


def _data_shards(mesh) -> int:
    if mesh is None:
        return 1
    from consolver_tpu.dist.mesh import data_axis_size

    return data_axis_size(mesh)


def _batch_kwargs(args, shards: int = 1) -> dict:
    """--batch-sizes / --adaptive-flush -> engine kwargs (sizes are
    PER DATA SHARD, like --batch-size)."""
    out = {"adaptive_flush": bool(getattr(args, "adaptive_flush", False))}
    raw = getattr(args, "batch_sizes", None)
    if raw:
        out["batch_sizes"] = tuple(
            int(s) * shards for s in str(raw).split(",")
        )
    return out


def build_t2i_engine(args):
    from consolver_tpu.configs.config import ExperimentConfig, apply_overrides
    from consolver_tpu.policy import FactorNet
    from consolver_tpu.serve import InferenceEngine
    from scripts.train_sd15 import build_pipeline, load_factor_ckpt

    cfg = ExperimentConfig.sd15_ppo()
    if args.pretrained:
        cfg = apply_overrides(cfg, {"model.pretrained_path": args.pretrained})

    fcfg = cfg.factor_net
    if args.factor_ckpt:
        fcfg, fparams = load_factor_ckpt(args.factor_ckpt, fcfg)
        fnet = FactorNet(fcfg)
    else:
        fnet = FactorNet(fcfg)
        fparams = fnet.init(jax.random.key(0))
    pipe = build_pipeline(cfg, fnet, fparams)
    if args.quantize:
        if args.quantize_bits != 8:
            raise SystemExit("--quantize-bits 4 is an edit-family option "
                             "(the SD UNet is conv-dominated; int4 packing "
                             "covers the FLUX DiT projections)")
        print("serving the int8 W8A8 path (.quantize())", flush=True)
        pipe = pipe.quantize()

    latent = args.latent_size or (64 if args.pretrained else 8)
    replicas = _replica_count(args)
    if replicas:
        from consolver_tpu.serve.engine import make_replicas

        per = args.batch_size if args.batch_size is not None else 8
        return make_replicas(
            pipe, InferenceEngine, replicas, batch_size=per,
            latent_size=latent, flush_ms=args.flush_ms,
            max_wait_s=getattr(args, "max_wait_s", None),
            padded_max_steps=args.padded_max_steps,
            **_batch_kwargs(args),
        ), f"generate replicas={replicas} batch={per}/replica latent={latent}"
    mesh = _serving_mesh(args)
    per_shard = args.batch_size if args.batch_size is not None else 8
    batch = per_shard * _data_shards(mesh)
    return InferenceEngine(
        pipe, batch_size=batch, latent_size=latent, flush_ms=args.flush_ms,
        max_wait_s=getattr(args, "max_wait_s", None),
        mesh=mesh, padded_max_steps=args.padded_max_steps,
        **_batch_kwargs(args, _data_shards(mesh)),
    ), f"generate batch={batch} latent={latent}" + (
        f" mesh={dict(mesh.shape)}" if mesh is not None else ""
    )


def build_edit_engine(args):
    from consolver_tpu.configs.config import ExperimentConfig, apply_overrides
    from consolver_tpu.data.tokenizer import load_tokenizer
    from consolver_tpu.policy import FactorNet
    from consolver_tpu.serve import EditInferenceEngine
    from scripts.train_flux import build_pipeline
    from scripts.train_sd15 import load_factor_ckpt

    cfg = ExperimentConfig.flux_ppo()
    if args.pretrained:
        cfg = apply_overrides(cfg, {"model.pretrained_path": args.pretrained})

    fcfg = cfg.factor_net
    if args.factor_ckpt:
        fcfg, fparams = load_factor_ckpt(args.factor_ckpt, fcfg)
        fnet = FactorNet(fcfg)
    else:
        fnet = FactorNet(fcfg)
        fparams = fnet.init(jax.random.key(0))
    pipe = build_pipeline(cfg, fnet, fparams)
    tcfg = pipe.transformer.cfg
    if args.quantize and not (tcfg.quant_int8 or tcfg.quant_int4):
        print(f"serving the int{args.quantize_bits} path (.quantize())",
              flush=True)
        pipe = pipe.quantize(bits=args.quantize_bits)

    # real tokenizer dirs ride inside converted checkpoints
    # (convert_checkpoints.py / quantize_checkpoint.py copy them through)
    t5_tok = load_tokenizer(
        os.path.join(args.pretrained, "tokenizer_t5") if args.pretrained else None,
        kind="t5", max_length=args.t5_max_length,
    )
    clip_tok = load_tokenizer(
        os.path.join(args.pretrained, "tokenizer") if args.pretrained else None,
        kind="clip", max_length=77,
    )
    resolution = args.resolution or (1024 if args.pretrained else 16)
    edit_kwargs = dict(
        resolution=resolution,
        t5_tokenizer=t5_tok, clip_tokenizer=clip_tok,
        t5_max_length=args.t5_max_length,
        clip_max_length=4 if not args.pretrained else 77,
        flush_ms=args.flush_ms,
        max_wait_s=getattr(args, "max_wait_s", None),
        padded_max_steps=args.padded_max_steps,
    )
    replicas = _replica_count(args)
    if replicas:
        from consolver_tpu.serve.engine import make_replicas

        per = args.batch_size if args.batch_size is not None else 1
        return make_replicas(
            pipe, EditInferenceEngine, replicas, batch_size=per,
            **edit_kwargs, **_batch_kwargs(args),
        ), f"edit replicas={replicas} batch={per}/replica resolution={resolution}"
    mesh = _serving_mesh(args)
    per_shard = args.batch_size if args.batch_size is not None else 1
    batch = per_shard * _data_shards(mesh)
    return EditInferenceEngine(
        pipe, batch_size=batch, mesh=mesh, **edit_kwargs,
        **_batch_kwargs(args, _data_shards(mesh)),
    ), f"edit batch={batch} resolution={resolution}" + (
        f" mesh={dict(mesh.shape)}" if mesh is not None else ""
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=("sd", "edit", "both"), default="sd",
                    help="sd = /v1/generate (SD-1.5 class); "
                         "edit = /v1/edit (FLUX-Kontext); both = the two "
                         "engines in one process (each owns its programs; "
                         "--pretrained then points at the SD checkpoint and "
                         "--edit-pretrained at the FLUX one)")
    ap.add_argument("--edit-pretrained", default=None,
                    help="[both] FLUX checkpoint dir (smoke models if unset)")
    ap.add_argument("--pretrained", default=None)
    ap.add_argument("--factor-ckpt", default=None)
    ap.add_argument("--quantize", action="store_true",
                    help="serve the W8A8 int8 path (pipeline.quantize())")
    ap.add_argument("--quantize-bits", type=int, default=8, choices=(4, 8),
                    help="with --quantize on the edit family: 8 = W8A8 int8 "
                         "(speed), 4 = packed int4 DiT weights (memory — "
                         "~6.3GB vs 12GB, bf16-rate compute)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--batch-size", type=int, default=None,
                    help="compiled batch dim (default: 8 sd, 1 edit); "
                         "PER CHIP when --shard is set")
    ap.add_argument("--shard", action="store_true",
                    help="serve one SPMD program over a data mesh of all "
                         "visible chips (params replicated, batch sharded); "
                         "throughput scales with the mesh")
    ap.add_argument("--replicas", type=int, default=0,
                    help="serve N independent single-chip replicas (full "
                         "param copy + own compiled programs per chip, "
                         "least-loaded dispatch) instead of one SPMD "
                         "program; best under ragged/program-diverse load. "
                         "Mutually exclusive with --shard/--tp")
    ap.add_argument("--tp", type=int, default=1,
                    help="model-axis size: tensor-shard the denoiser over "
                         "this many chips (dist/tp Megatron rules); the "
                         "remaining chips form the data axis.  The bf16 "
                         "11.9B Kontext deployment is --family edit --tp 2")
    ap.add_argument("--latent-size", type=int, default=None,
                    help="[sd] latent H=W (default: 64 with --pretrained, 8 smoke)")
    ap.add_argument("--resolution", type=int, default=None,
                    help="[edit] pinned image H=W (default: 1024 with "
                         "--pretrained, 16 smoke)")
    ap.add_argument("--t5-max-length", type=int, default=128)
    ap.add_argument("--padded-max-steps", type=int, default=None,
                    help="serve ANY step count in [1, N] from one "
                         "pad-to-max compiled program (learnable-solver "
                         "requests; each batch then costs N denoiser "
                         "forwards)")
    ap.add_argument("--prewarm", nargs="*", type=int, metavar="STEPS",
                    default=None,
                    help="compile the serving program(s) BEFORE binding the "
                         "port: bare --prewarm warms the family's default "
                         "step count; --prewarm 5 8 warms one program per "
                         "listed step count (remote TPU compiles run "
                         "~1-3 min each, so the first request would "
                         "otherwise eat them)")
    ap.add_argument("--flush-ms", type=float, default=30.0,
                    help="partial-batch flush window; with --adaptive-flush "
                         "this is the CAP (latency budget) — pass something "
                         "generous like 500-1000")
    ap.add_argument("--batch-sizes", default=None,
                    help="comma-separated extra compiled batch shapes per "
                         "data shard (e.g. '4,8'): partial batches pad to "
                         "the smallest listed size that fits instead of "
                         "always the full batch — cuts pad waste at "
                         "sub-saturating load.  Overrides --batch-size "
                         "(the max listed size is the compiled maximum)")
    ap.add_argument("--adaptive-flush", action="store_true",
                    help="scale the flush window with the observed arrival "
                         "rate (EMA inter-arrival gap), capped at "
                         "--flush-ms, and keep filling while the device "
                         "pipeline is already full")
    ap.add_argument("--max-wait-s", type=float, default=None,
                    help="queue deadline: requests still waiting this long "
                         "when a batch forms are failed 503 (shed) instead "
                         "of served stale; default = never expire")
    ap.add_argument(
        "--prewarm-refine", dest="prewarm_refine", action="store_true",
        help="also compile the refine teacher program(s) during --prewarm: "
             "/v1/refine (40-step multistep-DPM) on the sd engine and/or "
             "/v1/edit/refine (28-step Euler FM, cfg 2.5) on the edit engine")
    ap.add_argument("--request-timeout", type=float, default=600.0,
                    help="per-request ceiling; first request of a new "
                         "(steps, cfg, solver) signature pays the remote "
                         "TPU compile (~1-3 min)")
    ap.add_argument("--compile-cache", default=".jax_serve_cache",
                    help="persistent XLA compilation cache dir so server "
                         "RESTARTS reload executables instead of "
                         "recompiling ('' disables)")
    args = ap.parse_args()
    if args.compile_cache:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(args.compile_cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    server, engines, descs = build_server(args)
    install_sigterm_handler()
    host, port = server.server_address[:2]
    print(f"serving on http://{host}:{port}  "
          f"({'; '.join(descs)}, devices={jax.device_count()})", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        for eng in engines:
            eng.shutdown()


def install_sigterm_handler():
    """Route SIGTERM (the orchestrator stop signal — k8s, systemd, docker
    stop) through the same graceful drain as Ctrl-C: without this a TERM
    kills the process mid-batch and in-flight requests are dropped instead
    of completing through engine.shutdown()'s pending-drain."""
    import signal

    def _term(_signum, _frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _term)


def build_server(args):
    """Assemble engines + HTTP server from parsed CLI args (separated from
    main() so tests can drive the exact CLI wiring in-process).  Returns
    (server, engines, descriptions)."""
    from consolver_tpu.serve import make_server

    t2i_engine = edit_engine = None
    descs = []
    if args.family in ("sd", "both"):
        t2i_engine, d = build_t2i_engine(args)
        descs.append(d)
    if args.family in ("edit", "both"):
        edit_args = args
        if args.family == "both":
            edit_args = argparse.Namespace(
                **{**vars(args), "pretrained": args.edit_pretrained}
            )
        edit_engine, d = build_edit_engine(edit_args)
        descs.append(d)

    if args.prewarm is not None:
        import numpy as np
        import time as _time

        from consolver_tpu.serve import EditRequest, GenerationRequest

        # (engine, request, expandable): --prewarm STEPS only re-steps the
        # expandable defaults — the refine signature keeps its own count
        reqs = []
        if t2i_engine is not None:
            reqs.append((t2i_engine, GenerationRequest(prompt="prewarm"),
                         True))
            if getattr(args, "prewarm_refine", False):
                from consolver_tpu.serve.http import REFINE_DEFAULTS

                reqs.append((t2i_engine, GenerationRequest(
                    prompt="prewarm", **REFINE_DEFAULTS), False))
        if edit_engine is not None:
            gray = np.full(
                (edit_engine.resolution, edit_engine.resolution, 3), 127,
                np.uint8,
            )
            reqs.append(
                (edit_engine, EditRequest(instruction="prewarm", image=gray),
                 True)
            )
            if getattr(args, "prewarm_refine", False):
                from consolver_tpu.serve.http import EDIT_REFINE_DEFAULTS

                reqs.append((edit_engine, EditRequest(
                    instruction="prewarm", image=gray,
                    **EDIT_REFINE_DEFAULTS), False))
        t0 = _time.monotonic()
        n = 0
        for eng, req, expandable in reqs:
            warm = [req]
            if args.prewarm and expandable:
                warm = [dataclasses.replace(req, num_inference_steps=s)
                        for s in args.prewarm]
            n += eng.prewarm(*warm, timeout=args.request_timeout)
        print(f"prewarmed {n} program(s) in "
              f"{_time.monotonic() - t0:.1f}s", flush=True)

    server = make_server(t2i_engine, host=args.host, port=args.port,
                         request_timeout=args.request_timeout,
                         edit_engine=edit_engine)
    engines = [e for e in (t2i_engine, edit_engine) if e is not None]
    return server, engines, descs


if __name__ == "__main__":
    main()
