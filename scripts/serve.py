#!/usr/bin/env python
"""Production serving CLI: resident micro-batching HTTP server.

  python scripts/serve.py --pretrained ckpts/sd15 \
      [--factor-ckpt runs/ppo/checkpoint-3000] [--quantize] \
      [--port 8000] [--batch-size 8]

Runs the SD stack as a resident TPU program behind a batching queue
(consolver_tpu/serve): concurrent POST /v1/generate requests with the same
(steps, cfg, solver) signature coalesce into one compiled batch — the
measured serving knee is batch 8 (int8 hybrid 8.3 img/s/chip).  --quantize
flips the pipeline to the W8A8 serving path (pipelines .quantize()).

The reference has no serving layer (its inference surface is gen_ppo.py's
script-level GPU thread pool, gen_ppo.py:446-462) — this is deployment
surface beyond parity.  Smoke mode (no --pretrained) serves tiny random
models for integration testing:

  curl -s localhost:8000/healthz
  curl -s -X POST localhost:8000/v1/generate \
      -d '{"prompt": "a photo of a corgi", "seed": 7}'
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrained", default=None)
    ap.add_argument("--factor-ckpt", default=None)
    ap.add_argument("--quantize", action="store_true",
                    help="serve the W8A8 int8 path (pipeline.quantize())")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--latent-size", type=int, default=None,
                    help="latent H=W (default: 64 with --pretrained, 8 smoke)")
    ap.add_argument("--flush-ms", type=float, default=30.0)
    ap.add_argument("--request-timeout", type=float, default=600.0,
                    help="per-request ceiling; first request of a new "
                         "(steps, cfg, solver) signature pays the remote "
                         "TPU compile (~1-3 min)")
    args = ap.parse_args()

    from consolver_tpu.configs.config import ExperimentConfig, apply_overrides
    from consolver_tpu.policy import FactorNet
    from consolver_tpu.serve import InferenceEngine, make_server
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
        print("serving the int8 W8A8 path (.quantize())", flush=True)
        pipe = pipe.quantize()

    latent = args.latent_size or (64 if args.pretrained else 8)
    engine = InferenceEngine(
        pipe, batch_size=args.batch_size, latent_size=latent,
        flush_ms=args.flush_ms,
    )
    server = make_server(engine, host=args.host, port=args.port,
                         request_timeout=args.request_timeout)
    host, port = server.server_address[:2]
    print(f"serving on http://{host}:{port}  "
          f"(batch={args.batch_size}, latent={latent}, "
          f"devices={jax.device_count()})", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        engine.shutdown()


if __name__ == "__main__":
    main()
