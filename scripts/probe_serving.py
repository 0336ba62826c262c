#!/usr/bin/env python
"""Measure the serving engine under load: throughput + latency percentiles.

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_serving.py \
      [--quantize] [--batch-size 8] [--steps 8] [--requests 64] \
      [--arrival-rate 10] [--latent-size 64] [--seconds 0]

Drives the resident micro-batching engine (consolver_tpu/serve) with
Poisson arrivals at --arrival-rate req/s and reports img/s plus
queue-wait / end-to-end latency percentiles from the engine's own stats.
This is the ENGINE-level companion to bench.py (which times the raw
pipeline): the delta between the two is the batching/queueing overhead.

Smoke mode (default, tiny random models) validates the harness anywhere;
on the real chip pass --quantize --latent-size 64 to reproduce the bench
configuration behind the queue (int8 hybrid, batch 8, 512^2).

The reference has no serving layer to compare against (gen_ppo.py's
thread pool is offline batch generation, gen_ppo.py:446-462).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrained", default=None)
    ap.add_argument("--quantize", action="store_true")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--latent-size", type=int, default=None,
                    help="default: 64 with --pretrained/--quantize, 8 smoke")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--guidance-scale", type=float, default=3.0)
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--arrival-rate", type=float, default=10.0,
                    help="Poisson arrivals per second; 0 = submit all at once")
    ap.add_argument("--deterministic", action="store_true")
    ap.add_argument("--verify-determinism", action="store_true",
                    help="before the load run: assert a deterministic "
                         "request is bit-equal solo vs inside a mixed batch")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from consolver_tpu.serve import GenerationRequest, InferenceEngine
    from scripts.serve import build_t2i_engine

    ns = argparse.Namespace(
        pretrained=args.pretrained, factor_ckpt=None, quantize=args.quantize,
        batch_size=args.batch_size, latent_size=args.latent_size
        or (64 if (args.pretrained or args.quantize) else 8),
        flush_ms=30.0, shard=False, tp=1, padded_max_steps=None,
    )
    engine, desc = build_t2i_engine(ns)
    assert isinstance(engine, InferenceEngine)
    print(f"engine: {desc}  devices={jax.device_count()}", flush=True)

    def req(i):
        return GenerationRequest(
            prompt=f"probe prompt {i % 16}", seed=args.seed + i,
            num_inference_steps=args.steps,
            guidance_scale=args.guidance_scale,
            deterministic=args.deterministic,
        )

    # warm the program outside the measurement
    t0 = time.monotonic()
    engine.prewarm(req(0), timeout=1800)
    print(f"prewarm {time.monotonic() - t0:.1f}s", flush=True)

    if args.verify_determinism:
        # The policy's mode-action path must make a request's output a pure
        # function of (prompt, seed, program) — independent of which batch
        # slot it lands in and of the other requests sharing the batch
        # (tests/test_serve.py proves this on the CPU mesh; this replays it
        # on the real chip, where the flash-attention kernel + bf16 MXU
        # numerics differ from the CPU backend).
        probe = GenerationRequest(
            prompt="determinism probe", seed=args.seed + 777,
            num_inference_steps=args.steps,
            guidance_scale=args.guidance_scale, deterministic=True,
        )
        solo = engine.generate(probe, timeout=1800)
        # fillers must be deterministic too — sampled and deterministic
        # requests never share a batch (engine program forking)
        fillers = [
            GenerationRequest(
                prompt=f"filler {i}", seed=args.seed + i,
                num_inference_steps=args.steps,
                guidance_scale=args.guidance_scale, deterministic=True,
            )
            for i in range(args.batch_size - 1)
        ]
        runs = [("solo-repeat", [probe]), ("mixed-batch", fillers + [probe])]
        for name, batch in runs:
            futs = [engine.submit(r) for r in batch]
            outs = [f.result(timeout=1800) for f in futs]
            got = outs[-1]
            ok = got.shape == solo.shape and (got == solo).all()
            print(f"determinism[{name}]: {'BIT-EQUAL' if ok else 'MISMATCH'}"
                  + ("" if ok else f"  max|d|={np.abs(got.astype(np.int32) - solo.astype(np.int32)).max()}"),
                  flush=True)
            if not ok:
                engine.shutdown()
                sys.exit(1)

    rng = np.random.default_rng(args.seed)
    futs = []
    t_start = time.monotonic()
    lat_t0 = {}
    for i in range(args.requests):
        if args.arrival_rate > 0 and i:
            time.sleep(float(rng.exponential(1.0 / args.arrival_rate)))
        lat_t0[i] = time.monotonic()
        futs.append((i, engine.submit(req(i))))
    e2e = []
    for i, f in futs:
        f.result(timeout=1800)
        e2e.append((time.monotonic() - lat_t0[i]) * 1e3)
    elapsed = time.monotonic() - t_start

    s = engine.stats()
    e2e = np.sort(e2e)
    out = {
        "requests": args.requests,
        "elapsed_s": round(elapsed, 2),
        "throughput_img_s": round(args.requests / elapsed, 3),
        "occupancy": round(s["mean_batch_occupancy"], 3),
        "batches": s["batches"],
        "queue_wait_ms_p50": s.get("queue_wait_ms_p50"),
        "queue_wait_ms_p95": s.get("queue_wait_ms_p95"),
        "execute_ms_p50": s.get("execute_ms_p50"),
        "e2e_ms_p50": round(float(e2e[len(e2e) // 2]), 1),
        "e2e_ms_p95": round(float(e2e[int(len(e2e) * 0.95)]), 1),
    }
    import json

    print(json.dumps(out))
    engine.shutdown()


if __name__ == "__main__":
    main()
