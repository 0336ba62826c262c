#!/usr/bin/env python
"""Single-chip FLUX-Kontext int4 (W4A16) serving probe.

The int8 path fits the 11.9B DiT in ~12.1GB (probe_flux_serving.py:
steady fwd 1368 ms at the 1024^2 Kontext shape, ~6.8 s per 5-step edit;
12GB host->device transfer took 174 s through the tunnel).  The packed
int4 path (FluxConfig.quant_int4, kernels/quant.py) halves the weight
bytes: this probe measures what that buys on a real chip.

MEASURED (v5e, 2026-08-19 — don't re-run without cause):
  1. 11.99B params = 6.56 GB packed (int8: 12.12 GB); transfer 12 s;
  2. b=1 steady fwd 1734 ms (~120 TFLOP/s effective) vs int8 1368 ms —
     int4 is 1.27x SLOWER (W4A16 computes at the bf16 MXU rate; the
     unpack+dequant prologue costs on top).  5-step edit ~= 8.7 s;
  3. BATCH 2 at 1024^2 FITS one chip (int8 cannot): 3316 ms/fwd =
     1658 ms/image — the best int4 per-image rate, still behind int8 b=1.

Run on the TPU chip:  python scripts/probe_int4_flux.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from consolver_tpu.models.flux import FluxConfig, FluxTransformer


def random_tree_like(shapes, seed=0):
    """Random host values per eval_shape leaf (throughput/memory probe —
    values don't matter): packed-int4 uint8 kernels get random bytes,
    int8 kernels random ints, float leaves small normals."""
    rng = np.random.default_rng(seed)
    leaves, treedef = jax.tree.flatten(shapes)
    out = []
    for s in leaves:
        if s.dtype == jnp.uint8:
            out.append(rng.integers(0, 256, s.shape, dtype=np.uint8))
        elif s.dtype == jnp.int8:
            out.append(rng.integers(-127, 128, s.shape, dtype=np.int8))
        else:
            out.append((rng.standard_normal(s.shape) * 0.02).astype(s.dtype))
    return jax.tree.unflatten(treedef, out)


def kontext_args(cfg, b):
    s_target = 4096            # 1024^2 -> 128^2 latents -> 64^2 packed tokens
    s_img = 2 * s_target       # + reference-image tokens (Kontext)
    s_txt = 512
    return (
        jnp.zeros((b, s_img, cfg.in_channels), jnp.bfloat16),
        jnp.zeros((b, s_txt, cfg.joint_text_dim), jnp.bfloat16),
        jnp.zeros((b, cfg.pooled_text_dim), jnp.bfloat16),
        jnp.ones((b,)),
        jnp.full((b,), 2.5),
        jnp.zeros((s_img, 3)),
        jnp.zeros((s_txt, 3)),
    ), s_img + s_txt


def main():
    cfg = FluxConfig(**{**FluxConfig.flux_kontext().__dict__, "quant_int4": True})
    model = FluxTransformer(cfg, dtype=jnp.bfloat16)
    args, tokens = kontext_args(cfg, b=1)

    shapes = jax.eval_shape(model.init, jax.random.key(0), *args)
    n_bytes = sum(
        int(np.prod(s.shape)) * s.dtype.itemsize for s in jax.tree.leaves(shapes)
    )
    # logical params: packed uint8 leaves hold 2 int4 weights per byte
    n_params = sum(
        int(np.prod(s.shape)) * (2 if s.dtype == jnp.uint8 else 1)
        for s in jax.tree.leaves(shapes)
    )
    print(f"flux_kontext int4: {n_params/1e9:.2f}B params, {n_bytes/1e9:.2f} GB "
          f"(int8 reference: 12.12 GB)", flush=True)

    t0 = time.perf_counter()
    params = random_tree_like(shapes)
    print(f"host params built in {time.perf_counter()-t0:.0f}s", flush=True)

    t0 = time.perf_counter()
    params = jax.device_put(params)
    jax.block_until_ready(params)
    print(f"host->device transfer: {time.perf_counter()-t0:.0f}s "
          f"(int8 measured 174s for 12GB)", flush=True)

    fwd = jax.jit(model.apply)
    t0 = time.perf_counter()
    out = fwd(params, *args)
    float(jnp.sum(out.astype(jnp.float32)))
    print(f"compile+1st fwd: {time.perf_counter()-t0:.0f}s", flush=True)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fwd(params, *args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    gflop = 2 * n_params * tokens / 1e9
    print(
        f"b=1 steady fwd: {best*1e3:.0f} ms (~{gflop/best/1e3:.0f} TFLOP/s "
        f"effective; int8 measured 1368 ms); 5-step edit ~= {5*best:.1f} s",
        flush=True,
    )
    try:
        stats = jax.local_devices()[0].memory_stats()
        print(f"HBM in use: {stats.get('bytes_in_use', 0)/1e9:.2f} GB "
              f"/ limit {stats.get('bytes_limit', 0)/1e9:.2f} GB", flush=True)
    except Exception:
        pass

    # --- batch 2 at the full Kontext shape (int8 cannot) ---
    try:
        args2, tokens2 = kontext_args(cfg, b=2)
        t0 = time.perf_counter()
        out = fwd(params, *args2)
        float(jnp.sum(out.astype(jnp.float32)))
        print(f"b=2 compile+1st fwd: {time.perf_counter()-t0:.0f}s", flush=True)
        best2 = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fwd(params, *args2)
            float(jnp.sum(out.astype(jnp.float32)))
            best2 = min(best2, time.perf_counter() - t0)
        print(f"b=2 steady fwd: {best2*1e3:.0f} ms "
              f"({best2/2*1e3:.0f} ms/image — vs {best*1e3:.0f} b=1)",
              flush=True)
    except Exception as e:  # RESOURCE_EXHAUSTED expected if it doesn't fit
        print(f"b=2 did not fit: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
