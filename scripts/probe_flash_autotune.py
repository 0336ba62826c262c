#!/usr/bin/env python
"""Flash-attention block autotune at the two measured Kontext shapes
(VERDICT r3 Weak #4 / next-round #6): sweep (block_q, block_k) of
kernels/flash_attention.flash_attention on the real chip.

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_flash_autotune.py

Shapes (scripts/probe_flash_variants.py): serve 1024^2 Kontext
1x8704x24x128 (103.9 TF/s at the default 512/512) and train 512^2 b8
8x2560x24x128.  block_q candidates stick to divisors of the padded seq
where possible (8704 = 68*128; 2560 = 20*128) — non-divisors pay padded
rows.  The kernel holds the whole KV in VMEM per grid row, so block_k is
purely the inner-loop tile.

Prior measured dead ends (do NOT retry): bf16-dot inputs (bit-identical,
+1%), int8 QK/PV (0.71x), no-mask specialization (+1.6%).

MEASURED (v5e, 2026-08-19) — the sweep + an n_iter=20 head-to-head
(docs/ROADMAP.md): the default (512, 512) is at the practical optimum at
both shapes; (256, 512) is within noise at the serve shape (103.6 vs
102.9 TF/s) and behind at the train shape (87.3 vs 88.6).  NOTE the
n_iter=10 sweep mis-ranks near-equal configs — per-dispatch tunnel
overhead (~0.9 ms/iter at n_iter=10) swamps <10% kernel deltas; rank
candidates coarsely here, then confirm winners at timed_chain's default
n_iter=20.
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from consolver_tpu.kernels.flash_attention import flash_attention
from scripts.probe_flash_variants import timed_chain


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(".jax_serve_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    shapes = [
        ("serve_1024_kontext", (1, 8704, 24, 128)),
        ("train_512_b8", (8, 2560, 24, 128)),
    ]
    bq_cands = {
        "serve_1024_kontext": [256, 512, 1024, 2176],
        "train_512_b8": [256, 512, 640, 1280],
    }
    bk_cands = [256, 512, 1024, 2048]

    results = {}
    for sname, (b, s, h, d) in shapes:
        q = jax.random.normal(jax.random.key(3), (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(4), (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(5), (b, s, h, d), jnp.bfloat16)
        gflop = 4 * b * h * s * s * d / 1e9
        best = (None, 0.0)
        for bq in bq_cands[sname]:
            for bk in bk_cands:
                if bk > s or bq > s:
                    continue
                fn = functools.partial(flash_attention, block_q=bq, block_k=bk)
                try:
                    dt = timed_chain(fn, q, k, v, n_iter=10)
                except Exception as e:
                    print(f"{sname} bq={bq} bk={bk}: FAILED {type(e).__name__}",
                          flush=True)
                    continue
                tfs = gflop / dt / 1e3
                results[f"{sname}/bq{bq}_bk{bk}"] = round(tfs, 1)
                print(f"{sname} bq={bq} bk={bk}: {dt*1e3:.2f} ms  "
                      f"{tfs:.1f} TF/s", flush=True)
                if tfs > best[1]:
                    best = ((bq, bk), tfs)
        print(f"BEST {sname}: bq,bk={best[0]}  {best[1]:.1f} TF/s", flush=True)
        results[f"{sname}/best"] = {"block": best[0], "tflops": best[1]}
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
