#!/usr/bin/env python
"""TPU probe: int8 QK/PV attention (kernels/quant.int8_attention) vs XLA
bf16 fused attention at the SD-1.5 UNet hot shapes.  The 64^2 self-attention
(d=40) runs at ~80% of its lane-padded bf16 bound (CLAUDE.md xplane notes);
int8 doubles the per-lane MXU rate, so the bound doubles — this measures
how much survives the quant/softmax overhead."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from consolver_tpu.kernels.attention import xla_attention
from consolver_tpu.kernels.quant import int8_attention


def timed(fn, args, n_iter=50, reps=3):
    @jax.jit
    def chain(q, k, v):
        def body(i, q):
            o = fn(q, k, v)
            return (o * 0.5 + q * 0.5).astype(q.dtype)

        return jax.lax.fori_loop(0, n_iter, body, q)

    out = chain(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = chain(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best / n_iter


def main():
    shapes = [
        ("sd self  64^2 d40", (16, 4096, 8, 40), (16, 4096, 8, 40)),
        ("sd self  32^2 d80", (16, 1024, 8, 80), (16, 1024, 8, 80)),
        ("sd cross 64^2 d40", (16, 4096, 8, 40), (16, 77, 8, 40)),
    ]
    for name, qshape, kshape in shapes:
        q = jax.random.normal(jax.random.key(0), qshape, jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), kshape, jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), kshape, jnp.bfloat16)
        b, sq, h, d = qshape
        sk = kshape[1]
        gflop = 2 * 2 * b * h * sq * sk * d / 1e9
        t_bf16 = timed(xla_attention, (q, k, v))
        t_int8 = timed(int8_attention, (q, k, v))
        print(
            f"{name}: bf16 {t_bf16*1e3:.2f} ms ({gflop/t_bf16/1e3:.0f} TF/s)  "
            f"int8 {t_int8*1e3:.2f} ms ({gflop/t_int8/1e3:.0f} TOP/s)  "
            f"speedup {t_bf16/t_int8:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
