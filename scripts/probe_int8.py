#!/usr/bin/env python
"""TPU probe: does an int8 conv/matmul (W8A8, int32 accumulate) actually run
~2x the bf16 rate through XLA on this chip?  Decides whether the int8
preview path is worth building (VERDICT r1 item 2: v5e int8 peak = 2x bf16).

Timing per CLAUDE.md rules for the tunneled TPU: N dependent iterations
chained INSIDE one jit (content-caching defeats repeated identical calls),
synchronized by a host read, with the ~29 ms RPC baseline measured and
subtracted.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

DN = ("NHWC", "HWIO", "NHWC")


def timed(fn, *args, reps=3):
    out = fn(*args)  # compile
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best


def rpc_baseline():
    @jax.jit
    def tiny(x):
        return x + 1

    x = jnp.zeros((8, 128))
    return timed(tiny, x, reps=5)


def main():
    n_iter = 100
    b, h, w, c = 16, 32, 32, 640
    conv_gflop = 2 * b * h * w * c * (9 * c) / 1e9

    # -- bf16 conv chain --
    kw_bf16 = jax.random.normal(jax.random.key(0), (3, 3, c, c), jnp.bfloat16) * 0.02

    @jax.jit
    def conv_bf16(x, kern):
        def body(i, x):
            y = jax.lax.conv_general_dilated(
                x, kern, (1, 1), "SAME", dimension_numbers=DN,
                preferred_element_type=jnp.float32,
            )
            return (y * (1.0 / 8.0)).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, n_iter, body, x)

    # -- int8 conv chain (dynamic per-tensor activation requant each step) --
    kw_i8 = jnp.clip(
        jax.random.normal(jax.random.key(1), (3, 3, c, c)) * 40, -127, 127
    ).astype(jnp.int8)

    @jax.jit
    def conv_i8(x, kern):
        def body(i, x):
            y = jax.lax.conv_general_dilated(
                x, kern, (1, 1), "SAME", dimension_numbers=DN,
                preferred_element_type=jnp.int32,
            )
            yf = y.astype(jnp.float32)
            scale = 127.0 / (jnp.max(jnp.abs(yf)) + 1e-6)
            return jnp.round(yf * scale).astype(jnp.int8)

        return jax.lax.fori_loop(0, n_iter, body, x)

    # -- bf16 vs int8 matmul chain --
    m = kdim = n = 4096
    mm_gflop = 2 * m * kdim * n / 1e9
    w_bf16 = jax.random.normal(jax.random.key(2), (kdim, n), jnp.bfloat16) * 0.02
    w_i8 = jnp.clip(
        jax.random.normal(jax.random.key(3), (kdim, n)) * 40, -127, 127
    ).astype(jnp.int8)

    @jax.jit
    def mm_bf16(x, kern):
        def body(i, x):
            y = jnp.dot(x, kern, preferred_element_type=jnp.float32)
            return (y * (1.0 / 8.0)).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, n_iter, body, x)

    @jax.jit
    def mm_i8(x, kern):
        def body(i, x):
            y = jax.lax.dot_general(
                x, kern, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            yf = y.astype(jnp.float32)
            scale = 127.0 / (jnp.max(jnp.abs(yf)) + 1e-6)
            return jnp.round(yf * scale).astype(jnp.int8)

        return jax.lax.fori_loop(0, n_iter, body, x)

    base = rpc_baseline()
    print(f"rpc baseline: {base*1e3:.1f} ms", flush=True)

    x_bf16 = jax.random.normal(jax.random.key(4), (b, h, w, c), jnp.bfloat16)
    t = timed(conv_bf16, x_bf16, kw_bf16) - base
    print(f"conv bf16: {t/n_iter*1e3:.3f} ms/iter  {conv_gflop/(t/n_iter)/1e3:.1f} TFLOP/s", flush=True)

    x_i8 = jnp.clip(jax.random.normal(jax.random.key(5), (b, h, w, c)) * 40, -127, 127).astype(jnp.int8)
    t = timed(conv_i8, x_i8, kw_i8) - base
    print(f"conv int8: {t/n_iter*1e3:.3f} ms/iter  {conv_gflop/(t/n_iter)/1e3:.1f} TOP/s", flush=True)

    xm_bf16 = jax.random.normal(jax.random.key(6), (m, kdim), jnp.bfloat16)
    t = timed(mm_bf16, xm_bf16, w_bf16) - base
    print(f"matmul bf16: {t/n_iter*1e3:.3f} ms/iter  {mm_gflop/(t/n_iter)/1e3:.1f} TFLOP/s", flush=True)

    xm_i8 = jnp.clip(jax.random.normal(jax.random.key(7), (m, kdim)) * 40, -127, 127).astype(jnp.int8)
    t = timed(mm_i8, xm_i8, w_i8) - base
    print(f"matmul int8: {t/n_iter*1e3:.3f} ms/iter  {mm_gflop/(t/n_iter)/1e3:.1f} TOP/s", flush=True)


if __name__ == "__main__":
    main()
