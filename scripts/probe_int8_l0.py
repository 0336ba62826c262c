#!/usr/bin/env python
"""TPU probe: can ANY int8 formulation beat bf16 at the SD UNet's level-0
conv shape (8x64x64x320, 3x3), where the direct int8 conv measured SLOWER
than bf16 (probe_requant.py: 129 vs 167 T/s static-scale)?

Variants (all static activation scale, chained N in-jit iterations):
  bf16      : bf16 conv baseline
  int8_conv : direct int8 conv (the production kernels/quant.int8_conv core)
  int8_gemm : im2col patches + int8 matmul (dot_general, int32 accum) —
              tests whether the conv lowering (not the MXU) is the problem
  int8_pad  : direct int8 conv with channels zero-padded 320 -> 384
              (3x128 lanes) — tests a channel-tiling pathology
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scripts._probe_util import rpc_baseline, timed

DN = ("NHWC", "HWIO", "NHWC")
N_ITER = 100
B, H, W, C = 8, 64, 64, 320
CP = 384  # padded channels


def main():
    print("platform:", jax.devices()[0].platform)
    conv_gflop = 2 * B * H * W * C * (9 * C) / 1e9
    kern_f = jax.random.normal(jax.random.key(0), (3, 3, C, C)) * 0.02
    kern_bf16 = kern_f.astype(jnp.bfloat16)
    kern_q = jnp.clip(jnp.round(kern_f / 2e-4), -127, 127).astype(jnp.int8)
    w_scale = 2e-4
    a_scale = 0.05
    # padded kernel: extra input rows AND output cols are zero
    kern_pad = jnp.zeros((3, 3, CP, CP), jnp.int8)
    kern_pad = kern_pad.at[:, :, :C, :C].set(kern_q)
    x0 = jax.random.normal(jax.random.key(1), (B, H, W, C), jnp.bfloat16)

    @jax.jit
    def chain_bf16(x):
        def body(i, x):
            y = jax.lax.conv_general_dilated(
                x, kern_bf16, (1, 1), "SAME", dimension_numbers=DN,
                preferred_element_type=jnp.float32,
            )
            return (y * 0.05).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, N_ITER, body, x)

    def quant(x):
        return jnp.clip(
            jnp.round(x.astype(jnp.float32) / a_scale), -127, 127
        ).astype(jnp.int8)

    @jax.jit
    def chain_conv(x):
        def body(i, x):
            y = jax.lax.conv_general_dilated(
                quant(x), kern_q, (1, 1), "SAME", dimension_numbers=DN,
                preferred_element_type=jnp.int32,
            )
            return (y.astype(jnp.float32) * (a_scale * w_scale) * 0.05).astype(
                jnp.bfloat16
            )

        return jax.lax.fori_loop(0, N_ITER, body, x)

    @jax.jit
    def chain_gemm(x):
        def body(i, x):
            patches = jax.lax.conv_general_dilated_patches(
                quant(x).astype(jnp.int8), (3, 3), (1, 1), "SAME",
                dimension_numbers=DN,
            )  # [B, H, W, C*9] — features are CHANNEL-major (C, kh, kw)
            y = jax.lax.dot_general(
                patches.reshape(-1, 9 * C),
                # match the patches' (C, kh, kw) feature order
                jnp.transpose(kern_q, (2, 0, 1, 3)).reshape(9 * C, C),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).reshape(B, H, W, C)
            return (y.astype(jnp.float32) * (a_scale * w_scale) * 0.05).astype(
                jnp.bfloat16
            )

        return jax.lax.fori_loop(0, N_ITER, body, x)

    @jax.jit
    def chain_pad(x):
        def body(i, x):
            xq = jnp.pad(quant(x), ((0, 0), (0, 0), (0, 0), (0, CP - C)))
            y = jax.lax.conv_general_dilated(
                xq, kern_pad, (1, 1), "SAME", dimension_numbers=DN,
                preferred_element_type=jnp.int32,
            )[..., :C]
            return (y.astype(jnp.float32) * (a_scale * w_scale) * 0.05).astype(
                jnp.bfloat16
            )

        return jax.lax.fori_loop(0, N_ITER, body, x)

    rpc = rpc_baseline()
    for name, fn in (("bf16", chain_bf16), ("int8_conv", chain_conv),
                     ("int8_gemm", chain_gemm), ("int8_pad", chain_pad)):
        t = (timed(fn, x0) - rpc) / N_ITER
        print(f"{name:10s}: {t * 1e3:.3f} ms  ({conv_gflop / t / 1e3:.0f} T/s)")


if __name__ == "__main__":
    main()
