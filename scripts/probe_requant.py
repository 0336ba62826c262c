#!/usr/bin/env python
"""TPU probe for VERDICT r2 item #8: how much of the int8 conv chain is the
DYNAMIC requant (abs-max reduce + scale/round/clip), i.e. what a fused
Pallas requant (or calibrated static scales) could recover.

Per SD-UNet hot shape, times three chained variants (N dependent in-jit
iterations + host read, minus the RPC baseline — CLAUDE.md timing rules):

  bf16     : bf16 conv (the non-quantized baseline)
  dynamic  : the production int8_conv chain — amax reduce + quantize +
             int8 conv + dequant (kernels/quant.int8_conv semantics)
  static   : identical chain with a FIXED activation scale (no amax
             reduce) — the upper bound for fusing/removing the dynamic
             requant, reachable only with calibration

If dynamic-static is small, a Pallas requant fusion has no headroom and
the item closes as a measured dead end.
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from scripts._probe_util import rpc_baseline, timed

DN = ("NHWC", "HWIO", "NHWC")
N_ITER = 100


def probe_shape(b, h, w, c, variants=("bf16", "dynamic", "static")):
    conv_gflop = 2 * b * h * w * c * (9 * c) / 1e9
    kern_f = jax.random.normal(jax.random.key(0), (3, 3, c, c)) * 0.02
    kern_bf16 = kern_f.astype(jnp.bfloat16)
    kern_q = jnp.clip(jnp.round(kern_f / 2e-4), -127, 127).astype(jnp.int8)
    w_scale = jnp.full((c,), 2e-4, jnp.float32)
    x0 = jax.random.normal(jax.random.key(1), (b, h, w, c), jnp.bfloat16)

    @jax.jit
    def chain_bf16(x):
        def body(i, x):
            y = jax.lax.conv_general_dilated(
                x, kern_bf16, (1, 1), "SAME", dimension_numbers=DN,
                preferred_element_type=jnp.float32,
            )
            return (y * 0.05).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, N_ITER, body, x)

    @jax.jit
    def chain_dynamic(x):
        # the production int8_conv: dynamic per-tensor activation scale
        def body(i, x):
            xf = x.astype(jnp.float32)
            amax = jnp.max(jnp.abs(xf))
            a_scale = jnp.maximum(amax, 1e-8) / 127.0
            xq = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, kern_q, (1, 1), "SAME", dimension_numbers=DN,
                preferred_element_type=jnp.int32,
            )
            yf = y.astype(jnp.float32) * (a_scale * w_scale)
            return (yf * 0.05).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, N_ITER, body, x)

    @jax.jit
    def chain_static(x):
        # amax-free: fixed activation scale (calibration upper bound)
        def body(i, x):
            xf = x.astype(jnp.float32)
            a_scale = 0.05
            xq = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, kern_q, (1, 1), "SAME", dimension_numbers=DN,
                preferred_element_type=jnp.int32,
            )
            yf = y.astype(jnp.float32) * (a_scale * w_scale)
            return (yf * 0.05).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, N_ITER, body, x)

    rpc = rpc_baseline()
    out = {}
    for name, fn in (("bf16", chain_bf16), ("dynamic", chain_dynamic),
                     ("static", chain_static)):
        if name not in variants:
            continue
        t = (timed(fn, x0) - rpc) / N_ITER
        out[name] = (t * 1e3, conv_gflop / t / 1e3)  # ms, TFLOP-or-TOP/s
    return out


def main():
    print("platform:", jax.devices()[0].platform)
    # two shapes bracket the SD UNet conv spectrum (remote compiles are
    # ~1-3 min each and serialized — keep the program count low)
    for shape in ((8, 64, 64, 320), (8, 16, 16, 1280)):
        res = probe_shape(*shape)
        b, h, w, c = shape
        line = f"[{b}x{h}x{w}x{c}] " + "  ".join(
            f"{k}: {ms:.3f} ms ({tops:.0f} T/s)" for k, (ms, tops) in res.items()
        )
        dyn, sta = res["dynamic"][0], res["static"][0]
        line += f"  | requant overhead {100 * (dyn - sta) / dyn:.1f}%"
        print(line)


if __name__ == "__main__":
    main()
