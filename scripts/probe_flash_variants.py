#!/usr/bin/env python
"""TPU probe: flash-attention dot-input precision variants at the FLUX
Kontext shapes (d=128, 24 heads — where kernels/attention dispatches to the
Pallas kernel).

The shipped kernel (kernels/flash_attention.py) casts q/k/v to f32 BEFORE
the MXU dots (119.5 TFLOP/s = 61% bf16 peak at the 4.6k shape).  Two
candidate upgrades, both standard TPU flash recipes:

  * bf16-dots: feed q/k to the QK^T dot in bf16 (scale folded in after),
    cast the probs to bf16 for the PV dot; accumulate f32.  The MXU runs
    bf16 x bf16 -> f32 natively at full rate, vs multi-pass f32.
  * int8 QK/PV: per-token symmetric int8 q/k (scales applied to the f32
    scores), probs on a fixed /127 grid (p in [0,1] after the online-max
    subtraction), per-(head,channel) int8 v.  2x the MXU rate again.
    NOTE: int8 attention was a measured DEAD END at SD shapes (d=40,
    probe_int8_attn.py) because of probs materialization + lane padding —
    neither applies inside a flash kernel at d=128.

Accuracy is checked against the shipped f32-dot kernel on the same inputs.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from consolver_tpu.kernels.flash_attention import NEG_INF, _pad_to, flash_attention


def _bf16_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k, scale, kv_len):
    q = q_ref[0]  # [bq, d] bf16 — stays bf16 into the MXU
    block_q, d = q.shape
    num_kv = k_ref.shape[1] // block_k

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        col = i * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_bf16(q, k, v, block_q=512, block_k=512, interpret=False):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = 1.0 / (d**0.5)
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    qt, sq0 = _pad_to(qt, 1, block_q)
    kt, sk0 = _pad_to(kt, 1, block_k)
    vt, _ = _pad_to(vt, 1, block_k)
    grid = (b * h, qt.shape[1] // block_q)
    out = pl.pallas_call(
        functools.partial(_bf16_kernel, block_k=block_k, scale=scale, kv_len=sk0),
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kt.shape[1], d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, vt.shape[1], d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(qt.size + kt.size + vt.size + qt.size) * 2,
            transcendentals=b * h * sq * sk,
        ),
        interpret=interpret,
    )(qt, kt, vt)
    out = out[:, :sq0].reshape(b, h, sq0, d).transpose(0, 2, 1, 3)
    return out


def _int8_kernel(qq_ref, kq_ref, vq_ref, qs_ref, ks_ref, vs_ref, o_ref, *,
                 block_k, scale, kv_len):
    q = qq_ref[0]  # [bq, d] int8
    block_q, d = q.shape
    num_kv = kq_ref.shape[1] // block_k
    qs = qs_ref[0].astype(jnp.float32)  # [bq, 1]
    vs = vs_ref[0].astype(jnp.float32)  # [1, d]

    def body(i, carry):
        m, l, acc = carry
        k = kq_ref[0, pl.ds(i * block_k, block_k), :]
        v = vq_ref[0, pl.ds(i * block_k, block_k), :]
        ks = ks_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        s = s * (qs * scale) * ks.reshape(1, block_k)
        col = i * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)  # in [0, 1]
        pq = jnp.round(p * 127.0).astype(jnp.int8)
        alpha = jnp.exp(m - m_new)
        # normalizer from the QUANTIZED probs so out stays an exact weighted
        # average of (dequantized) v rows
        l_new = l * alpha + jnp.sum(pq.astype(jnp.float32), axis=1, keepdims=True) / 127.0
        pv = jax.lax.dot_general(
            pq, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)
        acc_new = acc * alpha + pv * vs
        return m_new, l_new, acc_new

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.full((block_q, 1), 1e-20, jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_int8(q, k, v, block_q=512, block_k=512, interpret=False):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = 1.0 / (d**0.5)

    def quant_tokens(x):
        x32 = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
        s = jnp.maximum(amax, 1e-8) / 127.0
        return jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8), s

    qq, qs = quant_tokens(q)  # scales [b, sq, h, 1]
    kq, ks = quant_tokens(k)
    v32 = v.astype(jnp.float32)
    v_amax = jnp.max(jnp.abs(v32), axis=1, keepdims=True)  # [b,1,h,d]
    v_scale = jnp.maximum(v_amax, 1e-8) / 127.0
    vq = jnp.clip(jnp.round(v32 / v_scale), -127, 127).astype(jnp.int8)

    def to_bh(x):  # [b,s,h,c] -> [b*h, s, c]
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], x.shape[3])

    qt, kt, vt = to_bh(qq), to_bh(kq), to_bh(vq)
    qst, kst = to_bh(qs), to_bh(ks)
    vst = v_scale.transpose(0, 2, 1, 3).reshape(b * h, 1, d) / 127.0

    qt, sq0 = _pad_to(qt, 1, block_q)
    qst, _ = _pad_to(qst, 1, block_q)
    kt, sk0 = _pad_to(kt, 1, block_k)
    vt, _ = _pad_to(vt, 1, block_k)
    kst, _ = _pad_to(kst, 1, block_k)

    grid = (b * h, qt.shape[1] // block_q)
    kv_pad = kt.shape[1]
    out = pl.pallas_call(
        functools.partial(_int8_kernel, block_k=block_k, scale=scale, kv_len=sk0),
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kv_pad, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kv_pad, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kv_pad, 1), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=qt.size + kt.size + vt.size + 2 * qt.size,
            transcendentals=b * h * sq * sk,
        ),
        interpret=interpret,
    )(qt, kt, vt, qst, kst, vst)
    out = out[:, :sq0].reshape(b, h, sq0, d).transpose(0, 2, 1, 3)
    return out


def timed_chain(fn, q, k, v, n_iter=20, reps=3):
    @jax.jit
    def chain(q, k, v):
        def body(i, q):
            o = fn(q, k, v)
            return (o * 0.5 + q * 0.5).astype(q.dtype)

        return jax.lax.fori_loop(0, n_iter, body, q)

    out = chain(q, k, v)
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = chain(q, k, v)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best / n_iter


def main():
    variants = [
        ("f32dot (shipped)", flash_attention),
        ("bf16dot", flash_bf16),
        ("int8", flash_int8),
    ]
    shapes = [
        ("serve 1024^2 kontext", (1, 8704, 24, 128)),
        ("train 512^2 b8", (8, 2560, 24, 128)),
    ]
    # accuracy first (small extra compiles), at the training shape
    b, s, h, d = 8, 2560, 24, 128
    q = jax.random.normal(jax.random.key(0), (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, s, h, d), jnp.bfloat16)
    ref = flash_attention(q, k, v).astype(jnp.float32)
    ref_norm = float(jnp.mean(jnp.abs(ref)))
    for name, fn in variants[1:]:
        out = fn(q, k, v).astype(jnp.float32)
        err = float(jnp.mean(jnp.abs(out - ref))) / ref_norm
        print(f"accuracy {name}: mean-rel-err vs f32dot = {err:.4e}", flush=True)

    for sname, (b, s, h, d) in shapes:
        q = jax.random.normal(jax.random.key(3), (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(4), (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(5), (b, s, h, d), jnp.bfloat16)
        gflop = 4 * b * h * s * s * d / 1e9
        for name, fn in variants:
            t = timed_chain(fn, q, k, v)
            print(
                f"{sname}: {name:18s} {t*1e3:7.2f} ms  {gflop/t/1e3:6.1f} TF/s",
                flush=True,
            )


if __name__ == "__main__":
    main()


# ---- round-3 session-2 addendum: no-mask specialization + block sweep ----

def _nomask_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k, scale):
    """bf16 dots, softmax scale folded into q once, NO kv-padding mask
    (caller guarantees kv_len % block_k == 0)."""
    q = (q_ref[0].astype(jnp.float32) * scale).astype(jnp.bfloat16)
    block_q, d = q.shape
    num_kv = k_ref.shape[1] // block_k

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_nomask(q, k, v, block_q=512, block_k=512, interpret=False):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    assert sk % block_k == 0 and sq % block_q == 0
    scale = 1.0 / (d**0.5)
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    grid = (b * h, sq // block_q)
    out = pl.pallas_call(
        functools.partial(_nomask_kernel, block_k=block_k, scale=scale),
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(qt.size + kt.size + vt.size + qt.size) * 2,
            transcendentals=b * h * sq * sk,
        ),
        interpret=interpret,
    )(qt, kt, vt)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


def main2():
    b, s, h, d = 1, 8704, 24, 128
    q = jax.random.normal(jax.random.key(3), (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(4), (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(5), (b, s, h, d), jnp.bfloat16)
    gflop = 4 * b * h * s * s * d / 1e9
    ref = flash_attention(q, k, v).astype(jnp.float32)
    rn = float(jnp.mean(jnp.abs(ref)))
    for bq, bk in [(512, 512), (1024, 512), (512, 1024), (256, 512)]:
        if s % bq or s % bk:
            continue
        fn = functools.partial(flash_nomask, block_q=bq, block_k=bk)
        out = fn(q, k, v).astype(jnp.float32)
        err = float(jnp.mean(jnp.abs(out - ref))) / rn
        t = timed_chain(fn, q, k, v)
        print(f"serve nomask bq{bq}/bk{bk}: {t*1e3:7.2f} ms  "
              f"{gflop/t/1e3:6.1f} TF/s  relerr {err:.2e}", flush=True)


if __name__ == "__main__" and os.environ.get("PROBE_PHASE") == "2":
    main2()
