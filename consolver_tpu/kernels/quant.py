"""Int8 (W8A8) quantized compute path for the preview/serving UNet.

TPU-native performance feature beyond reference parity (the reference
serves fp16 CUDA; SURVEY.md §6's north star is throughput at equal
quality).  The MXU runs int8 x int8 -> int32 at twice the bf16 rate;
measured on this chip via scripts/probe_int8.py: 339 TOP/s int8 conv vs
185 TFLOP/s bf16 (1.83x, including the dynamic requantization math).

Scheme — the standard symmetric dynamic-activation recipe:
  * weights: static per-output-channel int8, scale = max|w| / 127
    (quantized once at load time by :func:`quantize_params_like`);
  * activations: dynamic symmetric int8 — per-token (rows) for matmuls,
    per-SAMPLE for convs — quantized on the fly; XLA fuses the
    round/clip/scale into neighbouring ops.  Scales never reduce over the
    batch axis: serving requires a request's output to be independent of
    its batchmates (see :func:`_quantize_act`);
  * accumulation in int32 (``preferred_element_type``), dequantized by
    ``act_scale * weight_scale`` into the module's compute dtype.

Everything here is plain XLA — no Pallas needed: the contractions lower
to int8 MXU ops and the elementwise quant/dequant fuses.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def quantize_weight(w: jax.Array, out_axis: int = -1) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8: returns (w_int8, scale[out])."""
    w = jnp.asarray(w, jnp.float32)
    out_axis = out_axis % w.ndim
    reduce_axes = tuple(a for a in range(w.ndim) if a != out_axis)
    amax = jnp.max(jnp.abs(w), axis=reduce_axes)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    shape = [1] * w.ndim
    shape[out_axis] = -1
    wq = jnp.clip(jnp.round(w / scale.reshape(shape)), -127, 127).astype(jnp.int8)
    return wq, scale


def _quantize_act(x: jax.Array, per_token: bool) -> Tuple[jax.Array, jax.Array]:
    """Dynamic symmetric activation quant; scale broadcasts against the
    int32 accumulator output.

    ``per_token=True``: one scale per trailing-dim row (finest).
    ``per_token=False``: one scale PER SAMPLE (reduce all axes but batch).
    Never a whole-tensor scale: that would couple a row's rounding to its
    batchmates' values, breaking the serving determinism contract (a
    request's output must be a pure function of its own inputs however the
    batch is composed — measured on chip: a per-tensor conv scale moved
    mixed-batch outputs by 1 uint8 step vs solo, scripts/probe_serving.py
    --verify-determinism).  Per-sample is also strictly finer-grained."""
    x32 = x.astype(jnp.float32)
    if per_token:
        amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    else:
        amax = jnp.max(jnp.abs(x32), axis=tuple(range(1, x32.ndim)),
                       keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def int8_dense(
    x: jax.Array,
    kernel_q: jax.Array,
    kernel_scale: jax.Array,
    bias: Optional[jax.Array] = None,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """y = dequant(quant(x) @ kernel_q) + bias, per-token activation scales."""
    xq, a_scale = _quantize_act(x, per_token=True)
    y = jax.lax.dot_general(
        xq, kernel_q,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (a_scale * kernel_scale)
    if bias is not None:
        y = y + bias
    return y.astype(dtype)


def _pad_axis(arr: jax.Array, axis: int, multiple: int) -> jax.Array:
    pad = (-arr.shape[axis]) % multiple
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths)


def int8_conv(
    x: jax.Array,
    kernel_q: jax.Array,
    kernel_scale: jax.Array,
    bias: Optional[jax.Array] = None,
    strides: Tuple[int, int] = (1, 1),
    padding: Any = "SAME",
    dtype: jnp.dtype = jnp.float32,
    channel_pad: int = 128,
) -> jax.Array:
    """NHWC int8 conv with per-tensor activation scale.

    kernel_q [kh, kw, in, out] int8, kernel_scale [out] f32.

    ``channel_pad`` zero-pads in/out channels to the next multiple (lane
    width 128) before the conv and slices the result back.  Measured on
    v5e (scripts/probe_int8_l0.py, 8x64x64x320 3x3): the direct int8 conv
    at 320 channels runs at 133 T/s — SLOWER than bf16's 156 — while the
    same conv padded 320->384 hits 226 T/s effective despite the 20% extra
    MACs; channel counts already multiple-of-128 (640/1280, all VAE
    levels) are unaffected (pad is a no-op).  Zero channels are exact, so
    numerics are bit-identical to the unpadded conv."""
    xq, a_scale = _quantize_act(x, per_token=False)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    out_ch = kernel_q.shape[-1]
    if channel_pad:
        xq = _pad_axis(xq, 3, channel_pad)
        kernel_q = _pad_axis(_pad_axis(kernel_q, 2, channel_pad), 3, channel_pad)
    y = jax.lax.conv_general_dilated(
        xq, kernel_q, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )[..., :out_ch]
    y = y.astype(jnp.float32) * (a_scale * kernel_scale)
    if bias is not None:
        y = y + bias
    return y.astype(dtype)


class Int8Dense(nn.Module):
    """Drop-in for ``nn.Dense`` with int8 params (kernel/kernel_scale/bias).
    Param layout mirrors nn.Dense so :func:`quantize_params_like` converts
    a float checkpoint mechanically."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.zeros_init(),
            (x.shape[-1], self.features), jnp.int8,
        )
        scale = self.param(
            "kernel_scale", nn.initializers.ones_init(), (self.features,),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias
            else None
        )
        return int8_dense(x, kernel, scale, bias, dtype=self.dtype)


class Int8Conv(nn.Module):
    """Drop-in for ``nn.Conv`` (NHWC) with int8 params."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.zeros_init(),
            (kh, kw, x.shape[-1], self.features), jnp.int8,
        )
        scale = self.param(
            "kernel_scale", nn.initializers.ones_init(), (self.features,),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias
            else None
        )
        return int8_conv(
            x, kernel, scale, bias, strides=self.strides, padding=self.padding,
            dtype=self.dtype,
        )


def int8_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, dtype: Optional[jnp.dtype] = None
) -> jax.Array:
    """Int8 QK^T and PV with f32 softmax in between.

    Layout matches kernels/attention: q [B,Sq,H,D], k/v [B,Sk,H,D].
    Quant scheme: q/k per-token symmetric along D (scales [B,S,H,1]);
    softmax probs per-row (max <= 1, dynamic amax); v per-channel along D.

    MEASURED DEAD END for the SD UNet (scripts/probe_int8_attn.py on the
    real chip): 0.17x the fused bf16 XLA attention at the 64^2 d=40 shape,
    0.6-0.7x elsewhere — materializing the quantized [B,H,Sq,Sk] probs and
    the d=40 int8 tile padding (min int8 tile is (32,128)) cost far more
    than the 2x MXU rate buys.  Kept for reference / large-d shapes; NOT
    wired into any model — models quantize only their projections and keep
    attention on the fused bf16 path."""
    out_dtype = dtype or q.dtype
    d = q.shape[-1]
    sm_scale = 1.0 / np.sqrt(d)

    qq, qs = _quantize_act(q, per_token=True)  # qs [B,Sq,H,1]
    kq, ks = _quantize_act(k, per_token=True)  # ks [B,Sk,H,1]
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", qq, kq, preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    scores = scores * jnp.transpose(qs, (0, 2, 1, 3))  # [B,H,Sq,1]
    scores = scores * jnp.transpose(ks, (0, 2, 3, 1))  # [B,H,1,Sk]
    probs = jax.nn.softmax(scores * sm_scale, axis=-1)

    p_amax = jnp.max(probs, axis=-1, keepdims=True)
    p_scale = jnp.maximum(p_amax, 1e-8) / 127.0
    pq = jnp.clip(jnp.round(probs / p_scale), -127, 127).astype(jnp.int8)

    v32 = v.astype(jnp.float32)
    # Per-sample (no batch reduction — batch-composition independence).
    v_amax = jnp.max(jnp.abs(v32), axis=1, keepdims=True)  # [B,1,H,D]
    v_scale = jnp.maximum(v_amax, 1e-8) / 127.0
    vq = jnp.clip(jnp.round(v32 / v_scale), -127, 127).astype(jnp.int8)

    out = jnp.einsum(
        "bhqk,bkhd->bqhd", pq, vq, preferred_element_type=jnp.int32
    ).astype(jnp.float32)
    out = out * jnp.transpose(p_scale, (0, 2, 1, 3)) * v_scale
    return out.astype(out_dtype)


# ---------------------------------------------------------------------------
# Int4 weight-only (W4A16) path — a MEMORY feature, not a speed feature.
# All numbers below MEASURED on a v5e chip (scripts/probe_int4_flux.py).
#
# The 11.9B FLUX-Kontext DiT is 23.8GB bf16 (needs >=2 chips) and 12.1GB
# int8 (fits one v5e chip, scripts/probe_flux_serving.py).  Packing
# weights to 4 bits brings it to 6.56GB: ~2x less host->device transfer
# (12s vs the int8 tree's 174s through the tunnel — different tunnel
# days, but the byte count alone halves it) and ~6GB of freed HBM for
# activations.  Compute stays in the module dtype (bf16): the packed
# nibbles are unpacked + group-dequantized right before the dot, an
# elementwise prologue XLA fuses; at the 1024^2 Kontext shape the steady
# forward measured 1734 ms (~120 TFLOP/s effective) vs int8's 1368 ms —
# int4 is 1.27x SLOWER per forward.  What the freed HBM buys: BATCH 2 at
# 1024^2 fits one chip (int8 cannot), 3316 ms/fwd = 1658 ms/image, the
# best int4 per-image rate but still behind int8 b=1.  Choose int8 when
# speed matters, int4 when memory/load-time does.
#
# Scheme: symmetric int4 in [-7, 7], group-wise scales along the INPUT
# (contraction) axis, group_size=128 (the industry-standard W4 recipe —
# per-channel-only int4 degrades real checkpoints); two nibbles packed per
# uint8 byte along the input axis.
# ---------------------------------------------------------------------------


def pack_int4(w4: jax.Array) -> jax.Array:
    """Pack int8-valued int4 numbers [in, out] (in even) -> uint8 [in//2, out].

    Row 2i goes to the low nibble, row 2i+1 to the high nibble."""
    lo = w4[0::2].astype(jnp.uint8) & 0xF
    hi = w4[1::2].astype(jnp.uint8) & 0xF
    return (hi << 4) | lo


def unpack_int4(packed: jax.Array) -> jax.Array:
    """uint8 [in//2, out] -> int8 [in, out] with sign-extended nibbles."""
    lo = (packed & 0xF).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)
    lo = lo - jnp.asarray(16, jnp.int8) * (lo >= 8)
    hi = hi - jnp.asarray(16, jnp.int8) * (hi >= 8)
    return jnp.stack([lo, hi], axis=1).reshape(-1, packed.shape[-1])


def _int4_groups(in_features: int, group_size: int) -> int:
    """Number of scale groups along the input axis: ``group_size`` when it
    divides in_features, else one per-channel-only group (tiny inputs like
    the FLUX x_embedder's 64)."""
    if group_size > 0 and in_features % group_size == 0:
        return in_features // group_size
    return 1


def quantize_weight_int4(
    w: jax.Array, group_size: int = 128
) -> Tuple[jax.Array, jax.Array]:
    """Symmetric group-wise int4: returns (packed uint8 [in//2, out],
    scale f32 [groups, out]).  ``in`` must be even (true for every FLUX
    projection; assert otherwise)."""
    w = jnp.asarray(w, jnp.float32)
    if w.ndim != 2:
        raise ValueError(f"int4 quant expects a 2-D dense kernel, got {w.shape}")
    in_f, out_f = w.shape
    if in_f % 2:
        raise ValueError(f"int4 packing needs an even input dim, got {in_f}")
    groups = _int4_groups(in_f, group_size)
    wg = w.reshape(groups, in_f // groups, out_f)
    amax = jnp.max(jnp.abs(wg), axis=1)                       # [groups, out]
    scale = jnp.maximum(amax, 1e-8) / 7.0
    w4 = jnp.clip(jnp.round(wg / scale[:, None, :]), -7, 7)
    return pack_int4(w4.reshape(in_f, out_f).astype(jnp.int8)), scale


def dequantize_int4(
    packed: jax.Array, scale: jax.Array, dtype: jnp.dtype = jnp.float32
) -> jax.Array:
    """Inverse of :func:`quantize_weight_int4` -> float kernel [in, out]."""
    w4 = unpack_int4(packed)
    in_f, out_f = w4.shape
    groups = scale.shape[0]
    wg = w4.reshape(groups, in_f // groups, out_f).astype(jnp.float32)
    return (wg * scale[:, None, :]).reshape(in_f, out_f).astype(dtype)


def int4_dense(
    x: jax.Array,
    kernel_packed: jax.Array,
    kernel_scale: jax.Array,
    bias: Optional[jax.Array] = None,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """y = x @ dequant(kernel) + bias in the compute dtype (W4A16)."""
    w = dequantize_int4(kernel_packed, kernel_scale, dtype=dtype)
    y = jnp.dot(x.astype(dtype), w)
    if bias is not None:
        y = y + bias.astype(dtype)
    return y.astype(dtype)


class Int4Dense(nn.Module):
    """Drop-in for ``nn.Dense`` with 4-bit packed params
    (kernel_packed/kernel_scale/bias); converted from a float checkpoint by
    :func:`quantize_params_like` (it recognizes the ``kernel_packed`` leaf)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    group_size: int = 128

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        if in_f % 2:
            raise ValueError(f"Int4Dense needs an even input dim, got {in_f}")
        groups = _int4_groups(in_f, self.group_size)
        packed = self.param(
            "kernel_packed", nn.initializers.zeros_init(),
            (in_f // 2, self.features), jnp.uint8,
        )
        scale = self.param(
            "kernel_scale", nn.initializers.ones_init(),
            (groups, self.features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias
            else None
        )
        return int4_dense(x, packed, scale, bias, dtype=self.dtype)


def quantize_params_like(quant_shapes: Any, params: Any) -> Any:
    """Convert a float param tree into the quantized model's tree.

    ``quant_shapes``: jax.eval_shape of the QUANTIZED model's init — its
    structure says exactly which kernels are int8 and where kernel_scale
    leaves live.  Float kernels whose quantized counterpart is int8 are
    per-channel quantized; everything else is copied (cast to the expected
    dtype).  Works for any model wired with Int8Dense/Int8Conv."""

    def walk(shape_node, param_node):
        if not isinstance(shape_node, dict):
            raise TypeError(f"unexpected leaf pairing: {shape_node}")
        out = {}
        for key, sub in shape_node.items():
            if isinstance(sub, dict):
                if "kernel_packed" in sub and not isinstance(
                    sub["kernel_packed"], dict
                ):
                    src = jnp.asarray(param_node[key]["kernel"])
                    group_size = src.shape[0] // sub["kernel_scale"].shape[0]
                    packed, scale = quantize_weight_int4(src, group_size)
                    node = {"kernel_packed": packed, "kernel_scale": scale}
                    if "bias" in sub:
                        node["bias"] = jnp.asarray(
                            param_node[key]["bias"], sub["bias"].dtype
                        )
                    out[key] = node
                elif "kernel" in sub and "kernel_scale" in sub and not isinstance(
                    sub["kernel"], dict
                ):
                    src = jnp.asarray(param_node[key]["kernel"])
                    wq, scale = quantize_weight(src, out_axis=-1)
                    node = {"kernel": wq, "kernel_scale": scale}
                    if "bias" in sub:
                        node["bias"] = jnp.asarray(
                            param_node[key]["bias"], sub["bias"].dtype
                        )
                    out[key] = node
                else:
                    out[key] = walk(sub, param_node[key])
            else:
                out[key] = jnp.asarray(param_node[key], sub.dtype)
        return out

    return walk(quant_shapes, params)


def tree_bytes(params: Any) -> int:
    return sum(
        int(np.prod(np.shape(x))) * jnp.asarray(x).dtype.itemsize
        for x in jax.tree.leaves(params)
    )
