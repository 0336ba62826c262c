"""Shared neural blocks for the in-repo diffusion models.

TPU-native conventions:
  * NHWC layout everywhere (XLA's preferred conv layout on TPU); the HF
    weight converters transpose from torch NCHW at load time.
  * a ``dtype`` compute policy per module (bfloat16 on TPU), params float32.
  * attention goes through :func:`consolver_tpu.kernels.attention.attention`
    so a Pallas flash kernel can be swapped under all models at one site.

These re-implement (not port) the blocks the reference gets from
diffusers' UNet2DConditionModel / AutoencoderKL, which it loads from the HF
hub (train_ppo.py:102-131); module naming mirrors diffusers checkpoint keys
so weight conversion stays mechanical.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from consolver_tpu.kernels.attention import attention as attention_op
from consolver_tpu.kernels.quant import Int4Dense, Int8Conv, Int8Dense


def make_dense(quant, features: int, *, use_bias: bool = True,
               dtype=jnp.float32, name: str):
    """nn.Dense, or a quantized twin per the quant policy (kernels/quant.py):
    ``True``/``"int8"`` = W8A8 (int8 MXU, 2x bf16 peak); ``"int4"`` = packed
    4-bit weights, bf16 compute (half the int8 memory — serving/rollout
    footprint, not speed)."""
    if quant == "int4":
        return Int4Dense(features, use_bias=use_bias, dtype=dtype, name=name)
    if quant:
        return Int8Dense(features, use_bias=use_bias, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


def make_conv(quant: bool, features: int, kernel_size=(3, 3), *,
              strides=(1, 1), padding="SAME", dtype=jnp.float32, name: str):
    if quant:
        return Int8Conv(features, kernel_size, strides=strides, padding=padding,
                        dtype=dtype, name=name)
    return nn.Conv(features, kernel_size, strides=strides, padding=padding,
                   dtype=dtype, name=name)


def timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jax.Array:
    """Sinusoidal timestep embeddings (diffusers ``get_timestep_embedding``
    with the SD-1.5 config: flip_sin_to_cos=True, freq_shift=0)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


class TimestepEmbedding(nn.Module):
    """2-layer SiLU MLP lifting the sinusoidal embedding."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb):
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_1")(t_emb)
        x = nn.silu(x)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_2")(x)


class ResnetBlock2D(nn.Module):
    """GN-SiLU-Conv x2 residual block with additive time conditioning."""

    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, temb=None):
        in_channels = x.shape[-1]
        h = nn.GroupNorm(self.groups, epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        h = nn.silu(h).astype(self.dtype)
        h = make_conv(self.quant, self.out_channels, (3, 3), padding=1,
                      dtype=self.dtype, name="conv1")(h)
        if temb is not None:
            # time projection stays float: tiny FLOPs, global conditioning
            temb = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + temb[:, None, None, :]
        h = nn.GroupNorm(self.groups, epsilon=1e-5, dtype=jnp.float32, name="norm2")(h)
        h = nn.silu(h).astype(self.dtype)
        h = make_conv(self.quant, self.out_channels, (3, 3), padding=1,
                      dtype=self.dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            x = make_conv(
                self.quant, self.out_channels, (1, 1), dtype=self.dtype,
                name="conv_shortcut",
            )(x)
        return x + h


class Attention(nn.Module):
    """Multi-head attention with optional cross-attention context.

    Replaces the reference's xformers memory-efficient attention
    (train_ppo.py:192-206); the inner product runs through the kernels
    dispatch so Pallas flash attention applies on TPU.
    """

    num_heads: int
    head_dim: int
    cross_dim: Optional[int] = None
    out_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, context=None):
        inner = self.num_heads * self.head_dim
        context = x if context is None else context
        q = make_dense(self.quant, inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = make_dense(self.quant, inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = make_dense(self.quant, inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        b, sq = q.shape[:2]
        sk = k.shape[1]
        q = q.reshape(b, sq, self.num_heads, self.head_dim)
        k = k.reshape(b, sk, self.num_heads, self.head_dim)
        v = v.reshape(b, sk, self.num_heads, self.head_dim)
        out = attention_op(q, k, v)
        out = out.reshape(b, sq, inner)
        return make_dense(
            self.quant, inner, use_bias=self.out_bias, dtype=self.dtype,
            name="to_out_0",
        )(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        h = make_dense(self.quant, self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        x = GEGLU(self.dim * self.mult, dtype=self.dtype, quant=self.quant,
                  name="net_0")(x)
        return make_dense(self.quant, self.dim, dtype=self.dtype, name="net_2")(x)


class BasicTransformerBlock(nn.Module):
    """LN -> self-attn -> LN -> cross-attn -> LN -> GEGLU FF, all residual."""

    num_heads: int
    head_dim: int
    cross_dim: int
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, context):
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        x = x + Attention(
            self.num_heads, self.head_dim, dtype=self.dtype, quant=self.quant,
            name="attn1",
        )(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        x = x + Attention(
            self.num_heads,
            self.head_dim,
            cross_dim=self.cross_dim,
            dtype=self.dtype,
            quant=self.quant,
            name="attn2",
        )(h, context)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(x).astype(self.dtype)
        return x + FeedForward(x.shape[-1], dtype=self.dtype, quant=self.quant,
                               name="ff")(h)


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> 1x1 conv in -> transformer blocks -> 1x1 out.

    SD-1.5 uses conv (not linear) projections (use_linear_projection=False).
    """

    num_heads: int
    head_dim: int
    cross_dim: int
    depth: int = 1
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        residual = x
        x = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        x = make_conv(self.quant, c, (1, 1), dtype=self.dtype, name="proj_in")(
            x.astype(self.dtype)
        )
        x = x.reshape(b, h * w, c)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                self.num_heads,
                self.head_dim,
                self.cross_dim,
                dtype=self.dtype,
                quant=self.quant,
                name=f"transformer_blocks_{i}",
            )(x, context)
        x = x.reshape(b, h, w, c)
        x = make_conv(self.quant, c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual


class Downsample2D(nn.Module):
    """Strided conv downsample with the asymmetric (0,1) padding diffusers uses."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return make_conv(
            self.quant, self.out_channels, (3, 3), strides=(2, 2),
            padding="VALID", dtype=self.dtype, name="conv",
        )(x)


class Upsample2D(nn.Module):
    """Nearest-neighbor 2x upsample + conv."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return make_conv(self.quant, self.out_channels, (3, 3), padding=1,
                         dtype=self.dtype, name="conv")(x)


class VaeAttention(nn.Module):
    """Single-head self-attention block used in the VAE mid blocks."""

    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        x = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=jnp.float32, name="group_norm")(x)
        x = x.reshape(b, h * w, c).astype(self.dtype)
        q = make_dense(self.quant, c, dtype=self.dtype, name="to_q")(x)
        k = make_dense(self.quant, c, dtype=self.dtype, name="to_k")(x)
        v = make_dense(self.quant, c, dtype=self.dtype, name="to_v")(x)
        out = attention_op(
            q.reshape(b, h * w, 1, c), k.reshape(b, h * w, 1, c), v.reshape(b, h * w, 1, c)
        ).reshape(b, h * w, c)
        out = make_dense(self.quant, c, dtype=self.dtype, name="to_out_0")(out)
        return out.reshape(b, h, w, c) + residual
