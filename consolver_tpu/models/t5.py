"""T5 encoder (v1.1 / XXL-class), re-implemented in flax.

TPU-native equivalent of the T5-XXL text encoder FLUX pulls from the hub
(edit_ppo/denoise_diffusion.py:35-41 encodes prompts with T5+CLIP).
Standard T5: RMSNorm (no bias, pre-norm), relative-position-bucket attention
bias on the first layer (shared), gated-GELU feed-forward (wi_0 * gelu,
wi_1, wo).  Checkpoint keys mirror transformers ``T5EncoderModel``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from consolver_tpu.kernels.attention import attention as attention_op


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6

    @classmethod
    def xxl(cls) -> "T5Config":
        return cls()

    @classmethod
    def tiny(cls) -> "T5Config":
        return cls(
            vocab_size=512, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4
        )


def relative_position_buckets(
    qlen: int, klen: int, num_buckets: int = 32, max_distance: int = 128
) -> np.ndarray:
    """Bidirectional T5 relative position bucketing (static)."""
    context_position = np.arange(qlen)[:, None]
    memory_position = np.arange(klen)[None, :]
    relative_position = memory_position - context_position

    nb = num_buckets // 2
    ret = (relative_position > 0).astype(np.int64) * nb
    n = np.abs(relative_position)
    max_exact = nb // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        np.log(n.clip(1) / max_exact)
        / np.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, nb - 1)
    ret += np.where(is_small, n, val_if_large)
    return ret


class T5LayerNorm(nn.Module):
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones_init(), (x.shape[-1],))
        xf = x.astype(jnp.float32)
        xf = xf * jax.lax.rsqrt(jnp.mean(xf**2, axis=-1, keepdims=True) + self.eps)
        return (xf * scale).astype(self.dtype)


class T5Attention(nn.Module):
    cfg: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias):
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        b, s, _ = x.shape
        # T5 attention is unscaled (the 1/sqrt(d) is folded into init)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="v")(x)
        q = q.reshape(b, s, cfg.num_heads, cfg.d_kv) * (cfg.d_kv**0.5)
        k = k.reshape(b, s, cfg.num_heads, cfg.d_kv)
        v = v.reshape(b, s, cfg.num_heads, cfg.d_kv)
        # position_bias [1, H, S, S] enters as an additive mask
        out = attention_op(q, k, v, mask=None, is_causal=False) if position_bias is None else (
            jax.nn.dot_product_attention(q, k, v, bias=position_bias)
        )
        out = out.reshape(b, s, inner)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="o")(out)


class T5Block(nn.Module):
    cfg: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias):
        cfg = self.cfg
        h = T5LayerNorm(cfg.layer_norm_epsilon, dtype=self.dtype, name="ln_attn")(x)
        x = x + T5Attention(cfg, dtype=self.dtype, name="attention")(h, position_bias)
        h = T5LayerNorm(cfg.layer_norm_epsilon, dtype=self.dtype, name="ln_ff")(x)
        g = nn.gelu(
            nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi_0")(h),
            approximate=True,
        )
        u = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi_1")(h)
        x = x + nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="wo")(g * u)
        return x


class T5Encoder(nn.Module):
    """input_ids [B, S] -> hidden states [B, S, d_model]."""

    cfg: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        cfg = self.cfg
        x = nn.Embed(cfg.vocab_size, cfg.d_model, name="shared")(input_ids).astype(
            self.dtype
        )
        s = input_ids.shape[1]
        buckets = jnp.asarray(
            relative_position_buckets(
                s, s, cfg.relative_attention_num_buckets,
                cfg.relative_attention_max_distance,
            )
        )
        bias_table = nn.Embed(
            cfg.relative_attention_num_buckets, cfg.num_heads,
            name="relative_attention_bias",
        )(buckets)  # [S, S, H]
        position_bias = bias_table.transpose(2, 0, 1)[None].astype(self.dtype)
        for i in range(cfg.num_layers):
            x = T5Block(cfg, dtype=self.dtype, name=f"block_{i}")(x, position_bias)
        return T5LayerNorm(cfg.layer_norm_epsilon, dtype=self.dtype, name="final_layer_norm")(x)


def convert_t5(state_dict, dtype=np.float32):
    """transformers T5EncoderModel state dict -> T5Encoder params."""
    from consolver_tpu.models import convert as _c

    renames = (
        (
            r"^encoder\.block\.0\.layer\.0\.SelfAttention\.relative_attention_bias\.",
            "relative_attention_bias.",
        ),
        (r"^encoder\.block\.(\d+)\.layer\.0\.SelfAttention\.", r"block.\1.attention."),
        (r"^encoder\.block\.(\d+)\.layer\.0\.layer_norm\.", r"block.\1.ln_attn."),
        (r"^encoder\.block\.(\d+)\.layer\.1\.DenseReluDense\.wi_0\.", r"block.\1.wi_0."),
        (r"^encoder\.block\.(\d+)\.layer\.1\.DenseReluDense\.wi_1\.", r"block.\1.wi_1."),
        (r"^encoder\.block\.(\d+)\.layer\.1\.DenseReluDense\.wo\.", r"block.\1.wo."),
        (r"^encoder\.block\.(\d+)\.layer\.1\.layer_norm\.", r"block.\1.ln_ff."),
        (r"^encoder\.final_layer_norm\.", "final_layer_norm."),
        (r"^shared\.", "shared."),
    )
    # relative_attention_bias is an Embed: [num_buckets, heads] kept as-is
    converted = _c.convert_state_dict(state_dict, renames=renames, dtype=dtype)
    params = converted["params"]
    rab = params.get("relative_attention_bias")
    if rab is not None and "kernel" in rab:
        # 2D weight was transposed by the generic rule; it is an embedding
        params["relative_attention_bias"] = {"embedding": rab["kernel"].T}
    return converted
