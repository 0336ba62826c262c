"""CLIP text encoder (SD-1.5's ViT-L/14 text tower), re-implemented in flax.

TPU-native equivalent of the ``transformers.CLIPTextModel`` the reference
loads from the hub (train_ppo.py:109-113).  Returns the final hidden states
(what the SD pipeline conditions on).  Uses quick_gelu and a causal mask, as
the CLIP text transformer does.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from consolver_tpu.kernels.attention import attention as attention_op


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77

    @classmethod
    def sd15(cls) -> "ClipTextConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "ClipTextConfig":
        return cls(
            vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_position_embeddings=77,
        )


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ClipAttention(nn.Module):
    cfg: ClipTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        head_dim = cfg.hidden_size // cfg.num_heads
        b, s, _ = x.shape
        q = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, s, cfg.num_heads, head_dim)
        k = k.reshape(b, s, cfg.num_heads, head_dim)
        v = v.reshape(b, s, cfg.num_heads, head_dim)
        out = attention_op(q, k, v, is_causal=True).reshape(b, s, cfg.hidden_size)
        return nn.Dense(cfg.hidden_size, dtype=self.dtype, name="out_proj")(out)


class ClipEncoderLayer(nn.Module):
    cfg: ClipTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm1")(x).astype(self.dtype)
        x = x + ClipAttention(self.cfg, dtype=self.dtype, name="self_attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm2")(x).astype(self.dtype)
        h = nn.Dense(self.cfg.intermediate_size, dtype=self.dtype, name="mlp_fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class ClipTextEncoder(nn.Module):
    """input_ids [B, S] -> last_hidden_state [B, S, hidden].

    ``return_pooled=True`` additionally returns the EOS-token hidden state
    (argmax of input_ids — the CLIP pooled output FLUX conditions on).
    """

    cfg: ClipTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, return_pooled: bool = False):
        cfg = self.cfg
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="token_embedding")(input_ids)
        pos = jnp.arange(input_ids.shape[1])
        x = x + nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, name="position_embedding"
        )(pos)[None]
        x = x.astype(self.dtype)
        for i in range(cfg.num_layers):
            x = ClipEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_layer_norm")(x)
        if not return_pooled:
            return x
        eos_idx = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eos_idx]
        return x, pooled
