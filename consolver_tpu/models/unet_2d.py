"""SD-1.5-class conditional UNet, re-implemented in flax (NHWC, bf16-ready).

The reference pulls diffusers' ``UNet2DConditionModel`` from the HF hub
(train_ppo.py:124-131) and never defines it; this is the in-repo TPU-native
equivalent.  Architecture matches the SD-1.5 config so HF checkpoints convert
1:1 (see models/convert.py):

  - block_out_channels (320, 640, 1280, 1280), layers_per_block 2
  - down: CrossAttnDownBlock2D x3 + DownBlock2D; up: mirror
  - mid: UNetMidBlock2DCrossAttn
  - 8 attention heads, cross_attention_dim 768, norm groups 32
  - timestep embedding: sinusoidal(320) -> MLP(1280), flip_sin_to_cos, shift 0
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from consolver_tpu.models.layers import (
    Downsample2D,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2D,
    Upsample2D,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # True => the block at this position has cross-attention transformers.
    cross_attn_blocks: Tuple[bool, ...] = (True, True, True, False)
    attention_head_dim: int = 8  # number of heads (diffusers SD-1.5 semantics)
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    transformer_depth: int = 1
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    # W8A8 int8 compute for the conv/attention/FF projections
    # (kernels/quant.py; serving-only — quantize a float checkpoint with
    # quantize_params_like).  conv_in/out and time embedding stay float.
    quant_int8: bool = False
    # Resolution levels (indices into block_out_channels; 0 = highest
    # resolution) whose blocks stay bf16 under quant_int8.  Measured on
    # v5e (scripts/probe_requant.py): int8 convs LOSE to bf16 at the
    # 64^2x320 shape (122 vs 167 T/s) while winning ~2x at 16^2x1280 —
    # skipping level 0 gives a faster hybrid than uniform int8.
    quant_skip_levels: Tuple[int, ...] = ()

    @classmethod
    def sd15(cls) -> "UNetConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "UNetConfig":
        """Small fixture config for tests (SURVEY.md section 4)."""
        return cls(
            block_out_channels=(32, 64),
            layers_per_block=1,
            cross_attn_blocks=(True, False),
            attention_head_dim=2,
            cross_attention_dim=32,
            norm_num_groups=8,
        )


class CrossAttnDownBlock(nn.Module):
    cfg: UNetConfig
    out_channels: int
    has_attn: bool
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, temb, context):
        cfg = self.cfg
        skips = []
        for i in range(cfg.layers_per_block):
            x = ResnetBlock2D(
                self.out_channels, cfg.norm_num_groups, dtype=self.dtype,
                quant=self.quant, name=f"resnets_{i}",
            )(x, temb)
            if self.has_attn:
                heads = cfg.attention_head_dim
                x = Transformer2D(
                    heads, self.out_channels // heads, cfg.cross_attention_dim,
                    depth=cfg.transformer_depth, groups=cfg.norm_num_groups,
                    dtype=self.dtype, quant=self.quant, name=f"attentions_{i}",
                )(x, context)
            skips.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype,
                             quant=self.quant, name="downsamplers_0")(x)
            skips.append(x)
        return x, skips


class CrossAttnUpBlock(nn.Module):
    cfg: UNetConfig
    out_channels: int
    has_attn: bool
    add_upsample: bool
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, skips, temb, context):
        cfg = self.cfg
        for i in range(cfg.layers_per_block + 1):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock2D(
                self.out_channels, cfg.norm_num_groups, dtype=self.dtype,
                quant=self.quant, name=f"resnets_{i}",
            )(x, temb)
            if self.has_attn:
                heads = cfg.attention_head_dim
                x = Transformer2D(
                    heads, self.out_channels // heads, cfg.cross_attention_dim,
                    depth=cfg.transformer_depth, groups=cfg.norm_num_groups,
                    dtype=self.dtype, quant=self.quant, name=f"attentions_{i}",
                )(x, context)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           quant=self.quant, name="upsamplers_0")(x)
        return x


class MidBlock(nn.Module):
    cfg: UNetConfig
    channels: int
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, temb, context):
        cfg = self.cfg
        x = ResnetBlock2D(self.channels, cfg.norm_num_groups, dtype=self.dtype,
                          quant=self.quant, name="resnets_0")(x, temb)
        heads = cfg.attention_head_dim
        x = Transformer2D(
            heads, self.channels // heads, cfg.cross_attention_dim,
            depth=cfg.transformer_depth, groups=cfg.norm_num_groups,
            dtype=self.dtype, quant=self.quant, name="attentions_0",
        )(x, context)
        x = ResnetBlock2D(self.channels, cfg.norm_num_groups, dtype=self.dtype,
                          quant=self.quant, name="resnets_1")(x, temb)
        return x


class UNet2DCondition(nn.Module):
    """epsilon-prediction UNet.  Call: (latents NHWC, timesteps [B], context
    [B, S, cross_dim]) -> noise prediction NHWC."""

    cfg: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states):
        cfg = self.cfg
        context = encoder_hidden_states.astype(self.dtype)
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        temb = timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift
        ).astype(self.dtype)
        temb = TimestepEmbedding(
            cfg.block_out_channels[0] * 4, dtype=self.dtype, name="time_embedding"
        )(temb)

        x = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in"
        )(sample.astype(self.dtype))

        def level_quant(level: int) -> bool:
            return cfg.quant_int8 and level not in cfg.quant_skip_levels

        skips = [x]
        for i, out_ch in enumerate(cfg.block_out_channels):
            is_last = i == len(cfg.block_out_channels) - 1
            x, block_skips = CrossAttnDownBlock(
                cfg, out_ch, cfg.cross_attn_blocks[i], add_downsample=not is_last,
                dtype=self.dtype, quant=level_quant(i), name=f"down_blocks_{i}",
            )(x, temb, context)
            skips.extend(block_skips)

        x = MidBlock(
            cfg, cfg.block_out_channels[-1], dtype=self.dtype,
            quant=level_quant(len(cfg.block_out_channels) - 1), name="mid_block",
        )(x, temb, context)

        for i, out_ch in enumerate(reversed(cfg.block_out_channels)):
            rev = len(cfg.block_out_channels) - 1 - i
            is_last = i == len(cfg.block_out_channels) - 1
            x = CrossAttnUpBlock(
                cfg, out_ch, cfg.cross_attn_blocks[rev], add_upsample=not is_last,
                dtype=self.dtype, quant=level_quant(rev), name=f"up_blocks_{i}",
            )(x, skips, temb, context)

        x = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-5, dtype=jnp.float32, name="conv_norm_out")(x)
        x = nn.silu(x).astype(self.dtype)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=jnp.float32, name="conv_out")(x)
        return x
