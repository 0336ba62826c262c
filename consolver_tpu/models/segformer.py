"""SegFormer (MiT encoder + all-MLP decode head), re-implemented in flax.

Backs the reference's segmentation-consistency reward: SegFormer-b4-ADE
argmax masks compared by pixel accuracy (reward_model.py:110-117,433-481).
Architecture mirrors transformers ``SegformerForSemanticSegmentation``:
overlapping patch embeds, efficient self-attention with sequence reduction,
Mix-FFN with a depthwise conv, per-stage LN, decode head with per-stage
linear + upsample + fused conv + (inference-mode) BatchNorm + classifier.
NHWC throughout; checkpoint keys convert mechanically.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from consolver_tpu.kernels.attention import attention as attention_op


@dataclasses.dataclass(frozen=True)
class SegformerConfig:
    num_channels: int = 3
    hidden_sizes: Tuple[int, ...] = (64, 128, 320, 512)
    depths: Tuple[int, ...] = (3, 8, 27, 3)  # b4
    num_heads: Tuple[int, ...] = (1, 2, 5, 8)
    patch_sizes: Tuple[int, ...] = (7, 3, 3, 3)
    strides: Tuple[int, ...] = (4, 2, 2, 2)
    sr_ratios: Tuple[int, ...] = (8, 4, 2, 1)
    mlp_ratios: Tuple[int, ...] = (4, 4, 4, 4)
    decoder_hidden_size: int = 768
    num_labels: int = 150  # ADE20k
    ln_eps: float = 1e-5  # all torch nn.LayerNorm defaults in segformer
    bn_eps: float = 1e-5

    @classmethod
    def b4_ade(cls) -> "SegformerConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "SegformerConfig":
        return cls(
            hidden_sizes=(8, 16), depths=(1, 1), num_heads=(1, 2),
            patch_sizes=(7, 3), strides=(4, 2), sr_ratios=(2, 1),
            mlp_ratios=(2, 2), decoder_hidden_size=16, num_labels=5,
        )

    @property
    def num_stages(self) -> int:
        return len(self.hidden_sizes)


class _EfficientAttention(nn.Module):
    hidden: int
    heads: int
    sr_ratio: int
    ln_eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw):
        h, w = hw
        b, s, _ = x.shape
        head_dim = self.hidden // self.heads
        q = nn.Dense(self.hidden, dtype=self.dtype, name="query")(x)
        kv_in = x
        if self.sr_ratio > 1:
            grid = x.reshape(b, h, w, self.hidden)
            grid = nn.Conv(
                self.hidden, (self.sr_ratio, self.sr_ratio),
                strides=(self.sr_ratio, self.sr_ratio), padding="VALID",
                dtype=self.dtype, name="sr",
            )(grid)
            kv_in = grid.reshape(b, -1, self.hidden)
            kv_in = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32, name="sr_norm")(kv_in).astype(self.dtype)
        k = nn.Dense(self.hidden, dtype=self.dtype, name="key")(kv_in)
        v = nn.Dense(self.hidden, dtype=self.dtype, name="value")(kv_in)
        sk = k.shape[1]
        out = attention_op(
            q.reshape(b, s, self.heads, head_dim),
            k.reshape(b, sk, self.heads, head_dim),
            v.reshape(b, sk, self.heads, head_dim),
        ).reshape(b, s, self.hidden)
        return nn.Dense(self.hidden, dtype=self.dtype, name="out")(out)


class _MixFFN(nn.Module):
    hidden: int
    mlp_hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw):
        h, w = hw
        b = x.shape[0]
        x = nn.Dense(self.mlp_hidden, dtype=self.dtype, name="dense1")(x)
        grid = x.reshape(b, h, w, self.mlp_hidden)
        grid = nn.Conv(
            self.mlp_hidden, (3, 3), padding=1, feature_group_count=self.mlp_hidden,
            dtype=self.dtype, name="dwconv",
        )(grid)
        x = nn.gelu(grid.reshape(b, h * w, self.mlp_hidden), approximate=False)
        return nn.Dense(self.hidden, dtype=self.dtype, name="dense2")(x)


class _SegformerLayer(nn.Module):
    cfg: SegformerConfig
    stage: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, hw):
        cfg = self.cfg
        hidden = cfg.hidden_sizes[self.stage]
        y = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, name="layer_norm_1")(x).astype(self.dtype)
        x = x + _EfficientAttention(
            hidden, cfg.num_heads[self.stage], cfg.sr_ratios[self.stage],
            cfg.ln_eps, dtype=self.dtype, name="attention",
        )(y, hw)
        y = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, name="layer_norm_2")(x).astype(self.dtype)
        x = x + _MixFFN(
            hidden, int(hidden * cfg.mlp_ratios[self.stage]), dtype=self.dtype,
            name="mlp",
        )(y, hw)
        return x


class _InferenceBatchNorm(nn.Module):
    """BatchNorm2d in eval mode: affine transform with stored statistics."""

    channels: int
    eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones_init(), (self.channels,))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.channels,))
        mean = self.param("mean", nn.initializers.zeros_init(), (self.channels,))
        var = self.param("var", nn.initializers.ones_init(), (self.channels,))
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + self.eps) * scale
        return (x.astype(jnp.float32) - mean) * inv + bias


class Segformer(nn.Module):
    """pixel_values NHWC (ImageNet-normalized) -> logits [B, H/4, W/4, L]."""

    cfg: SegformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.cfg
        b = pixel_values.shape[0]
        x = pixel_values.astype(self.dtype)

        stage_feats = []
        hw = None
        for i in range(cfg.num_stages):
            patch = cfg.patch_sizes[i]
            x_in = x if i == 0 else x
            grid = x_in if x_in.ndim == 4 else x_in.reshape(b, *hw, -1)
            grid = nn.Conv(
                cfg.hidden_sizes[i], (patch, patch), strides=(cfg.strides[i],) * 2,
                padding=patch // 2, dtype=self.dtype, name=f"patch_embeddings_{i}_proj",
            )(grid)
            hw = grid.shape[1:3]
            x = grid.reshape(b, hw[0] * hw[1], cfg.hidden_sizes[i])
            x = nn.LayerNorm(
                epsilon=1e-5, dtype=jnp.float32, name=f"patch_embeddings_{i}_norm"
            )(x).astype(self.dtype)
            for j in range(cfg.depths[i]):
                x = _SegformerLayer(
                    cfg, i, dtype=self.dtype, name=f"block_{i}_{j}"
                )(x, hw)
            x = nn.LayerNorm(
                epsilon=1e-5, dtype=jnp.float32, name=f"stage_norm_{i}"
            )(x)
            stage_feats.append((x.reshape(b, *hw, -1), hw))

        # decode head
        target_hw = stage_feats[0][1]
        ups = []
        for i, (feat, fhw) in enumerate(stage_feats):
            y = nn.Dense(
                cfg.decoder_hidden_size, dtype=self.dtype, name=f"linear_c_{i}"
            )(feat.astype(self.dtype))
            y = jax.image.resize(
                y, (b, *target_hw, cfg.decoder_hidden_size), "linear"
            )
            ups.append(y)
        fused = jnp.concatenate(ups[::-1], axis=-1)
        fused = nn.Conv(
            cfg.decoder_hidden_size, (1, 1), use_bias=False, dtype=self.dtype,
            name="linear_fuse",
        )(fused)
        fused = _InferenceBatchNorm(
            cfg.decoder_hidden_size, cfg.bn_eps, name="batch_norm"
        )(fused)
        fused = nn.relu(fused).astype(self.dtype)
        return nn.Conv(cfg.num_labels, (1, 1), dtype=jnp.float32, name="classifier")(fused)


def convert_segformer(state_dict, dtype=np.float32):
    """transformers SegformerForSemanticSegmentation -> Segformer params."""
    from consolver_tpu.models import convert as _c

    renames = (
        (r"^segformer\.encoder\.patch_embeddings\.(\d+)\.proj\.", r"patch_embeddings_\1_proj."),
        (r"^segformer\.encoder\.patch_embeddings\.(\d+)\.layer_norm\.", r"patch_embeddings_\1_norm."),
        (r"^segformer\.encoder\.block\.(\d+)\.(\d+)\.", r"block_\1_\2."),
        (r"^segformer\.encoder\.layer_norm\.(\d+)\.", r"stage_norm_\1."),
        (r"\.attention\.self\.query\.", ".attention.query."),
        (r"\.attention\.self\.key\.", ".attention.key."),
        (r"\.attention\.self\.value\.", ".attention.value."),
        (r"\.attention\.self\.sr\.", ".attention.sr."),
        (r"\.attention\.self\.layer_norm\.", ".attention.sr_norm."),
        (r"\.attention\.output\.dense\.", ".attention.out."),
        (r"\.mlp\.dense1\.", ".mlp.dense1."),
        (r"\.mlp\.dwconv\.dwconv\.", ".mlp.dwconv."),
        (r"\.mlp\.dense2\.", ".mlp.dense2."),
        (r"^decode_head\.linear_c\.(\d+)\.proj\.", r"linear_c_\1."),
        (r"^decode_head\.linear_fuse\.", "linear_fuse."),
        (r"^decode_head\.batch_norm\.weight$", "batch_norm.scale"),
        (r"^decode_head\.batch_norm\.bias$", "batch_norm.bias"),
        (r"^decode_head\.batch_norm\.running_mean$", "batch_norm.mean"),
        (r"^decode_head\.batch_norm\.running_var$", "batch_norm.var"),
        (r"^decode_head\.classifier\.", "classifier."),
    )
    converted = _c.convert_state_dict(state_dict, renames=renames, dtype=dtype)
    params = converted["params"]

    # depthwise conv: torch groups=C weight [C, 1, 3, 3]; generic rule gave
    # [3, 3, 1, C] which is exactly flax's grouped-conv layout — OK as-is.
    # num_batches_tracked is skipped below.
    return converted


def make_segment_fn(model: Segformer, params):
    """RewardModel.segment: images [B,H,W,3] in [0,1] -> argmax masks [B,h,w]
    at the logits resolution (the reference computes pixel accuracy at the
    feature resolution, reward_model.py:458-471)."""
    from consolver_tpu.models.vit import IMAGENET_MEAN, IMAGENET_STD, preprocess

    def segment(images):
        x = preprocess(images, 512, IMAGENET_MEAN, IMAGENET_STD, resize_to=None)
        logits = model.apply(params, x)
        return jnp.argmax(logits, axis=-1)

    return segment
