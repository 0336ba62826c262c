"""AutoencoderKL (SD VAE), re-implemented in flax (NHWC).

TPU-native equivalent of the diffusers VAE the reference loads from the hub
(train_ppo.py:115-119); decode replaces the reference's micro-batched
``decode_latents`` (utils.py:6-34) — on TPU the whole batch decodes in one
fused call.  HF checkpoints convert 1:1 (models/convert.py).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from consolver_tpu.models.layers import (
    Downsample2D,
    ResnetBlock2D,
    Upsample2D,
    VaeAttention,
)


@dataclasses.dataclass(frozen=True)
class VaeConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    # W8A8 int8 convs/denses in the DECODER only (kernels/quant.py): the
    # preview hot path decodes every rollout; the encoder (data prep) stays
    # float.  conv_in/out stay float.
    quant_int8: bool = False

    @classmethod
    def sd15(cls) -> "VaeConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "VaeConfig":
        return cls(
            block_out_channels=(16, 32), layers_per_block=1, norm_num_groups=4
        )


class _MidBlock(nn.Module):
    channels: int
    groups: int
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock2D(self.channels, self.groups, dtype=self.dtype,
                          quant=self.quant, name="resnets_0")(x)
        x = VaeAttention(self.groups, dtype=self.dtype, quant=self.quant,
                         name="attentions_0")(x)
        x = ResnetBlock2D(self.channels, self.groups, dtype=self.dtype,
                          quant=self.quant, name="resnets_1")(x)
        return x


class DownEncoderBlock(nn.Module):
    out_channels: int
    layers: int
    groups: int
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for j in range(self.layers):
            x = ResnetBlock2D(self.out_channels, self.groups, dtype=self.dtype, name=f"resnets_{j}")(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
        return x


class UpDecoderBlock(nn.Module):
    out_channels: int
    layers: int
    groups: int
    add_upsample: bool
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        for j in range(self.layers):
            x = ResnetBlock2D(self.out_channels, self.groups, dtype=self.dtype,
                              quant=self.quant, name=f"resnets_{j}")(x)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           quant=self.quant, name="upsamplers_0")(x)
        return x


class Encoder(nn.Module):
    cfg: VaeConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
            x.astype(self.dtype)
        )
        for i, out_ch in enumerate(cfg.block_out_channels):
            x = DownEncoderBlock(
                out_ch, cfg.layers_per_block, cfg.norm_num_groups,
                add_downsample=i != len(cfg.block_out_channels) - 1,
                dtype=self.dtype, name=f"down_blocks_{i}",
            )(x)
        x = _MidBlock(cfg.block_out_channels[-1], cfg.norm_num_groups, dtype=self.dtype, name="mid_block")(x)
        x = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, dtype=jnp.float32, name="conv_norm_out")(x)
        x = nn.silu(x).astype(self.dtype)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=jnp.float32, name="conv_out")(x)


class Decoder(nn.Module):
    cfg: VaeConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        x = nn.Conv(cfg.block_out_channels[-1], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
            z.astype(self.dtype)
        )
        x = _MidBlock(cfg.block_out_channels[-1], cfg.norm_num_groups,
                      dtype=self.dtype, quant=cfg.quant_int8, name="mid_block")(x)
        reversed_channels = list(reversed(cfg.block_out_channels))
        for i, out_ch in enumerate(reversed_channels):
            x = UpDecoderBlock(
                out_ch, cfg.layers_per_block + 1, cfg.norm_num_groups,
                add_upsample=i != len(reversed_channels) - 1,
                dtype=self.dtype, quant=cfg.quant_int8, name=f"up_blocks_{i}",
            )(x)
        x = nn.GroupNorm(cfg.norm_num_groups, epsilon=1e-6, dtype=jnp.float32, name="conv_norm_out")(x)
        x = nn.silu(x).astype(self.dtype)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=jnp.float32, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    """Methods: encode (returns mean/logvar), decode, plus quant convs."""

    cfg: VaeConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, dtype=self.dtype)
        self.decoder = Decoder(self.cfg, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1), name="post_quant_conv")

    def encode(self, x):
        """x NHWC in [-1, 1] -> (mean, logvar) each [B, h, w, latent_channels]."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        """z (unscaled latents) NHWC -> image NHWC in [-1, 1] (approx)."""
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, key):
        mean, logvar = self.encode(x)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape)
        return self.decode(z), mean, logvar


def chunked_apply(fn, x, chunk):
    """Apply ``fn`` over [chunk]-sized batch slices via one in-program
    ``lax.map`` — the TPU-native micro-batch loop (reference utils.py:6-34),
    bounding ``fn``'s activation memory to one chunk.  Ragged batches are
    padded to a chunk multiple and sliced back (the reference's python loop
    handles the tail the same way).  ``chunk=None`` or ``chunk >= B`` is one
    fused whole-batch call."""
    b = x.shape[0]
    if chunk is None or b <= chunk:
        return fn(x)
    pad = (-b) % chunk
    if pad:
        x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
    xc = x.reshape((b + pad) // chunk, chunk, *x.shape[1:])
    out = jax.lax.map(fn, xc)
    return out.reshape(b + pad, *out.shape[2:])[:b]


def decode_latents(vae: AutoencoderKL, params, latents, scaling_factor=None,
                   chunk=None):
    """Scaled-latents -> images in [0, 1]  (reference utils.py:6-34).

    ``chunk=None`` decodes the whole batch in one fused call (fastest when
    it fits).  ``chunk=k`` micro-batches the decode via :func:`chunked_apply`
    — needed for the production batch-80 PPO step where an 80x512^2
    whole-batch decode overflows one chip's HBM."""
    sf = scaling_factor if scaling_factor is not None else vae.cfg.scaling_factor
    img = chunked_apply(
        lambda c: vae.apply(params, c, method=vae.decode), latents / sf, chunk
    )
    return jnp.clip(img / 2 + 0.5, 0.0, 1.0)
