"""Depth-Anything (DPT head on a DINOv2 ViT), re-implemented in flax.

Backs the reference's PRODUCTION SD reward: depth consistency via
Depth-Anything-V2-Small (reward_model.py:92-96, depth PSNR :359-422;
run_ppo.sh trains with reward_type=depth).  Architecture mirrors
transformers ``DepthAnythingForDepthEstimation``: DINOv2 backbone tapped at
``out_indices`` (shared final LN applied), DPT reassemble -> per-level conv
-> feature-fusion pyramid -> 3-conv head; checkpoint keys convert
mechanically.

NHWC throughout; torch ConvTranspose resizes are implemented as exact
einsum block-upsamples (kernel == stride), sidestepping flax/torch
transposed-conv layout mismatches.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from consolver_tpu.models.vit import ViT, ViTConfig


@dataclasses.dataclass(frozen=True)
class DepthAnythingConfig:
    backbone: ViTConfig = dataclasses.field(
        default_factory=lambda: ViTConfig(
            image_size=518, patch_size=14, hidden_size=384, num_layers=12,
            num_heads=6, layerscale=True, ln_eps=1e-6,
        )
    )
    out_indices: Tuple[int, ...] = (9, 10, 11, 12)  # 1-based encoder layers
    reassemble_factors: Tuple[float, ...] = (4, 2, 1, 0.5)
    neck_hidden_sizes: Tuple[int, ...] = (48, 96, 192, 384)
    fusion_hidden_size: int = 64
    head_hidden_size: int = 32

    @classmethod
    def small_v2(cls) -> "DepthAnythingConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "DepthAnythingConfig":
        return cls(
            backbone=ViTConfig(image_size=28, patch_size=14, hidden_size=32,
                               num_layers=4, num_heads=2, layerscale=True),
            out_indices=(1, 2, 3, 4),
            neck_hidden_sizes=(8, 8, 8, 8),
            fusion_hidden_size=8,
            head_hidden_size=8,
        )


def resize_align_corners(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bilinear NHWC resize with torch align_corners=True semantics."""
    b, h, w, c = x.shape
    oh, ow = size
    sh = (oh - 1) / max(h - 1, 1)
    sw = (ow - 1) / max(w - 1, 1)
    scale = jnp.asarray([sh, sw], jnp.float32)
    # jax samples input at (out + 0.5 - t)/s - 0.5; align_corners wants
    # in = out/s  =>  t = 0.5 - 0.5*s
    translation = jnp.asarray([0.5 - 0.5 * sh, 0.5 - 0.5 * sw], jnp.float32)
    return jax.image.scale_and_translate(
        x, (b, oh, ow, c), (1, 2), scale, translation, method="linear",
        antialias=False,
    )


class _BlockUpsample(nn.Module):
    """Exact torch ConvTranspose2d with kernel == stride: each input pixel
    expands to a k x k block."""

    channels: int
    factor: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.factor
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, c_in, self.channels)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.channels,))
        y = jnp.einsum(
            "bhwc,klco->bhkwlo", x.astype(self.dtype), kernel.astype(self.dtype)
        )
        b, h, _, w, _, o = y.shape
        return y.reshape(b, h * k, w * k, o) + bias


class _PreActResidual(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="convolution1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="convolution2")(h)
        return x + h


class _FusionLayer(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, size=None):
        if residual is not None:
            if x.shape != residual.shape:
                residual = jax.image.resize(residual, x.shape, "linear")
            x = x + _PreActResidual(self.channels, dtype=self.dtype, name="residual_layer1")(residual)
        x = _PreActResidual(self.channels, dtype=self.dtype, name="residual_layer2")(x)
        if size is None:
            size = (x.shape[1] * 2, x.shape[2] * 2)
        x = resize_align_corners(x, size)
        return nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="projection")(x)


class DepthAnything(nn.Module):
    """pixel_values NHWC (ImageNet-normalized) -> predicted depth [B, H, W]."""

    cfg: DepthAnythingConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.cfg
        bb = cfg.backbone
        b, h, w, _ = pixel_values.shape
        ph, pw = h // bb.patch_size, w // bb.patch_size

        taps = ViTTapped(bb, tuple(cfg.out_indices), dtype=self.dtype, name="backbone")(
            pixel_values
        )

        # reassemble: strip CLS, to grid, project, resize
        features: List[jax.Array] = []
        for i, (hs, ch, factor) in enumerate(
            zip(taps, cfg.neck_hidden_sizes, cfg.reassemble_factors)
        ):
            x = hs[:, 1:].reshape(b, ph, pw, bb.hidden_size)
            x = nn.Conv(ch, (1, 1), dtype=self.dtype, name=f"reassemble_{i}_projection")(x)
            if factor > 1:
                x = _BlockUpsample(ch, int(factor), dtype=self.dtype, name=f"reassemble_{i}_resize")(x)
            elif factor < 1:
                x = nn.Conv(
                    ch, (3, 3), strides=(int(1 / factor),) * 2, padding=1,
                    dtype=self.dtype, name=f"reassemble_{i}_resize",
                )(x)
            x = nn.Conv(
                cfg.fusion_hidden_size, (3, 3), padding=1, use_bias=False,
                dtype=self.dtype, name=f"neck_convs_{i}",
            )(x)
            features.append(x)

        # fusion pyramid: deepest first; each step upsamples to the next level
        features = features[::-1]
        fused = None
        for idx, feat in enumerate(features):
            size = (
                features[idx + 1].shape[1:3] if idx != len(features) - 1 else None
            )
            layer = _FusionLayer(
                cfg.fusion_hidden_size, dtype=self.dtype, name=f"fusion_{idx}"
            )
            fused = layer(feat, size=size) if fused is None else layer(fused, feat, size=size)

        # head
        x = nn.Conv(cfg.fusion_hidden_size // 2, (3, 3), padding=1, dtype=self.dtype, name="head_conv1")(fused)
        x = resize_align_corners(x, (ph * bb.patch_size, pw * bb.patch_size))
        x = nn.Conv(cfg.head_hidden_size, (3, 3), padding=1, dtype=self.dtype, name="head_conv2")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), dtype=self.dtype, name="head_conv3")(x)
        x = nn.relu(x)
        return x[..., 0]


class ViTTapped(nn.Module):
    """Our ViT trunk returning LN'd hidden states at the given 1-based
    encoder-layer indices (Dinov2Backbone semantics, apply_layernorm=True)."""

    cfg: ViTConfig
    out_indices: Tuple[int, ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        from consolver_tpu.models.vit import ViTBlock, _interpolate_pos

        cfg = self.cfg
        b = images.shape[0]
        x = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            use_bias=cfg.patch_bias, dtype=self.dtype, name="patch_embed",
        )(images.astype(self.dtype))
        x = x.reshape(b, -1, cfg.hidden_size)
        n = x.shape[1]
        cls = self.param("cls_token", nn.initializers.zeros_init(), (1, 1, cfg.hidden_size))
        x = jnp.concatenate([jnp.tile(cls.astype(self.dtype), (b, 1, 1)), x], axis=1)
        n += 1
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, (cfg.image_size // cfg.patch_size) ** 2 + 1, cfg.hidden_size),
        )
        if pos.shape[1] != n:
            pos = _interpolate_pos(pos, n, True)
        x = x + pos.astype(self.dtype)

        final_ln = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, name="norm")
        taps = []
        for i in range(cfg.num_layers):
            x = ViTBlock(cfg, dtype=self.dtype, name=f"blocks_{i}")(x)
            if (i + 1) in self.out_indices:
                taps.append(final_ln(x))
        return taps


def convert_depth_anything(state_dict, dtype=np.float32):
    """transformers DepthAnythingForDepthEstimation -> DepthAnything params."""
    from consolver_tpu.models import convert as _c

    renames = (
        # backbone (Dinov2Backbone under 'backbone.')
        (r"^backbone\.embeddings\.patch_embeddings\.projection\.", "backbone.patch_embed."),
        (r"^backbone\.embeddings\.cls_token$", "backbone.cls_token"),
        (r"^backbone\.embeddings\.position_embeddings$", "backbone.pos_embed"),
        (r"^backbone\.encoder\.layer\.(\d+)\.norm1\.", r"backbone.blocks.\1.norm1."),
        (r"^backbone\.encoder\.layer\.(\d+)\.norm2\.", r"backbone.blocks.\1.norm2."),
        (r"^backbone\.encoder\.layer\.(\d+)\.attention\.attention\.query\.", r"backbone.blocks.\1.q."),
        (r"^backbone\.encoder\.layer\.(\d+)\.attention\.attention\.key\.", r"backbone.blocks.\1.k."),
        (r"^backbone\.encoder\.layer\.(\d+)\.attention\.attention\.value\.", r"backbone.blocks.\1.v."),
        (r"^backbone\.encoder\.layer\.(\d+)\.attention\.output\.dense\.", r"backbone.blocks.\1.proj."),
        (r"^backbone\.encoder\.layer\.(\d+)\.layer_scale1\.lambda1$", r"backbone.blocks.\1.ls1"),
        (r"^backbone\.encoder\.layer\.(\d+)\.layer_scale2\.lambda1$", r"backbone.blocks.\1.ls2"),
        (r"^backbone\.encoder\.layer\.(\d+)\.mlp\.fc1\.", r"backbone.blocks.\1.fc1."),
        (r"^backbone\.encoder\.layer\.(\d+)\.mlp\.fc2\.", r"backbone.blocks.\1.fc2."),
        (r"^backbone\.layernorm\.", "backbone.norm."),
        # neck reassemble + convs
        (r"^neck\.reassemble_stage\.layers\.(\d+)\.projection\.", r"reassemble_\1_projection."),
        (r"^neck\.reassemble_stage\.layers\.(\d+)\.resize\.", r"reassemble_\1_resize."),
        (r"^neck\.convs\.(\d+)\.", r"neck_convs.\1."),
        # fusion
        (r"^neck\.fusion_stage\.layers\.(\d+)\.projection\.", r"fusion_\1.projection."),
        (r"^neck\.fusion_stage\.layers\.(\d+)\.residual_layer(\d)\.convolution(\d)\.",
         r"fusion_\1.residual_layer\2.convolution\3."),
        # head
        (r"^head\.conv1\.", "head_conv1."),
        (r"^head\.conv2\.", "head_conv2."),
        (r"^head\.conv3\.", "head_conv3."),
    )
    converted = _c.convert_state_dict(state_dict, renames=renames, dtype=dtype)
    params = converted["params"]

    # ConvTranspose resize weights arrive as torch [in, out, k, k] but the
    # generic rule transposed them as if [out, in, k, k]; fix to our
    # _BlockUpsample [k, k, in, out] layout.
    for name, node in params.items():
        if name.startswith("reassemble_") and name.endswith("_resize"):
            kern = np.asarray(node["kernel"])
            k = kern.shape[0]
            if kern.shape[0] == kern.shape[1] and kern.shape[0] in (2, 4):
                # generic rule did (2,3,1,0) on [in,out,k,k] -> [k,k,out,in];
                # swap the channel axes back to [k,k,in,out]
                node["kernel"] = kern.transpose(0, 1, 3, 2)
    return converted


def make_depth_fn(model: DepthAnything, params):
    """RewardModel.depth callable: images [B,H,W,3] in [0,1] -> depth maps
    [B,h,w] (post-processing resize to the input size happens inside the
    reward via min-max normalization invariance; the reference resizes the
    depth map to the image size first — we match sizes before PSNR)."""
    from consolver_tpu.models.vit import IMAGENET_MEAN, IMAGENET_STD, preprocess

    def depth(images):
        size = model.cfg.backbone.image_size
        x = preprocess(images, size, IMAGENET_MEAN, IMAGENET_STD, resize_to=None)
        d = model.apply(params, x)
        # resize depth back to the source resolution (reward_model.py:387-392)
        return jax.image.resize(
            d[..., None], (images.shape[0], images.shape[1], images.shape[2], 1),
            "linear",
        )[..., 0]

    return depth
