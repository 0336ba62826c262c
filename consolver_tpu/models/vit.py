"""Generic ViT image encoder covering the reward backbones.

The reference's feature-similarity rewards run DINOv2-base CLS features
(reward_model.py:59-64,217-257) and CLIP-ViT-L/14 image features
(:128-134,512-552) pulled from the hub.  This one configurable flax ViT
reproduces both towers (and Inception-style pooled features via mean-pool),
with converters from transformers ``Dinov2Model`` / ``CLIPVisionModel``
checkpoints and batched on-device preprocessing replacing the reference's
per-image PIL processor round-trips.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from consolver_tpu.kernels.attention import attention as attention_op

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    layerscale: bool = True  # DINOv2 LayerScale
    quick_gelu: bool = False  # CLIP uses quick_gelu
    pre_norm_embed: bool = False  # CLIP pre_layrnorm
    class_embedding: bool = True
    patch_bias: bool = True  # CLIP's patch embedding conv has no bias
    projection_dim: Optional[int] = None  # CLIP image projection
    ln_eps: float = 1e-6

    @classmethod
    def dinov2_base(cls) -> "ViTConfig":
        return cls(patch_size=14, hidden_size=768, num_layers=12, num_heads=12,
                   layerscale=True, ln_eps=1e-6)

    @classmethod
    def clip_vit_l14(cls) -> "ViTConfig":
        return cls(patch_size=14, hidden_size=1024, num_layers=24, num_heads=16,
                   layerscale=False, quick_gelu=True, pre_norm_embed=True,
                   patch_bias=False, projection_dim=768, ln_eps=1e-5)

    @classmethod
    def tiny(cls) -> "ViTConfig":
        return cls(image_size=28, patch_size=14, hidden_size=32, num_layers=2,
                   num_heads=2)


class ViTBlock(nn.Module):
    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = cfg.hidden_size
        head_dim = h // cfg.num_heads
        b, s, _ = x.shape

        y = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        q = nn.Dense(h, dtype=self.dtype, name="q")(y).reshape(b, s, cfg.num_heads, head_dim)
        k = nn.Dense(h, dtype=self.dtype, name="k")(y).reshape(b, s, cfg.num_heads, head_dim)
        v = nn.Dense(h, dtype=self.dtype, name="v")(y).reshape(b, s, cfg.num_heads, head_dim)
        attn = attention_op(q, k, v).reshape(b, s, h)
        attn = nn.Dense(h, dtype=self.dtype, name="proj")(attn)
        if cfg.layerscale:
            attn = attn * self.param(
                "ls1", nn.initializers.ones_init(), (h,)
            )
        x = x + attn

        y = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        y = nn.Dense(int(h * cfg.mlp_ratio), dtype=self.dtype, name="fc1")(y)
        y = y * jax.nn.sigmoid(1.702 * y) if cfg.quick_gelu else nn.gelu(y)
        y = nn.Dense(h, dtype=self.dtype, name="fc2")(y)
        if cfg.layerscale:
            y = y * self.param("ls2", nn.initializers.ones_init(), (h,))
        return x + y


class ViT(nn.Module):
    """images NHWC (already preprocessed/normalized) -> hidden states
    [B, 1+N, hidden]; ``features`` method returns the reward feature vector
    (CLS hidden for DINOv2, projected CLS for CLIP)."""

    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, return_features: bool = False):
        cfg = self.cfg
        b = images.shape[0]
        x = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            use_bias=cfg.patch_bias, dtype=self.dtype, name="patch_embed",
        )(images.astype(self.dtype))
        x = x.reshape(b, -1, cfg.hidden_size)
        n = x.shape[1]
        if cfg.class_embedding:
            cls = self.param(
                "cls_token", nn.initializers.zeros_init(), (1, 1, cfg.hidden_size)
            )
            x = jnp.concatenate([jnp.tile(cls.astype(self.dtype), (b, 1, 1)), x], axis=1)
            n += 1
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, (cfg.image_size // cfg.patch_size) ** 2 + int(cfg.class_embedding),
             cfg.hidden_size),
        )
        if pos.shape[1] != n:
            pos = _interpolate_pos(pos, n, cfg.class_embedding)
        x = x + pos.astype(self.dtype)
        if cfg.pre_norm_embed:
            x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, name="pre_norm")(x).astype(self.dtype)
        for i in range(cfg.num_layers):
            x = ViTBlock(cfg, dtype=self.dtype, name=f"blocks_{i}")(x)
        hidden = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, name="norm")(x)
        if cfg.projection_dim is not None:
            pooled = nn.Dense(
                cfg.projection_dim, use_bias=False, dtype=self.dtype,
                name="visual_projection",
            )(hidden[:, 0].astype(self.dtype))
        else:
            pooled = hidden[:, 0]
        if return_features:
            # CLS-token features (DINOv2 reward, reward_model.py:237) or CLIP
            # projected image features (:531)
            return pooled
        return hidden

    def features(self, images):
        return self(images, return_features=True)


def _interpolate_pos(pos, n_target, has_cls):
    """Bilinear position-embedding interpolation for off-grid image sizes."""
    cls_part = pos[:, :1] if has_cls else pos[:, :0]
    grid = pos[:, 1:] if has_cls else pos
    src = int(np.sqrt(grid.shape[1]))
    dst = int(np.sqrt(n_target - (1 if has_cls else 0)))
    grid = grid.reshape(1, src, src, -1)
    grid = jax.image.resize(grid, (1, dst, dst, grid.shape[-1]), "linear")
    return jnp.concatenate([cls_part, grid.reshape(1, dst * dst, -1)], axis=1)


# ---------------------------------------------------------------------------
# Preprocessing (replaces the per-image PIL processor loops)
# ---------------------------------------------------------------------------


def preprocess(
    images: jax.Array,
    size: int = 224,
    mean: Tuple[float, ...] = IMAGENET_MEAN,
    std: Tuple[float, ...] = IMAGENET_STD,
    resize_to: Optional[int] = 256,
    method: str = "linear",
) -> jax.Array:
    """[B,H,W,3] in [0,1] -> resized/center-cropped/normalized [B,size,size,3].

    Matches the hub processors' resize-shortest-edge + center-crop +
    normalize recipe (bilinear instead of PIL's resampling — metric deltas
    are within evaluation noise)."""
    b, h, w, c = images.shape
    if resize_to is not None:
        scale = resize_to / min(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        images = jax.image.resize(images, (b, nh, nw, c), method)
        h, w = nh, nw
    else:
        images = jax.image.resize(images, (b, size, size, c), method)
        h = w = size
    top, left = (h - size) // 2, (w - size) // 2
    images = images[:, top : top + size, left : left + size, :]
    mean_a = jnp.asarray(mean)[None, None, None, :]
    std_a = jnp.asarray(std)[None, None, None, :]
    return (images - mean_a) / std_a


def make_encoder(vit: ViT, params, kind: str = "dino"):
    """Build the RewardModel.encode callable: batched preprocess + features."""
    if kind == "dino":
        # BitImageProcessor: shortest-edge 256 bilinear + crop 224
        mean, std, resize_to, method = IMAGENET_MEAN, IMAGENET_STD, 256, "linear"
    elif kind == "clip":
        # CLIPImageProcessor: bicubic resample (validated vs transformers:
        # mean abs diff 0.0076 normalized units with cubic, 0.067 with linear)
        mean, std, resize_to, method = CLIP_MEAN, CLIP_STD, None, "cubic"
    else:
        mean, std, resize_to, method = IMAGENET_MEAN, IMAGENET_STD, None, "linear"

    def encode(images):
        x = preprocess(images, vit.cfg.image_size, mean, std, resize_to, method)
        return vit.apply(params, x, method=vit.features)

    return encode


# ---------------------------------------------------------------------------
# Weight converters
# ---------------------------------------------------------------------------


def convert_dinov2(state_dict, dtype=np.float32):
    """transformers Dinov2Model -> ViT params."""
    from consolver_tpu.models import convert as _c

    renames = (
        (r"^embeddings\.patch_embeddings\.projection\.", "patch_embed."),
        (r"^embeddings\.cls_token$", "cls_token"),
        (r"^embeddings\.position_embeddings$", "pos_embed"),
        (r"^encoder\.layer\.(\d+)\.norm1\.", r"blocks.\1.norm1."),
        (r"^encoder\.layer\.(\d+)\.norm2\.", r"blocks.\1.norm2."),
        (r"^encoder\.layer\.(\d+)\.attention\.attention\.query\.", r"blocks.\1.q."),
        (r"^encoder\.layer\.(\d+)\.attention\.attention\.key\.", r"blocks.\1.k."),
        (r"^encoder\.layer\.(\d+)\.attention\.attention\.value\.", r"blocks.\1.v."),
        (r"^encoder\.layer\.(\d+)\.attention\.output\.dense\.", r"blocks.\1.proj."),
        (r"^encoder\.layer\.(\d+)\.layer_scale1\.lambda1$", r"blocks.\1.ls1"),
        (r"^encoder\.layer\.(\d+)\.layer_scale2\.lambda1$", r"blocks.\1.ls2"),
        (r"^encoder\.layer\.(\d+)\.mlp\.fc1\.", r"blocks.\1.fc1."),
        (r"^encoder\.layer\.(\d+)\.mlp\.fc2\.", r"blocks.\1.fc2."),
        (r"^layernorm\.", "norm."),
    )
    return _c.convert_state_dict(state_dict, renames=renames, dtype=dtype)


def convert_clip_vision(state_dict, dtype=np.float32):
    """transformers CLIPVisionModelWithProjection -> ViT params."""
    from consolver_tpu.models import convert as _c

    renames = (
        (r"^vision_model\.embeddings\.patch_embedding\.", "patch_embed."),
        (r"^vision_model\.embeddings\.class_embedding$", "cls_token"),
        (r"^vision_model\.embeddings\.position_embedding\.weight$", "pos_embed"),
        (r"^vision_model\.pre_layrnorm\.", "pre_norm."),
        (r"^vision_model\.pre_layernorm\.", "pre_norm."),
        (r"^vision_model\.encoder\.layers\.(\d+)\.layer_norm1\.", r"blocks.\1.norm1."),
        (r"^vision_model\.encoder\.layers\.(\d+)\.layer_norm2\.", r"blocks.\1.norm2."),
        (r"^vision_model\.encoder\.layers\.(\d+)\.self_attn\.q_proj\.", r"blocks.\1.q."),
        (r"^vision_model\.encoder\.layers\.(\d+)\.self_attn\.k_proj\.", r"blocks.\1.k."),
        (r"^vision_model\.encoder\.layers\.(\d+)\.self_attn\.v_proj\.", r"blocks.\1.v."),
        (r"^vision_model\.encoder\.layers\.(\d+)\.self_attn\.out_proj\.", r"blocks.\1.proj."),
        (r"^vision_model\.encoder\.layers\.(\d+)\.mlp\.fc1\.", r"blocks.\1.fc1."),
        (r"^vision_model\.encoder\.layers\.(\d+)\.mlp\.fc2\.", r"blocks.\1.fc2."),
        (r"^vision_model\.post_layernorm\.", "norm."),
        (r"^visual_projection\.", "visual_projection."),
    )
    converted = _c.convert_state_dict(state_dict, renames=renames, dtype=dtype)
    params = converted["params"]
    # class_embedding is [hidden] in CLIP -> [1,1,hidden]
    cls = np.asarray(params["cls_token"])
    params["cls_token"] = cls.reshape(1, 1, -1)
    # position_embedding is an nn.Embedding table [N, hidden] -> [1, N, hidden]
    pos = np.asarray(params["pos_embed"])
    if pos.ndim == 2:
        params["pos_embed"] = pos.reshape(1, *pos.shape)
    return converted
