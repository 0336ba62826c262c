"""FLUX-class rectified-flow DiT (double-stream MMDiT + single-stream
blocks), re-implemented in flax.

The reference drives ``FluxKontextPipeline`` from diffusers with the hub
transformer (edit_ppo/train_ppo.py:91, edit_ppo/pipeline.py:206-1158); this
is the in-repo TPU-native equivalent of that transformer.  Checkpoint keys
mirror diffusers ``FluxTransformer2DModel`` so models/convert.py converts hub
weights mechanically.

Also provides the latent 2x2 packing/unpacking and RoPE id helpers used by
the Kontext editing pipeline (edit_ppo/pipeline.py:589-609,660-741).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from consolver_tpu.kernels.attention import attention as attention_op
from consolver_tpu.models.layers import make_dense, timestep_embedding


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64  # 2x2-packed 16-channel latents
    hidden_size: int = 3072
    num_heads: int = 24
    num_double_blocks: int = 19
    num_single_blocks: int = 38
    joint_text_dim: int = 4096  # T5 features
    pooled_text_dim: int = 768  # CLIP pooled
    axes_dims: Tuple[int, ...] = (16, 56, 56)  # RoPE per-id-axis dims
    guidance_embeds: bool = True
    mlp_ratio: float = 4.0
    theta: int = 10000

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    # W8A8 int8 for the attention/FF/adaLN-modulation projections of the
    # stream blocks (kernels/quant.py); embedders and the final norm/proj
    # stay float.  At flux_kontext size this brings the 11.9B-param DiT to
    # ~12GB — inside a single 16GB chip (bf16 needs >= 2 chips + TP).
    quant_int8: bool = False
    # Packed 4-bit weights for the same projections (W4A16, group-128
    # scales): ~6.3GB at flux_kontext size — a memory/transfer knob, not a
    # speed knob (compute runs at the bf16 rate; int8 is faster).  Wins
    # when HBM headroom matters: 1024^2 single-chip work, 2x faster
    # host->device checkpoint loads.  Takes precedence over quant_int8.
    quant_int4: bool = False

    @property
    def quant_mode(self):
        """make_dense policy: "int4" | True (int8) | False."""
        return "int4" if self.quant_int4 else self.quant_int8

    @classmethod
    def flux_kontext(cls) -> "FluxConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "FluxConfig":
        return cls(
            in_channels=16,
            hidden_size=48,
            num_heads=2,
            num_double_blocks=2,
            num_single_blocks=2,
            joint_text_dim=32,
            pooled_text_dim=24,
            axes_dims=(8, 8, 8),
        )


# ---------------------------------------------------------------------------
# Latent packing + position ids (Kontext mechanics)
# ---------------------------------------------------------------------------


def pack_latents(latents: jax.Array) -> jax.Array:
    """[B, H, W, C] -> [B, (H/2)(W/2), 4C] 2x2 patchify
    (edit_ppo/pipeline.py:589-595, NHWC variant).

    Feature order within the packed 4C axis is channel-major (c, dy, dx)
    — index c*4 + dy*2 + dx — matching the reference's NCHW
    view+permute(0,2,4,1,3,5), so mechanically converted hub x_embedder /
    proj_out weights see the feature wiring they were trained on."""
    b, h, w, c = latents.shape
    x = latents.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (b, h/2, w/2, c, dy, dx)
    return x.reshape(b, (h // 2) * (w // 2), 4 * c)


def unpack_latents(packed: jax.Array, height: int, width: int) -> jax.Array:
    """[B, (H/2)(W/2), 4C] -> [B, H, W, C]  (edit_ppo/pipeline.py:598-609)."""
    b, _, c4 = packed.shape
    c = c4 // 4
    x = packed.reshape(b, height // 2, width // 2, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (b, h/2, dy, w/2, dx, c)
    return x.reshape(b, height, width, c)


def latent_image_ids(height: int, width: int, offset: float = 0.0) -> jax.Array:
    """[ (H/2)(W/2), 3 ] ids (t, row, col); reference-image ids get
    ids[..., 0] = 1 (edit_ppo/pipeline.py:660-741)."""
    h, w = height // 2, width // 2
    ids = jnp.zeros((h, w, 3), jnp.float32)
    ids = ids.at[..., 0].set(offset)
    ids = ids.at[..., 1].add(jnp.arange(h, dtype=jnp.float32)[:, None])
    ids = ids.at[..., 2].add(jnp.arange(w, dtype=jnp.float32)[None, :])
    return ids.reshape(h * w, 3)


def rope_freqs(ids: jax.Array, axes_dims: Tuple[int, ...], theta: int = 10000):
    """ids [S, 3] -> (cos, sin) each [S, head_dim/2] concatenated per axis."""
    outs_cos, outs_sin = [], []
    for axis, dim in enumerate(axes_dims):
        scale = jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
        omega = 1.0 / (theta**scale)
        out = ids[:, axis : axis + 1] * omega[None, :]  # [S, dim/2]
        outs_cos.append(jnp.cos(out))
        outs_sin.append(jnp.sin(out))
    return jnp.concatenate(outs_cos, axis=-1), jnp.concatenate(outs_sin, axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate interleaved pairs.  x [B, S, H, D]; cos/sin [S, D/2]."""
    b, s, h, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, s, h, d // 2, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    c = cos[None, :, None, :]
    si = sin[None, :, None, :]
    out = jnp.stack([x0 * c - x1 * si, x0 * si + x1 * c], axis=-1)
    return out.reshape(b, s, h, d).astype(x.dtype)


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


class MLPEmbedder(nn.Module):
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="linear_1")(x)
        return nn.Dense(self.hidden, dtype=self.dtype, name="linear_2")(nn.silu(x))


class QKNorm(nn.Module):
    """Per-head RMSNorm on q/k (eps 1e-6, learnable scale over head_dim)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones_init(), (x.shape[-1],))
        xf = x.astype(jnp.float32)
        normed = xf * jax.lax.rsqrt(jnp.mean(xf**2, axis=-1, keepdims=True) + 1e-6)
        return (normed * scale).astype(self.dtype)


def _modulate(x, shift, scale):
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


class DoubleStreamBlock(nn.Module):
    cfg: FluxConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img, txt, vec, cos, sin):
        cfg = self.cfg
        h, hd, nh = cfg.hidden_size, cfg.head_dim, cfg.num_heads
        mlp_h = int(h * cfg.mlp_ratio)
        b = img.shape[0]
        s_txt = txt.shape[1]

        mod_img = make_dense(cfg.quant_mode, 6 * h, dtype=self.dtype,
                             name="norm1_linear")(nn.silu(vec))
        mod_txt = make_dense(cfg.quant_mode, 6 * h, dtype=self.dtype,
                             name="norm1_context_linear")(nn.silu(vec))
        i_shift_a, i_scale_a, i_gate_a, i_shift_m, i_scale_m, i_gate_m = jnp.split(
            mod_img, 6, axis=-1
        )
        t_shift_a, t_scale_a, t_gate_a, t_shift_m, t_scale_m, t_gate_m = jnp.split(
            mod_txt, 6, axis=-1
        )

        ln = lambda name: nn.LayerNorm(
            epsilon=1e-6, use_bias=False, use_scale=False, dtype=jnp.float32, name=name
        )
        img_n = _modulate(ln("norm1")(img).astype(self.dtype), i_shift_a, i_scale_a)
        txt_n = _modulate(
            ln("norm1_context")(txt).astype(self.dtype), t_shift_a, t_scale_a
        )

        def qkv(x, prefix):
            q = make_dense(cfg.quant_mode, h, dtype=self.dtype, name=f"{prefix}q")(x)
            k = make_dense(cfg.quant_mode, h, dtype=self.dtype, name=f"{prefix}k")(x)
            v = make_dense(cfg.quant_mode, h, dtype=self.dtype, name=f"{prefix}v")(x)
            return (
                q.reshape(b, -1, nh, hd),
                k.reshape(b, -1, nh, hd),
                v.reshape(b, -1, nh, hd),
            )

        iq, ik, iv = qkv(img_n, "attn_to_")
        tq, tk, tv = qkv(txt_n, "attn_add_")
        iq = QKNorm(dtype=self.dtype, name="attn_norm_q")(iq)
        ik = QKNorm(dtype=self.dtype, name="attn_norm_k")(ik)
        tq = QKNorm(dtype=self.dtype, name="attn_norm_added_q")(tq)
        tk = QKNorm(dtype=self.dtype, name="attn_norm_added_k")(tk)

        q = jnp.concatenate([tq, iq], axis=1)
        k = jnp.concatenate([tk, ik], axis=1)
        v = jnp.concatenate([tv, iv], axis=1)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        out = attention_op(q, k, v).reshape(b, -1, h)
        txt_attn, img_attn = out[:, :s_txt], out[:, s_txt:]

        img = img + i_gate_a[:, None, :] * make_dense(
            cfg.quant_mode, h, dtype=self.dtype, name="attn_to_out_0"
        )(img_attn)
        txt = txt + t_gate_a[:, None, :] * make_dense(
            cfg.quant_mode, h, dtype=self.dtype, name="attn_to_add_out"
        )(txt_attn)

        img_m = _modulate(ln("norm2")(img).astype(self.dtype), i_shift_m, i_scale_m)
        txt_m = _modulate(
            ln("norm2_context")(txt).astype(self.dtype), t_shift_m, t_scale_m
        )
        img_ff = make_dense(cfg.quant_mode, h, dtype=self.dtype, name="ff_net_2")(
            nn.gelu(
                make_dense(cfg.quant_mode, mlp_h, dtype=self.dtype,
                           name="ff_net_0_proj")(img_m),
                approximate=True,
            )
        )
        txt_ff = make_dense(cfg.quant_mode, h, dtype=self.dtype,
                            name="ff_context_net_2")(
            nn.gelu(
                make_dense(cfg.quant_mode, mlp_h, dtype=self.dtype,
                           name="ff_context_net_0_proj")(txt_m),
                approximate=True,
            )
        )
        img = img + i_gate_m[:, None, :] * img_ff
        txt = txt + t_gate_m[:, None, :] * txt_ff
        return img, txt


class SingleStreamBlock(nn.Module):
    cfg: FluxConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, vec, cos, sin):
        cfg = self.cfg
        h, hd, nh = cfg.hidden_size, cfg.head_dim, cfg.num_heads
        mlp_h = int(h * cfg.mlp_ratio)
        b, s, _ = x.shape

        mod = make_dense(cfg.quant_mode, 3 * h, dtype=self.dtype,
                         name="norm_linear")(nn.silu(vec))
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        x_n = _modulate(
            nn.LayerNorm(
                epsilon=1e-6, use_bias=False, use_scale=False, dtype=jnp.float32,
                name="norm",
            )(x).astype(self.dtype),
            shift,
            scale,
        )

        q = make_dense(cfg.quant_mode, h, dtype=self.dtype, name="attn_to_q")(x_n).reshape(b, s, nh, hd)
        k = make_dense(cfg.quant_mode, h, dtype=self.dtype, name="attn_to_k")(x_n).reshape(b, s, nh, hd)
        v = make_dense(cfg.quant_mode, h, dtype=self.dtype, name="attn_to_v")(x_n).reshape(b, s, nh, hd)
        q = QKNorm(dtype=self.dtype, name="attn_norm_q")(q)
        k = QKNorm(dtype=self.dtype, name="attn_norm_k")(k)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = attention_op(q, k, v).reshape(b, s, h)

        mlp = nn.gelu(
            make_dense(cfg.quant_mode, mlp_h, dtype=self.dtype, name="proj_mlp")(x_n),
            approximate=True,
        )
        out = make_dense(cfg.quant_mode, h, dtype=self.dtype, name="proj_out")(
            jnp.concatenate([attn, mlp], axis=-1)
        )
        return x + gate[:, None, :] * out


class FluxTransformer(nn.Module):
    """Call: (packed_img [B,S_img,in_ch], txt [B,S_txt,joint_dim], pooled
    [B,pooled_dim], timestep [B] in train-timestep units (sigma*1000),
    guidance [B], img_ids [S_img,3], txt_ids [S_txt,3]) -> velocity
    [B, S_img, in_ch]."""

    cfg: FluxConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img, txt, pooled, timestep, guidance, img_ids, txt_ids):
        cfg = self.cfg
        h = cfg.hidden_size

        img = nn.Dense(h, dtype=self.dtype, name="x_embedder")(
            img.astype(self.dtype)
        )
        txt = nn.Dense(h, dtype=self.dtype, name="context_embedder")(
            txt.astype(self.dtype)
        )

        t_emb = timestep_embedding(timestep.astype(jnp.float32), 256).astype(self.dtype)
        vec = MLPEmbedder(h, dtype=self.dtype, name="timestep_embedder")(t_emb)
        if cfg.guidance_embeds:
            g_emb = timestep_embedding(
                guidance.astype(jnp.float32) * 1000.0, 256
            ).astype(self.dtype)
            vec = vec + MLPEmbedder(h, dtype=self.dtype, name="guidance_embedder")(g_emb)
        vec = vec + MLPEmbedder(h, dtype=self.dtype, name="text_embedder")(
            pooled.astype(self.dtype)
        )

        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        cos, sin = rope_freqs(ids, cfg.axes_dims, cfg.theta)

        for i in range(cfg.num_double_blocks):
            img, txt = DoubleStreamBlock(
                cfg, dtype=self.dtype, name=f"transformer_blocks_{i}"
            )(img, txt, vec, cos, sin)

        x = jnp.concatenate([txt, img], axis=1)
        for i in range(cfg.num_single_blocks):
            x = SingleStreamBlock(
                cfg, dtype=self.dtype, name=f"single_transformer_blocks_{i}"
            )(x, vec, cos, sin)
        x = x[:, txt.shape[1] :]

        # AdaLayerNormContinuous final norm
        mod = nn.Dense(2 * h, dtype=self.dtype, name="norm_out_linear")(nn.silu(vec))
        scale, shift = jnp.split(mod, 2, axis=-1)
        x = nn.LayerNorm(
            epsilon=1e-6, use_bias=False, use_scale=False, dtype=jnp.float32,
            name="norm_out_norm",
        )(x).astype(self.dtype)
        x = x * (1 + scale[:, None, :]) + shift[:, None, :]
        return nn.Dense(cfg.in_channels, dtype=jnp.float32, name="proj_out")(x)
