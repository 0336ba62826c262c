"""Consistency reward metrics, batched and on-device.

TPU-native rebuild of the reference reward semantics
(/root/reference/edit_ppo/reward_model.py) WITHOUT the per-image
PIL round-trips (reward_model.py:227-232 loops one image at a time through
CPU PIL conversions); here every metric is a pure batched jax function so the
whole reward computation fuses into the training step.

Exact formulas reproduced:
  * feature cosine -> [0, 100]:   (cos + 1) * 50        (:250-254,:349-353,:544-549)
  * image PSNR:  10*log10(1/(mse+1e-8)) clamp [0,100]   (:484-509)
  * depth PSNR:  per-map min-max normalize then PSNR, clamp >= 0  (:394-419)
  * segmentation "dice" (actually pixel accuracy) * 100 (:425-431,470-478)

Images are NHWC float in [0, 1].
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def image_psnr_reward(pred: jax.Array, target: jax.Array) -> jax.Array:
    """[B, H, W, C] x2 -> [B] PSNR in [0, 100]."""
    mse = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
    psnr = 10.0 * jnp.log10(1.0 / (mse + 1e-8))
    return jnp.clip(psnr, 0.0, 100.0)


def feature_cosine_reward(
    pred_features: jax.Array, target_features: jax.Array, eps: float = 1e-8
) -> jax.Array:
    """[B, D] features x2 -> [B] cosine similarity scaled to [0, 100]."""
    p = pred_features / jnp.maximum(
        jnp.linalg.norm(pred_features, axis=-1, keepdims=True), eps
    )
    t = target_features / jnp.maximum(
        jnp.linalg.norm(target_features, axis=-1, keepdims=True), eps
    )
    cos = jnp.sum(p * t, axis=-1)
    return (cos + 1.0) * 50.0


def _minmax_normalize(depth: jax.Array) -> jax.Array:
    """Per-map min-max normalization to [0, 1] (reward_model.py:394-398)."""
    lo = depth.min(axis=(-2, -1), keepdims=True)
    hi = depth.max(axis=(-2, -1), keepdims=True)
    return (depth - lo) / (hi - lo + 1e-8)


def depth_psnr_reward(pred_depth: jax.Array, target_depth: jax.Array) -> jax.Array:
    """[B, H, W] depth maps x2 -> [B] PSNR of min-max-normalized maps,
    clamped non-negative (reward_model.py:404-419)."""
    p = _minmax_normalize(pred_depth)
    t = _minmax_normalize(target_depth)
    mse = jnp.mean((p - t) ** 2, axis=(-2, -1))
    psnr = 10.0 * jnp.log10(1.0 / (mse + 1e-8))
    return jnp.maximum(psnr, 0.0)


def segmentation_reward(pred_mask: jax.Array, target_mask: jax.Array) -> jax.Array:
    """[B, H, W] int class masks x2 -> [B] pixel accuracy * 100.

    The reference names this "Dice" but computes plain pixel accuracy
    (reward_model.py:425-431) — reproduced as-is for metric parity.
    """
    acc = jnp.mean((pred_mask == target_mask).astype(jnp.float32), axis=(-2, -1))
    return acc * 100.0


def encoder_cosine_reward(
    encode_fn: Callable[[jax.Array], jax.Array],
    pred: jax.Array,
    target: jax.Array,
) -> jax.Array:
    """Generic backbone-feature consistency (dino / clip / inception rewards):
    one batched encoder call over [pred; target] instead of the reference's
    per-image loop."""
    feats = encode_fn(jnp.concatenate([pred, target], axis=0))
    pf, tf = jnp.split(feats, 2, axis=0)
    return feature_cosine_reward(pf, tf)
