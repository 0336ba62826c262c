"""Reward registry: single dispatch over reward types, mirroring the
reference's ``load_reward_model`` / ``calculate_reward`` surface
(/root/reference/edit_ppo/reward_model.py:34-161).

Types: depth | inception | segmentation | image_psnr | clip | dino
| llava | qwen_vl.  On TPU the backbone-based rewards take a jax ``encode``
(or depth/segment) callable — in-repo ViT backbones with converted weights,
or any user-supplied function; the VLM-judge rewards (llava / qwen_vl) run
through a host callback hook since generative VLM judges are host-side
services, not jittable graphs.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax

from consolver_tpu.rewards import metrics

REWARD_TYPES = (
    "depth",
    "inception",
    "segmentation",
    "image_psnr",
    "clip",
    "dino",
    "llava",
    "qwen_vl",
)


@dataclasses.dataclass
class RewardModel:
    """Bundle of callables backing a reward type.

    encode: images [B,H,W,C] in [0,1] -> features [B,D]   (dino/clip/inception)
    depth:  images -> depth maps [B,H,W]                   (depth)
    segment: images -> int class masks [B,H,W]             (segmentation)
    vlm_judge: host fn (pred_np, target_np) -> scores [B]  (llava/qwen_vl)
    """

    encode: Optional[Callable[[jax.Array], jax.Array]] = None
    depth: Optional[Callable[[jax.Array], jax.Array]] = None
    segment: Optional[Callable[[jax.Array], jax.Array]] = None
    vlm_judge: Optional[Callable] = None


def build_encoder_for(reward_type: str, params) -> Callable:
    """The production feature encoder for a backbone-cosine reward type
    from converted params (reward_model.py:59-64,92-134): dino -> DINOv2
    base CLS, clip -> CLIP-ViT-L/14 image embeds, inception -> the stock
    InceptionV3 eval forward (1000-class logits — the reference cosines
    the full classifier output, reward_model.py:339-341)."""
    if reward_type == "inception":
        from consolver_tpu.models.inception import (
            InceptionV3,
            make_inception_encoder,
        )

        return make_inception_encoder(InceptionV3(num_classes=1000), params)
    if reward_type in ("dino", "clip"):
        from consolver_tpu.models.vit import ViT, ViTConfig, make_encoder

        cfg = (
            ViTConfig.dinov2_base()
            if reward_type == "dino"
            else ViTConfig.clip_vit_l14()
        )
        return make_encoder(ViT(cfg), params, reward_type)
    raise ValueError(
        f"no feature encoder for reward type {reward_type!r} "
        "(expected dino | clip | inception)"
    )


def make_reward_fn(
    reward_type: str, model: Optional[RewardModel] = None
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Returns (pred_images, target_images) -> [B] rewards.

    Equivalent to reference ``calculate_reward`` dispatch
    (reward_model.py:138-161) but batched/on-device.
    """
    if reward_type not in REWARD_TYPES:
        raise ValueError(f"Unknown reward type {reward_type!r}; one of {REWARD_TYPES}")
    model = model or RewardModel()

    if reward_type == "image_psnr":
        return metrics.image_psnr_reward

    if reward_type in ("dino", "clip", "inception"):
        if model.encode is None:
            raise ValueError(
                f"reward type {reward_type!r} needs RewardModel.encode "
                "(a jax image-feature extractor; see models/vit.py converters)"
            )
        encode = model.encode
        return lambda pred, target: metrics.encoder_cosine_reward(encode, pred, target)

    if reward_type == "depth":
        if model.depth is None:
            raise ValueError("reward type 'depth' needs RewardModel.depth")
        depth = model.depth
        return lambda pred, target: metrics.depth_psnr_reward(depth(pred), depth(target))

    if reward_type == "segmentation":
        if model.segment is None:
            raise ValueError("reward type 'segmentation' needs RewardModel.segment")
        segment = model.segment
        return lambda pred, target: metrics.segmentation_reward(
            segment(pred), segment(target)
        )

    # VLM judges: host-side generative scoring (reward_model.py:164-214,259-317)
    if model.vlm_judge is None:
        raise ValueError(
            f"reward type {reward_type!r} needs RewardModel.vlm_judge "
            "(a host callable; wrap an external VLM service)"
        )
    judge = model.vlm_judge

    def vlm_reward(pred, target):
        import jax.numpy as jnp
        import numpy as np

        scores = judge(np.asarray(pred), np.asarray(target))
        return jnp.asarray(scores, jnp.float32)

    # host callables cannot be traced: trainers must call this eagerly
    # (PPOTrainer switches to its un-jitted decode-and-reward path)
    vlm_reward.host_side = True
    return vlm_reward
