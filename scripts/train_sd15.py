#!/usr/bin/env python
"""SD-1.5 ConsistencySolver PPO training entrypoint.

TPU-native equivalent of run_ppo.sh -> train_ppo.py.  Usage:

  python scripts/train_sd15.py --preset sd15_ppo \
      --set model.pretrained_path=ckpts/sd15 \
      --set data.train_data_dir=data/teacher/sd15

With no pretrained_path it builds tiny random models (smoke mode) so the
full loop is runnable anywhere.  Checkpoint layout under
model.pretrained_path: unet/ vae/ clip_text/ (orbax trees written by
scripts/convert_checkpoints.py).
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon TPU plugin ignores the plain env override; CPU smoke runs of
    # this CLI (tests, scripts/drive_resume.py --tiny) need the config pin
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np


# canonical implementations live in the package so the serving engines'
# hot-reload path (serve/engine.load_factor_ckpt) shares them; re-exported
# here for the existing CLI/test import surface
from consolver_tpu.policy.io import load_factor_ckpt, load_orbax  # noqa: E402,F401


def load_model_config(path, cls, default):
    """Read the {ckpt}_config.json written by scripts/convert_checkpoints.py
    (tuples round-trip json as lists, so coerce them back)."""
    import json

    cfg_path = path.rstrip("/") + "_config.json"
    if not os.path.exists(cfg_path):
        return default
    with open(cfg_path) as f:
        raw = json.load(f)
    fixed = {k: tuple(v) if isinstance(v, list) else v for k, v in raw.items()}
    return cls(**fixed)


def build_pipeline(cfg, factor_net, factor_params):
    from consolver_tpu.core import schedules
    from consolver_tpu.data.tokenizer import load_tokenizer
    from consolver_tpu.models.clip_text import ClipTextConfig, ClipTextEncoder
    from consolver_tpu.models.unet_2d import UNetConfig, UNet2DCondition
    from consolver_tpu.models.vae import AutoencoderKL, VaeConfig
    from consolver_tpu.pipelines.t2i import TextToImagePipeline

    dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32
    pretrained = cfg.model.pretrained_path
    if pretrained:
        up, vp, tp = (os.path.join(pretrained, d) for d in ("unet", "vae", "clip_text"))
        ucfg = load_model_config(up, UNetConfig, UNetConfig.sd15())
        vcfg = load_model_config(vp, VaeConfig, VaeConfig.sd15())
        tcfg = load_model_config(tp, ClipTextConfig, ClipTextConfig.sd15())
        unet, vae = UNet2DCondition(ucfg, dtype=dtype), AutoencoderKL(vcfg, dtype=dtype)
        te = ClipTextEncoder(tcfg, dtype=dtype)
        from consolver_tpu.utils.trees import cast_floating

        def maybe_cast(params, mcfg):
            # quantized serving checkpoints are serving-ready: their float
            # residue (int8 scales, norms, biases) must load VERBATIM so
            # the loaded pipeline is bit-identical to in-memory .quantize()
            if getattr(mcfg, "quant_int8", False) or getattr(
                mcfg, "quant_int4", False
            ):
                return params
            # converted checkpoints store float32; train in model.dtype
            # like the reference's weight_dtype cast (train_ppo.py:156-165)
            # — at f32 the resident SD stack OOMs the batch-80 step
            return cast_floating(params, dtype)

        unet_params = maybe_cast(load_orbax(up), ucfg)
        vae_params = maybe_cast(load_orbax(vp), vcfg)
        te_params = maybe_cast(load_orbax(tp), tcfg)
    else:
        print("[smoke mode] no pretrained_path: tiny random models")
        ucfg, vcfg, tcfg = UNetConfig.tiny(), VaeConfig.tiny(), ClipTextConfig.tiny()
        unet, vae = UNet2DCondition(ucfg), AutoencoderKL(vcfg)
        te = ClipTextEncoder(tcfg)
        k = jax.random.split(jax.random.key(0), 4)
        # jitted inits: eager flax .init dispatches hundreds of per-op
        # compiles, each a serialized RPC on the tunneled TPU (minutes)
        unet_params = jax.jit(unet.init)(
            k[0], jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 4, tcfg.hidden_size)),
        )
        vae_params = jax.jit(vae.init)(k[1], jnp.zeros((1, 16, 16, 3)), k[2])
        te_params = jax.jit(te.init)(k[3], jnp.zeros((1, 4), jnp.int32))

    return TextToImagePipeline(
        unet, unet_params, te, te_params, vae, vae_params,
        schedules.DiffusionSchedule.sd15(),
        factor_net=factor_net, factor_params=factor_params,
        tokenizer=load_tokenizer(
            os.path.join(pretrained, "tokenizer") if pretrained else None
        ),
    )


def build_reward(cfg):
    from consolver_tpu.rewards.registry import RewardModel, make_reward_fn

    rtype = cfg.reward.reward_type
    model = RewardModel()
    if rtype in ("dino", "clip", "inception") and cfg.reward.encoder_checkpoint:
        from consolver_tpu.rewards.registry import build_encoder_for

        params = load_orbax(cfg.reward.encoder_checkpoint)
        model = RewardModel(encode=build_encoder_for(rtype, params))
    elif rtype in ("llava", "qwen_vl") and cfg.reward.encoder_checkpoint:
        # encoder_checkpoint doubles as the local VLM-judge checkpoint dir;
        # the qwen variant uses its own message format + strict parse
        # (edit_ppo/reward_model.py:258-317)
        from consolver_tpu.rewards.vlm import (
            load_transformers_judge, load_transformers_qwen_judge,
        )

        loader = (
            load_transformers_qwen_judge if rtype == "qwen_vl"
            else load_transformers_judge
        )
        model = RewardModel(vlm_judge=loader(cfg.reward.encoder_checkpoint))
    elif rtype != "image_psnr" and not cfg.reward.encoder_checkpoint:
        print(f"[smoke mode] reward {rtype!r} needs encoder_checkpoint; using image_psnr")
        rtype = "image_psnr"
    return make_reward_fn(rtype, model)


def main():
    from consolver_tpu.configs.config import parse_cli
    from consolver_tpu.data.group import TeacherDataset
    from consolver_tpu.policy import FactorNet
    from consolver_tpu.rl.train import PPOTrainer
    from consolver_tpu.utils.logging import MetricLogger

    from consolver_tpu.dist import mesh as meshlib

    cfg = parse_cli()
    fnet = FactorNet(cfg.factor_net)
    fparams = fnet.init(jax.random.key(cfg.train.seed))
    pipe = build_pipeline(cfg, fnet, fparams)
    if cfg.model.quantize_rollout and not pipe.unet.cfg.quant_int8:
        # int8 rollout environment (measured-fastest hybrid: UNet level 0
        # stays bf16); the PPO update path is unaffected.  Skipped if the
        # checkpoint is already an int8 serving tree (quant_int8 in its
        # _config.json).
        pipe = pipe.quantize()
    reward_fn = build_reward(cfg)

    # topology from config (run_ppo.sh:5 --num_processes equivalent): the
    # group batch shards over the data axis, one prompt group per shard
    mesh = meshlib.mesh_from_config(
        cfg.dist.data_parallel, cfg.dist.model_parallel
    )
    trainer = PPOTrainer(pipe, reward_fn, cfg.train, mesh=mesh)
    trainer.resume_from_checkpoint("latest")
    logger = MetricLogger(cfg.train.output_dir, config=dataclasses.asdict(cfg))

    dataset = TeacherDataset(cfg.data.train_data_dir)
    # data.batch_size is PER SHARD (the reference's per-process
    # train_batch_size); the dataset yields the global batch
    global_batch = cfg.data.batch_size * (
        meshlib.data_axis_size(mesh) if mesh is not None else 1
    )

    def batches():
        epoch = 0
        while True:
            yield from dataset.batches(global_batch, seed=epoch, shuffle=cfg.data.shuffle)
            epoch += 1

    trainer.fit(batches(), log_fn=logger.log)
    trainer.save_checkpoint()
    logger.close()


if __name__ == "__main__":
    main()
