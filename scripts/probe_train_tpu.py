#!/usr/bin/env python
"""Real-TPU probe: the PRODUCTION SD-1.5 PPO training step on one chip.

The reference trains on one A100 at batch 80 (run_ppo.sh:5-33: bs=80,
order_dim=4, 11 actions, fp16, grad ckpt).  This drives our PPOTrainer at
that exact configuration — SD-1.5-size bf16 UNet (859.5M) rollout, VAE
decode of policy+teacher previews, on-device reward, FactorNet PPO update —
and reports compile + steady step time and peak-memory fit on one v5e chip.

Random weights: step time does not depend on weight values.

  python scripts/probe_train_tpu.py [--batch 80] [--steps 8]
      [--reward image_psnr|depth] [--iters 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=80)  # run_ppo.sh train_batch_size
    ap.add_argument("--steps", type=int, default=8,
                    help="fixed num_inference for the probe (production draws "
                    "[2,16) per step; each count is its own program)")
    ap.add_argument("--reward", default="image_psnr",
                    choices=["image_psnr", "depth"])
    ap.add_argument("--decode-chunk", type=int, default=8,
                    help="VAE-decode micro-batch (reference utils.py:6-34 "
                    "uses 8); whole-batch decode at 80x512^2 OOMs one chip")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--quantize", action="store_true",
                    help="int8 rollout environment (ModelConfig."
                    "quantize_rollout): hybrid-int8 UNet + int8 VAE decode")
    args = ap.parse_args()

    from bench import random_params_like
    from consolver_tpu.core import schedules
    from consolver_tpu.models.clip_text import ClipTextConfig, ClipTextEncoder
    from consolver_tpu.models.unet_2d import UNetConfig, UNet2DCondition
    from consolver_tpu.models.vae import AutoencoderKL, VaeConfig
    from consolver_tpu.pipelines.t2i import TextToImagePipeline
    from consolver_tpu.policy import FactorNet, FactorNetConfig
    from consolver_tpu.rewards.registry import RewardModel, make_reward_fn
    from consolver_tpu.rl.ppo import PPOConfig
    from consolver_tpu.rl.train import PPOTrainer, TrainConfig

    print(f"platform: {jax.devices()[0].platform}", flush=True)

    ucfg = UNetConfig.sd15()
    unet = UNet2DCondition(ucfg, dtype=jnp.bfloat16)
    ushapes = jax.eval_shape(
        unet.init, jax.random.key(0), jnp.zeros((1, 64, 64, 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768)),
    )
    unet_params = random_params_like(ushapes, 1, jnp.bfloat16)

    vcfg = VaeConfig.sd15()
    vae = AutoencoderKL(vcfg, dtype=jnp.bfloat16)
    vshapes = jax.eval_shape(
        vae.init, jax.random.key(0), jnp.zeros((1, 512, 512, 3)), jax.random.key(1)
    )
    vae_params = random_params_like(vshapes, 2, jnp.bfloat16)

    tcfg = ClipTextConfig.sd15()
    text = ClipTextEncoder(tcfg, dtype=jnp.bfloat16)
    tshapes = jax.eval_shape(
        text.init, jax.random.key(0), jnp.zeros((1, 77), jnp.int32)
    )
    text_params = random_params_like(tshapes, 3, jnp.bfloat16)

    sched = schedules.DiffusionSchedule.sd15()
    # run_ppo.sh: order_dim=4, scaler_dim=0, num_actions=11
    fcfg = FactorNetConfig(order_dim=4, scaler_dim=0, num_actions=11, family="sd")
    fnet = FactorNet(fcfg)
    fparams = fnet.init(jax.random.key(4))

    pipe = TextToImagePipeline(
        unet, unet_params, text, text_params, vae, vae_params, sched,
        factor_net=fnet, factor_params=fparams,
    )
    if args.quantize:
        pipe = pipe.quantize()
        # the float UNet/VAE trees are dead weight after quantization —
        # 1.9GB of HBM the batch-80 int8 step needs back
        del unet_params, vae_params
        import gc

        gc.collect()

    if args.reward == "depth":
        from consolver_tpu.models.depth_anything import (
            DepthAnything,
            DepthAnythingConfig,
            make_depth_fn,
        )

        dcfg = DepthAnythingConfig.small_v2()
        dmodel = DepthAnything(dcfg, dtype=jnp.bfloat16)
        dshapes = jax.eval_shape(
            dmodel.init, jax.random.key(0), jnp.zeros((1, 518, 518, 3))
        )
        dparams = random_params_like(dshapes, 5, jnp.bfloat16)
        reward_fn = make_reward_fn(
            "depth", RewardModel(depth=make_depth_fn(dmodel, dparams))
        )
    else:
        reward_fn = make_reward_fn("image_psnr")

    tconf = TrainConfig(
        min_inference_steps=args.steps,
        max_inference_steps=args.steps + 1,  # fixed count: one compiled program
        guidance_scale=3.0,
        decode_chunk=args.decode_chunk,
        ppo=PPOConfig(ppo_epochs=1),  # run_ppo.sh: ppo_epochs=1
    )
    trainer = PPOTrainer(pipe, reward_fn, tconf)

    rng = np.random.default_rng(0)
    batch = {
        "noise": rng.standard_normal((args.batch, 64, 64, 4)).astype(np.float32),
        "latent": rng.standard_normal((args.batch, 64, 64, 4)).astype(np.float32),
        "prompt_ids": rng.integers(0, tcfg.vocab_size, (args.batch, 77)).astype(
            np.int32
        ),
    }

    t0 = time.perf_counter()
    out = trainer.train_step(batch)
    compile_s = time.perf_counter() - t0
    print(
        f"step 1 (compile+run): {compile_s:.1f}s  reward={out['reward']:.3f} "
        f"loss={out.get('loss', float('nan')):.4f}",
        flush=True,
    )

    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        out = trainer.train_step(batch)
        times.append(time.perf_counter() - t0)
        print(f"step {i + 2}: {times[-1] * 1e3:.0f}ms  reward={out['reward']:.3f}",
              flush=True)

    steady = min(times)
    imgs_per_sec = args.batch / steady
    print(
        f"\nPRODUCTION PPO STEP (batch {args.batch}, {args.steps}-step rollout, "
        f"reward={args.reward}): steady {steady * 1e3:.0f}ms/step = "
        f"{imgs_per_sec:.1f} rollout-imgs/s/chip; compile {compile_s:.0f}s"
    )


if __name__ == "__main__":
    main()
