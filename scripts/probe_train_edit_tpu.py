#!/usr/bin/env python
"""Real-TPU probe: the FLUX-Kontext edit PPO training step on one chip.

The bf16 11.9B DiT needs >= 2 chips (23.8 GB); the int8 serving copy fits
one (12.1 GB, scripts/probe_flux_serving.py).  Since the DiT is FROZEN in
this workload (only the 0.3M factor net trains), the rollout can run the
int8 path and the PPO update is unaffected — this probe measures that
single-chip int8-rollout training step at a Kontext shape:

  rollout (FMPPO, int8 DiT) + baseline Euler rollout + 3x chunked VAE
  decode + reward + baseline-clipped advantage + factor-net update.

  python scripts/probe_train_edit_tpu.py [--batch 2] [--resolution 512]
      [--steps 3] [--iters 2] [--bf16] [--bits 4]

--bits 4 runs the packed-int4 rollout (FluxConfig.quant_int4): slower
compute (bf16 rate) but ~6GB less weight HBM — the config to try for the
1024^2 batch-1 step that RESOURCE_EXHAUSTs at int8.
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
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--steps", type=int, default=3,
                    help="fixed num_inference (production draws [2,6))")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--bf16", action="store_true",
                    help="keep the DiT bf16 (needs >= 2 chips at full size)")
    ap.add_argument("--decode-chunk", type=int, default=1)
    ap.add_argument("--bits", type=int, default=8, choices=(4, 8),
                    help="rollout DiT quantization (8=W8A8 speed, 4=packed "
                         "int4 memory)")
    args = ap.parse_args()

    from bench import random_params_like
    from consolver_tpu.models.clip_text import ClipTextConfig, ClipTextEncoder
    from consolver_tpu.models.flux import FluxConfig, FluxTransformer
    from consolver_tpu.models.t5 import T5Config, T5Encoder
    from consolver_tpu.models.vae import AutoencoderKL, VaeConfig
    from consolver_tpu.pipelines.edit import FluxKontextPipeline
    from consolver_tpu.policy import FactorNet, FactorNetConfig
    from consolver_tpu.rewards.registry import make_reward_fn
    from consolver_tpu.rl.ppo import PPOConfig
    from consolver_tpu.rl.train import TrainConfig
    from consolver_tpu.rl.train_edit import EditPPOTrainer

    print(f"platform: {jax.devices()[0].platform}", flush=True)

    fcfg = FluxConfig.flux_kontext()
    transformer = FluxTransformer(fcfg, dtype=jnp.bfloat16)
    lat = args.resolution // 8
    s_img = (lat // 2) * (lat // 2)
    img = jnp.zeros((1, s_img, fcfg.in_channels))
    if args.bf16:
        tshapes = jax.eval_shape(
            transformer.init, jax.random.key(0), img,
            jnp.zeros((1, 16, fcfg.joint_text_dim)),
            jnp.zeros((1, fcfg.pooled_text_dim)), jnp.ones((1,)), jnp.ones((1,)),
            jnp.zeros((s_img, 3)), jnp.zeros((16, 3)),
        )
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            tr_params = random_params_like(tshapes, 1, jnp.bfloat16)
    else:
        import dataclasses

        from consolver_tpu.kernels.quant import tree_bytes

        qtr = FluxTransformer(
            dataclasses.replace(fcfg, quant_int8=args.bits == 8,
                                quant_int4=args.bits == 4),
            dtype=jnp.bfloat16,
        )
        qshapes = jax.eval_shape(
            qtr.init, jax.random.key(0), img,
            jnp.zeros((1, 16, fcfg.joint_text_dim)),
            jnp.zeros((1, fcfg.pooled_text_dim)),
            jnp.ones((1,)), jnp.ones((1,)),
            jnp.zeros((s_img, 3)), jnp.zeros((16, 3)),
        )
        # timing does not depend on weight values: synthesize the quantized
        # tree directly with host numpy (no 23.8 GB float tree, no
        # quantization pass — matches a real int8 serving-checkpoint load)
        rng = np.random.default_rng(1)

        def rand_leaf(s):
            if s.dtype == jnp.int8:
                return rng.integers(-127, 128, s.shape, dtype=np.int8)
            if s.dtype == jnp.uint8:  # packed int4 nibbles
                return rng.integers(0, 256, s.shape, dtype=np.uint8)
            # float leaves are kernel_scales + biases: small positives keep
            # the dequant magnitudes sane (scales must be > 0)
            return jnp.asarray(
                (rng.uniform(0.5, 1.5, s.shape) * 2e-4).astype(np.float32),
                s.dtype,
            )

        tr_params = jax.tree.map(rand_leaf, qshapes)
        transformer = qtr
        print(f"int{args.bits} DiT: {tree_bytes(tr_params)/1e9:.2f} GB",
              flush=True)
        # transfer ONCE: host-numpy leaves passed to jit re-stage the 12GB
        # tree on EVERY program call (measured: host RAM balloons past
        # 100GB); committed device arrays are reused by all programs
        t0 = time.perf_counter()
        tr_params = jax.device_put(tr_params, jax.devices()[0])
        jax.block_until_ready(tr_params)
        print(f"host->device transfer: {time.perf_counter()-t0:.0f}s",
              flush=True)

    # small real text encoders are irrelevant to the step time at this
    # scale; use tiny stand-ins so the probe isolates the DiT + VAE cost
    t5 = T5Encoder(T5Config(vocab_size=256, d_model=fcfg.joint_text_dim,
                            d_kv=64, d_ff=1024, num_layers=2, num_heads=8),
                   dtype=jnp.bfloat16)
    t5_params = random_params_like(
        jax.eval_shape(t5.init, jax.random.key(0), jnp.zeros((1, 16), jnp.int32)),
        2, jnp.bfloat16,
    )
    clip = ClipTextEncoder(
        ClipTextConfig(vocab_size=256, hidden_size=fcfg.pooled_text_dim,
                       num_layers=2, num_heads=8, intermediate_size=1024),
        dtype=jnp.bfloat16,
    )
    clip_params = random_params_like(
        jax.eval_shape(clip.init, jax.random.key(0), jnp.zeros((1, 16), jnp.int32)),
        3, jnp.bfloat16,
    )
    vcfg = VaeConfig(latent_channels=16, scaling_factor=0.3611)
    vae = AutoencoderKL(vcfg, dtype=jnp.bfloat16)
    vae_params = random_params_like(
        jax.eval_shape(vae.init, jax.random.key(0),
                       jnp.zeros((1, args.resolution, args.resolution, 3)),
                       jax.random.key(1)),
        4, jnp.bfloat16,
    )

    fnet = FactorNet(FactorNetConfig(order_dim=2, scaler_dim=0, mu_dim=0,
                                     num_actions=11, family="fm"))
    pipe = FluxKontextPipeline(
        transformer, tr_params, t5, t5_params, clip, clip_params,
        vae, vae_params, factor_net=fnet,
        factor_params=fnet.init(jax.random.key(5)),
    )
    trainer = EditPPOTrainer(
        pipe, make_reward_fn("image_psnr"),
        TrainConfig(min_inference_steps=args.steps,
                    max_inference_steps=args.steps + 1,
                    guidance_scale=2.5, decode_chunk=args.decode_chunk,
                    output_dir="/tmp/probe_edit_train",
                    ppo=PPOConfig(ppo_epochs=4)),  # edit run_ppo.sh
    )

    rng = np.random.default_rng(0)
    batch = {
        "noise": rng.standard_normal((args.batch, lat, lat, 16)).astype(np.float32),
        "latent": rng.standard_normal((args.batch, lat, lat, 16)).astype(np.float32),
        "ref_image": rng.uniform(-1, 1, (args.batch, args.resolution,
                                         args.resolution, 3)).astype(np.float32),
        "t5_ids": rng.integers(0, 256, (args.batch, 16)).astype(np.int32),
        "clip_ids": rng.integers(0, 256, (args.batch, 16)).astype(np.int32),
    }

    t0 = time.perf_counter()
    out = trainer.train_step(dict(batch))
    print(f"step 1 (compile+run): {time.perf_counter()-t0:.1f}s "
          f"reward={out['reward']:.2f}", flush=True)
    times = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        out = trainer.train_step(dict(batch))
        times.append(time.perf_counter() - t0)
        print(f"step {i+2}: {times[-1]*1e3:.0f}ms", flush=True)
    print(f"\nEDIT PPO STEP (batch {args.batch}, {args.resolution}^2, "
          f"{args.steps}-step rollout, {'bf16' if args.bf16 else 'int8'} DiT): "
          f"steady {min(times)*1e3:.0f}ms/step on one chip")


if __name__ == "__main__":
    main()
