"""Headline benchmark: SD-1.5-class 8-step 512^2 preview throughput on one
TPU chip (the BASELINE.json north-star configuration).

Runs the full jitted denoise pipeline — CFG-batched bf16 UNet (859.5M
params), learnable-LMM solver with FactorNet sampling, VAE decode — and
prints ONE JSON line:
  {"metric": ..., "value": images/sec/chip, "unit": ..., "vs_baseline": ...}

vs_baseline compares against an A100 reference estimate for the same
workload (the reference repo publishes no throughput numbers — BASELINE.md:
"publishes no throughput/latency numbers"); we use 4.0 img/s/chip as the
A100 figure for batched fp16+xformers SD-1.5 8-step 512^2, and the
BASELINE.json target is >= 2x that.
"""

import json
import time

import numpy as np

A100_REF_IMGS_PER_SEC = 4.0


def main():
    import jax
    import jax.numpy as jnp

    from consolver_tpu.core import schedules
    from consolver_tpu.models.unet_2d import UNetConfig, UNet2DCondition
    from consolver_tpu.models.vae import AutoencoderKL, VaeConfig, decode_latents
    from consolver_tpu.pipelines.t2i import make_denoise_fn
    from consolver_tpu.policy import FactorNet, FactorNetConfig

    batch = 8
    num_steps = 8
    height = width = 64  # latent 64x64 => image 512x512

    ucfg = UNetConfig.sd15()
    unet = UNet2DCondition(ucfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        unet.init, jax.random.key(0), jnp.zeros((1, height, width, 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768)),
    )
    # random-normal bf16 weights: throughput does not depend on weight values
    leaves, treedef = jax.tree.flatten(shapes)
    keys = jax.random.split(jax.random.key(1), len(leaves))
    unet_params = jax.tree.unflatten(
        treedef,
        [
            jax.random.normal(k, s.shape, jnp.bfloat16) * 0.02
            for k, s in zip(keys, leaves)
        ],
    )

    vae = AutoencoderKL(VaeConfig.sd15(), dtype=jnp.bfloat16)
    vae_shapes = jax.eval_shape(
        vae.init, jax.random.key(0), jnp.zeros((1, 512, 512, 3)), jax.random.key(1)
    )
    vleaves, vtreedef = jax.tree.flatten(vae_shapes)
    vkeys = jax.random.split(jax.random.key(2), len(vleaves))
    vae_params = jax.tree.unflatten(
        vtreedef,
        [
            jax.random.normal(k, s.shape, jnp.bfloat16) * 0.02
            for k, s in zip(vkeys, vleaves)
        ],
    )

    sched = schedules.DiffusionSchedule.sd15()
    fcfg = FactorNetConfig(order_dim=4, scaler_dim=0, num_actions=11, family="sd")
    fnet = FactorNet(fcfg)
    fparams = fnet.init(jax.random.key(3))

    denoise = make_denoise_fn(
        lambda p, x, t, c: unet.apply(p, x, t, c),
        sched, fnet, num_steps, guidance_scale=3.0, record_trajectory=False,
    )

    @jax.jit
    def preview(unet_params, vae_params, fparams, key, noise, ctx, uncond):
        latents, _ = denoise(unet_params, fparams, key, noise, ctx, uncond)
        return decode_latents(vae, vae_params, latents)

    noise = jax.random.normal(jax.random.key(4), (batch, height, width, 4))
    ctx = jax.random.normal(jax.random.key(5), (batch, 77, 768), jnp.bfloat16)
    uncond = jax.random.normal(jax.random.key(6), (batch, 77, 768), jnp.bfloat16)

    # warmup / compile; a host read is the only reliable sync point on the
    # tunneled TPU platform (block_until_ready returns early there)
    out = preview(unet_params, vae_params, fparams, jax.random.key(7), noise, ctx, uncond)
    float(out.mean())

    iters = 5
    start = time.perf_counter()
    for i in range(iters):
        out = preview(
            unet_params, vae_params, fparams, jax.random.key(8 + i), noise, ctx, uncond
        )
    # executions serialize on the single core; reading the last output back
    # to the host guarantees the whole timed queue has drained
    float(out.mean())
    elapsed = time.perf_counter() - start

    images_per_sec = batch * iters / elapsed
    print(
        json.dumps(
            {
                "metric": "sd15_8step_512_images_per_sec_per_chip",
                "value": round(images_per_sec, 4),
                "unit": "img/s/chip",
                "vs_baseline": round(images_per_sec / A100_REF_IMGS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
