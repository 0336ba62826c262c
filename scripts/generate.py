#!/usr/bin/env python
"""Generation sweep over the solver zoo (gen.sh / gen_ppo.py equivalent).

  python scripts/generate.py --solver multistep-dpm --steps 8 \
      --prompts coco_captions.json --out results/dpm8 \
      [--pretrained ckpts/sd15] [--factor-ckpt runs/ppo/checkpoint-3000]

Solvers: consistencysolver | ddim | ipndm | unipc | deis | multistep-dpm |
amed | dmd2 | sde-dpmsolver | sde-dpmsolver++ (gen_ppo.py:118-169 + the AMED
plugin's stochastic algorithm_type options).  Smoke mode (no --pretrained)
uses tiny random models.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--solver", default="consistencysolver")
    ap.add_argument("--eta", type=float, default=0.0,
                    help="stochastic DDIM eta (solver=ddim/dmd2 only)")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--cfg", type=float, default=3.0)
    ap.add_argument("--prompts", default=None,
                    help="COCO captions json, or a .txt with one prompt/line")
    ap.add_argument("--out", required=True)
    ap.add_argument("--pretrained", default=None)
    ap.add_argument("--factor-ckpt", default=None)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-prompts", type=int, default=None)
    ap.add_argument("--latent-size", type=int, default=None,
                    help="latent H=W (default: 64 with --pretrained, 8 smoke)")
    ap.add_argument("--shard", action="store_true",
                    help="shard each generation batch over a data mesh of all "
                         "visible devices (replaces the reference's 8-GPU "
                         "thread pool, gen_ppo.py:446-462)")
    args = ap.parse_args()

    from consolver_tpu.configs.config import ExperimentConfig, apply_overrides
    from consolver_tpu.data.tokenizer import load_tokenizer, tokenize_batch
    from consolver_tpu.eval.gen_sweep import generate_sweep, read_coco_captions
    from consolver_tpu.policy import FactorNet
    from scripts.train_sd15 import build_pipeline, load_factor_ckpt

    cfg = ExperimentConfig.sd15_ppo()
    if args.pretrained:
        cfg = apply_overrides(cfg, {"model.pretrained_path": args.pretrained})

    fcfg = cfg.factor_net
    if args.factor_ckpt:
        # the checkpoint's factor_net_config.json (when present) overrides
        # the preset dims — gen.sh generates with --factor_num_actions=21
        # while run_ppo.sh trains 11: dims are a checkpoint property
        fcfg, fparams = load_factor_ckpt(args.factor_ckpt, fcfg)
        fnet = FactorNet(fcfg)
    else:
        fnet = FactorNet(fcfg)
        fparams = fnet.init(jax.random.key(0))
    pipe = build_pipeline(cfg, fnet, fparams)

    if args.prompts is None:
        prompts = [f"sample prompt {i}" for i in range(args.max_prompts or 16)]
    elif args.prompts.endswith(".json"):
        prompts = read_coco_captions(args.prompts, args.max_prompts)
    else:
        with open(args.prompts) as f:
            prompts = [l.strip() for l in f if l.strip()][: args.max_prompts]

    tokenizer = load_tokenizer(
        os.path.join(args.pretrained, "tokenizer") if args.pretrained else None
    )
    latent = args.latent_size or (64 if args.pretrained else 8)

    mesh = None
    if args.shard:
        from consolver_tpu.dist import mesh as meshlib

        mesh = meshlib.make_mesh()
        pipe.unet_params = meshlib.replicate(mesh, pipe.unet_params)
        pipe.text_params = meshlib.replicate(mesh, pipe.text_params)
        pipe.vae_params = meshlib.replicate(mesh, pipe.vae_params)
        if pipe.factor_params is not None:
            pipe.factor_params = meshlib.replicate(mesh, pipe.factor_params)
    else:
        # pin the orbax-restored (host-numpy) trees on device once: numpy
        # leaves re-stage the whole tree on every jitted batch (rl/train.py
        # has the measured numbers)
        pipe.unet_params = jax.device_put(pipe.unet_params)
        pipe.text_params = jax.device_put(pipe.text_params)
        pipe.vae_params = jax.device_put(pipe.vae_params)

    def shard_inputs(ids, noise):
        if mesh is None:
            return ids, noise
        from consolver_tpu.dist import mesh as meshlib

        return meshlib.shard_batch(mesh, (ids, noise))

    def pad_batch(gen):
        """Pad ragged final batches to the device count, slice back."""
        if mesh is None:
            return gen
        n_dev = mesh.devices.size

        def wrapped(key, batch_prompts):
            n = len(batch_prompts)
            pad = (-n) % n_dev
            out = gen(key, list(batch_prompts) + [batch_prompts[-1]] * pad)
            return out[:n]

        return wrapped

    if args.eta > 0:
        # stochastic DDIM (the eta parameter of the reference pipeline call):
        # built ONCE — the noise key is a traced argument of the jitted zoo
        # loop, so a multi-batch sweep compiles a single CFG-batched program
        from consolver_tpu.models.vae import decode_latents
        from consolver_tpu.pipelines.solver_zoo import make_baseline_denoise_fn

        solver_name = args.solver if args.solver in ("ddim", "dmd2") else "ddim"
        eta_denoise = make_baseline_denoise_fn(
            pipe._unet_apply, pipe.schedule, solver_name, args.steps,
            args.cfg, eta=args.eta,
        )

        def generate_batch(key, batch_prompts):
            ids = jnp.asarray(tokenize_batch(
                tokenizer, batch_prompts, 77,
                vocab_size=pipe.text_encoder.cfg.vocab_size))
            noise = jax.random.normal(key, (len(batch_prompts), latent, latent, 4))
            ids, noise = shard_inputs(ids, noise)
            ctx, unc = pipe._encode(pipe.text_params, ids, pipe.uncond_ids_for(ids))
            latents = eta_denoise(pipe.unet_params, key, noise, ctx, unc)
            return decode_latents(pipe.vae, pipe.vae_params, latents)
    else:
        def generate_batch(key, batch_prompts):
            ids = jnp.asarray(tokenize_batch(
                tokenizer, batch_prompts, 77,
                vocab_size=pipe.text_encoder.cfg.vocab_size))
            noise = jax.random.normal(key, (len(batch_prompts), latent, latent, 4))
            ids, noise = shard_inputs(ids, noise)
            images, _ = pipe(
                key, ids, noise, args.steps, args.cfg, solver=args.solver
            )
            return images

    files = generate_sweep(
        pad_batch(generate_batch), prompts, args.out, args.batch_size, args.seed
    )
    print(f"wrote {len(files)} images to {args.out}")


if __name__ == "__main__":
    main()
