#!/usr/bin/env python
"""Teacher-trajectory dataset generation CLI.

Equivalent of gen_pretrain/gen.sh -> generate_data.py (SD: 40-step
multistep-DPM teacher over LAION prompts) and edit_pretrain/generate.py:
runs the teacher solver over prompts, saving .npz samples (noise, teacher
final latent, prompt ids) for data.group.TeacherDataset.

  python scripts/generate_teacher.py --prompts laion.parquet --out data/teacher/sd15 \
      --solver multistep-dpm --steps 40 [--pretrained ckpts/sd15]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompts", default=None,
                    help=".parquet | .json (COCO) | .txt; default: synthetic")
    ap.add_argument("--out", required=True)
    ap.add_argument("--solver", default="multistep-dpm")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--cfg", type=float, default=3.0)
    ap.add_argument("--pretrained", default=None)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-prompts", type=int, default=None)
    args = ap.parse_args()

    from consolver_tpu.configs.config import ExperimentConfig, apply_overrides
    from consolver_tpu.data.prompts import read_prompts
    from consolver_tpu.data.teacher_gen import generate_teacher_set
    from consolver_tpu.data.tokenizer import load_tokenizer, tokenize_batch
    from consolver_tpu.models.vae import decode_latents
    from consolver_tpu.policy import FactorNet
    from scripts.train_sd15 import build_pipeline

    cfg = ExperimentConfig.sd15_ppo()
    if args.pretrained:
        cfg = apply_overrides(cfg, {"model.pretrained_path": args.pretrained})
    fnet = FactorNet(cfg.factor_net)
    pipe = build_pipeline(cfg, fnet, fnet.init(jax.random.key(0)))

    if args.prompts:
        prompts = read_prompts(args.prompts, args.max_prompts)
    else:
        prompts = [f"synthetic prompt {i}" for i in range(args.max_prompts or 16)]
    tokenizer = load_tokenizer(
        os.path.join(args.pretrained, "tokenizer") if args.pretrained else None
    )
    prompt_len = 77 if args.pretrained else 8
    prompt_ids = tokenize_batch(tokenizer, prompts, prompt_len,
                                vocab_size=pipe.text_encoder.cfg.vocab_size)
    latent = 64 if args.pretrained else 8

    def teacher_denoise(key, noise, ids):
        ctx, uncond = pipe._encode(pipe.text_params, ids, jnp.zeros_like(ids))
        fn = pipe.denoise_fn(args.steps, args.cfg, record=False, solver=args.solver)
        latents, _ = fn(pipe.unet_params, pipe.factor_params, key, noise, ctx, uncond)
        return latents

    n = generate_teacher_set(
        teacher_denoise, prompt_ids, args.out, noise_shape=(latent, latent, 4),
        batch_size=args.batch_size, seed=args.seed,
        decode_fn=lambda lat: decode_latents(pipe.vae, pipe.vae_params, lat),
    )
    print(f"wrote {n} teacher samples to {args.out}")


if __name__ == "__main__":
    main()
