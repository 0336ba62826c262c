#!/usr/bin/env python
"""Teacher-trajectory dataset generation CLI.

Equivalent of gen_pretrain/gen.sh -> generate_data.py (SD: 40-step
multistep-DPM teacher over LAION prompts) and edit_pretrain/generate.py:
runs the teacher solver over prompts, saving .npz samples (noise, teacher
final latent, prompt ids) for data.group.TeacherDataset.

  python scripts/generate_teacher.py --prompts laion.parquet --out data/teacher/sd15 \
      --solver multistep-dpm --steps 40 [--pretrained ckpts/sd15]

FLUX edit teacher (edit_pretrain/generate.py: 28-step teacher over prepared
(ref image, instruction) samples from data.edit_prep.prepare_edit_set):

  python scripts/generate_teacher.py --family flux --source data/edit_prepared \
      --out data/teacher/flux --steps 28 [--pretrained ckpts/flux]
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
    ap.add_argument("--family", default="sd", choices=["sd", "flux"])
    ap.add_argument("--prompts", default=None,
                    help="sd: .parquet | .json (COCO) | .txt; default: synthetic")
    ap.add_argument("--source", default=None,
                    help="flux: dir of prepared {i}.npz (prepare_edit_set)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--solver", default=None,
                    help="default: multistep-dpm (sd) / euler (flux)")
    ap.add_argument("--steps", type=int, default=None,
                    help="default: 40 (sd, gen_pretrain/gen.sh) / 28 (flux, "
                    "edit_pretrain/generate.py)")
    ap.add_argument("--cfg", type=float, default=None)
    ap.add_argument("--pretrained", default=None)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--seed", type=int, default=None,
                    help="default: 0 (sd) / 42 (flux, generate.py:80)")
    ap.add_argument("--max-prompts", type=int, default=None)
    args = ap.parse_args()

    if args.family == "flux":
        return main_flux(args)
    args.solver = args.solver or "multistep-dpm"
    args.steps = args.steps if args.steps is not None else 40
    args.cfg = args.cfg if args.cfg is not None else 3.0
    args.seed = args.seed if args.seed is not None else 0

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

    # tokenized-empty-prompt CFG negative ids (denoise_ppo.py:39-48), stored
    # per sample so the trainer conditions its negative branch identically
    from consolver_tpu.data.tokenizer import uncond_input_ids

    uncond_row = uncond_input_ids(tokenizer, 1, prompt_len,
                                  vocab_size=pipe.text_encoder.cfg.vocab_size)

    def teacher_denoise(key, noise, ids):
        ctx, uncond = pipe._encode(
            pipe.text_params, ids,
            jnp.asarray(np.tile(uncond_row, (ids.shape[0], 1))),
        )
        fn = pipe.denoise_fn(args.steps, args.cfg, record=False, solver=args.solver)
        latents, _ = fn(pipe.unet_params, pipe.factor_params, key, noise, ctx, uncond)
        return latents

    n = generate_teacher_set(
        teacher_denoise, prompt_ids, args.out, noise_shape=(latent, latent, 4),
        batch_size=args.batch_size, seed=args.seed,
        decode_fn=lambda lat: decode_latents(pipe.vae, pipe.vae_params, lat),
        uncond_ids=uncond_row,
    )
    print(f"wrote {n} teacher samples to {args.out}")


def main_flux(args):
    """FLUX edit teacher: full-step rollout over prepared (ref, instruction)
    samples (edit_pretrain/generate.py:34-144)."""
    from consolver_tpu.configs.config import ExperimentConfig, apply_overrides
    from consolver_tpu.data.teacher_gen import generate_edit_teacher_set
    from consolver_tpu.data.tokenizer import load_tokenizer, tokenize_batch
    from consolver_tpu.policy import FactorNet
    from scripts.train_flux import build_pipeline

    if not args.source:
        raise SystemExit("--family flux needs --source (prepare_edit_set output)")
    solver = args.solver or "euler"
    steps = args.steps if args.steps is not None else 28
    cfg_scale = args.cfg if args.cfg is not None else 2.5
    seed = args.seed if args.seed is not None else 42

    cfg = ExperimentConfig.flux_ppo()
    if args.pretrained:
        cfg = apply_overrides(cfg, {"model.pretrained_path": args.pretrained})
    fnet = FactorNet(cfg.factor_net)
    pipe = build_pipeline(cfg, fnet, fnet.init(jax.random.key(0)))

    vae_factor = 2 ** (len(pipe.vae.cfg.block_out_channels) - 1)
    latent_ch = pipe.vae.cfg.latent_channels
    t5_len = 128 if args.pretrained else 4
    clip_len = 77 if args.pretrained else 4
    t5_tok = load_tokenizer(
        os.path.join(args.pretrained, "tokenizer_t5") if args.pretrained else None,
        kind="t5", max_length=t5_len,
    )
    clip_tok = load_tokenizer(
        os.path.join(args.pretrained, "tokenizer") if args.pretrained else None,
        kind="clip", max_length=clip_len,
    )

    def tokenize(instructions):
        return (
            tokenize_batch(t5_tok, list(instructions), t5_len,
                           vocab_size=pipe.t5.cfg.vocab_size),
            tokenize_batch(clip_tok, list(instructions), clip_len,
                           vocab_size=pipe.clip.cfg.vocab_size),
        )

    # infer the latent size from the first prepared sample's ref resolution
    first = sorted(f for f in os.listdir(args.source) if f.endswith(".npz"))[0]
    with np.load(os.path.join(args.source, first)) as z:
        resolution = z["ref_image"].shape[0]
    latent = resolution // vae_factor

    def teacher_denoise(key, noise, t5_ids, clip_ids, ref):
        latents, _ = pipe(
            key, t5_ids, clip_ids, ref, noise, num_inference_steps=steps,
            guidance_scale=cfg_scale, solver=solver, decode=False,
        )
        return latents

    n = generate_edit_teacher_set(
        teacher_denoise, tokenize, args.source, args.out,
        noise_shape=(latent, latent, latent_ch),
        batch_size=args.batch_size, seed=seed,
        decode_fn=pipe.decode_latents, max_samples=args.max_prompts,
    )
    print(f"wrote {n} edit teacher samples to {args.out}")


if __name__ == "__main__":
    main()
