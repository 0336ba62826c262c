#!/usr/bin/env python
"""Kontext-bench editing generation driver.

Equivalent of edit_ppo/generate_ours.py (trained ConsistencySolver) and
edit_ppo/generate_pretrain.py (FM baseline zoo): reads (ref image,
instruction) examples, runs the editing pipeline, writes the
folder-per-example layout (ref_image.jpg / instruction.txt /
edited_image.jpg) consumed by the EditScore/EditReward scorers
(eval/edit_scores.py).

  python scripts/generate_edit.py --source kontext-bench/test --out results/ours5 \
      --solver fmppo --steps 5 [--pretrained ckpts/flux --factor-ckpt runs/flux/checkpoint-3000]

Smoke mode (no --pretrained): tiny random models.
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
    ap.add_argument("--source", required=True,
                    help="dir with metadata.jsonl or image+txt sidecars")
    ap.add_argument("--out", required=True)
    ap.add_argument("--solver", default="fmppo",
                    help="fmppo | euler | heun | dpm-solver | dpm-solver-multistep")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--cfg", type=float, default=2.5)
    ap.add_argument("--pretrained", default=None)
    ap.add_argument("--factor-ckpt", default=None)
    ap.add_argument("--resolution", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)  # generate.py:80 fixed seed
    ap.add_argument("--max-examples", type=int, default=None)
    args = ap.parse_args()

    from consolver_tpu.configs.config import ExperimentConfig, apply_overrides
    from consolver_tpu.data.edit_prep import center_crop_resize, read_instruction_pairs
    from consolver_tpu.data.tokenizer import load_tokenizer, tokenize_batch
    from consolver_tpu.eval.edit_scores import write_example
    from consolver_tpu.policy import FactorNet
    from scripts.train_flux import build_pipeline
    from scripts.train_sd15 import load_orbax
    from PIL import Image

    cfg = ExperimentConfig.flux_ppo()
    if args.pretrained:
        cfg = apply_overrides(cfg, {"model.pretrained_path": args.pretrained})
    fnet = FactorNet(cfg.factor_net)
    fparams = fnet.init(jax.random.key(0))
    if args.factor_ckpt:
        restored = load_orbax(args.factor_ckpt)
        fparams = restored.get("params", restored)
    pipe = build_pipeline(cfg, fnet, fparams)
    pipe.factor_params = fparams

    vae_factor = 2 ** (len(pipe.vae.cfg.block_out_channels) - 1)
    resolution = args.resolution or (1024 if args.pretrained else 16)
    latent = resolution // vae_factor
    latent_ch = pipe.vae.cfg.latent_channels
    t5_tok = load_tokenizer(
        os.path.join(args.pretrained, "tokenizer_t5") if args.pretrained else None,
        kind="t5", max_length=128,
    )
    clip_tok = load_tokenizer(
        os.path.join(args.pretrained, "tokenizer") if args.pretrained else None,
        kind="clip", max_length=77,
    )

    pairs = read_instruction_pairs(args.source)[: args.max_examples]
    if not pairs:
        raise SystemExit(f"no examples under {args.source}")
    os.makedirs(args.out, exist_ok=True)
    for i, (img_path, instruction) in enumerate(pairs):
        image = np.asarray(Image.open(img_path).convert("RGB"))
        ref01 = center_crop_resize(image, resolution)
        ref = jnp.asarray(ref01 * 2.0 - 1.0)[None]
        t5_ids = jnp.asarray(tokenize_batch(t5_tok, [instruction], 128,
            vocab_size=pipe.t5.cfg.vocab_size))
        clip_ids = jnp.asarray(tokenize_batch(clip_tok, [instruction], 77,
            vocab_size=pipe.clip.cfg.vocab_size))
        key = jax.random.fold_in(jax.random.key(args.seed), i)
        noise = jax.random.normal(key, (1, latent, latent, latent_ch))
        edited, _ = pipe(
            key, t5_ids, clip_ids, ref, noise,
            num_inference_steps=args.steps, guidance_scale=args.cfg,
            solver=args.solver,
        )
        name = f"{i:05d}_" + "".join(
            c if c.isalnum() else "_" for c in instruction[:40]
        )
        write_example(args.out, name, ref01, instruction, np.asarray(edited[0]))
    print(f"wrote {len(pairs)} examples to {args.out}")


if __name__ == "__main__":
    main()
