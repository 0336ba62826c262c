#!/usr/bin/env python
"""Diffusion Preview demo: cheap previews, full-step refinement on accept.

  python scripts/preview_demo.py --prompt "a photo of a corgi" \
      [--pretrained ckpts/sd15 --factor-ckpt runs/ppo/checkpoint-3000] \
      --out demo/ [--candidates 4 --preview-steps 8 --refine-steps 40]

Writes preview_0..N.png; pass --accept K to also write refined_K.png
(regenerated at full steps from the SAME noise as preview K — the product
loop of the paper, readme.md:135-150).
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
    ap.add_argument("--prompt", default="a sample prompt")
    ap.add_argument("--out", required=True)
    ap.add_argument("--pretrained", default=None)
    ap.add_argument("--factor-ckpt", default=None)
    ap.add_argument("--candidates", type=int, default=4)
    ap.add_argument("--preview-steps", type=int, default=8)
    ap.add_argument("--refine-steps", type=int, default=40)
    ap.add_argument("--refine-solver", default="multistep-dpm")
    ap.add_argument("--cfg", type=float, default=3.0)
    ap.add_argument("--accept", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from consolver_tpu.configs.config import ExperimentConfig, apply_overrides
    from consolver_tpu.data.tokenizer import load_tokenizer, tokenize_batch
    from consolver_tpu.eval.gen_sweep import save_png
    from consolver_tpu.pipelines.preview import PreviewSession
    from consolver_tpu.policy import FactorNet
    from scripts.train_sd15 import build_pipeline, load_orbax

    cfg = ExperimentConfig.sd15_ppo()
    if args.pretrained:
        cfg = apply_overrides(cfg, {"model.pretrained_path": args.pretrained})
    fnet = FactorNet(cfg.factor_net)
    fparams = fnet.init(jax.random.key(0))
    if args.factor_ckpt:
        restored = load_orbax(args.factor_ckpt)
        fparams = restored.get("params", restored)
    pipe = build_pipeline(cfg, fnet, fparams)

    tokenizer = load_tokenizer(
        os.path.join(args.pretrained, "tokenizer") if args.pretrained else None
    )
    prompt_ids = jnp.asarray(tokenize_batch(
        tokenizer, [args.prompt], 77,
        vocab_size=pipe.text_encoder.cfg.vocab_size)[0])
    latent = 64 if args.pretrained else 8

    session = PreviewSession(
        pipe, preview_steps=args.preview_steps, refine_steps=args.refine_steps,
        refine_solver=args.refine_solver, guidance_scale=args.cfg,
    )
    os.makedirs(args.out, exist_ok=True)
    previews = session.preview(
        jax.random.key(args.seed), prompt_ids, latent_hw=(latent, latent),
        num_candidates=args.candidates,
    )
    for i, p in enumerate(previews):
        save_png(os.path.join(args.out, f"preview_{i}.png"), np.asarray(p.image))
    print(f"wrote {len(previews)} previews ({args.preview_steps} steps) to {args.out}")

    if args.accept is not None:
        refined = session.refine(previews[args.accept])
        path = os.path.join(args.out, f"refined_{args.accept}.png")
        save_png(path, np.asarray(refined))
        print(f"refined preview {args.accept} at {args.refine_steps} steps -> {path}")


if __name__ == "__main__":
    main()
