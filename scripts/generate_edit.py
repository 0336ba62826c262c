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
    ap.add_argument("--batch-size", type=int, default=1,
                    help="examples per pipeline call (noise stays per-example "
                         "deterministic via fold_in(seed, example_idx))")
    ap.add_argument("--shard", action="store_true",
                    help="shard each batch over a data mesh of all visible "
                         "devices (replaces the per-GPU mp.Process workers, "
                         "edit_ppo/generate_ours.py:176-189)")
    args = ap.parse_args()

    from consolver_tpu.configs.config import ExperimentConfig, apply_overrides
    from consolver_tpu.data.edit_prep import (
        center_crop_resize,
        read_instruction_records,
    )
    from consolver_tpu.data.tokenizer import load_tokenizer, tokenize_batch
    from consolver_tpu.eval.edit_scores import write_example
    from consolver_tpu.policy import FactorNet
    from scripts.train_flux import build_pipeline
    from scripts.train_sd15 import load_factor_ckpt
    from PIL import Image

    cfg = ExperimentConfig.flux_ppo()
    if args.pretrained:
        cfg = apply_overrides(cfg, {"model.pretrained_path": args.pretrained})
    fcfg = cfg.factor_net
    if args.factor_ckpt:
        fcfg, fparams = load_factor_ckpt(args.factor_ckpt, fcfg)
        fnet = FactorNet(fcfg)
    else:
        fnet = FactorNet(fcfg)
        fparams = fnet.init(jax.random.key(0))
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

    mesh = None
    if args.shard:
        from consolver_tpu.dist import mesh as meshlib

        mesh = meshlib.make_mesh()
        for attr in ("transformer_params", "t5_params", "clip_params",
                     "vae_params", "factor_params"):
            setattr(pipe, attr, meshlib.replicate(mesh, getattr(pipe, attr)))
    else:
        # pin orbax-restored (host-numpy) trees on device once (see
        # rl/train.py for the measured per-call re-staging cost)
        for attr in ("transformer_params", "t5_params", "clip_params",
                     "vae_params"):
            setattr(pipe, attr, jax.device_put(getattr(pipe, attr)))

    records = read_instruction_records(args.source)[: args.max_examples]
    pairs = [(r["path"], r["instruction"]) for r in records]
    if not pairs:
        raise SystemExit(f"no examples under {args.source}")
    os.makedirs(args.out, exist_ok=True)

    for start in range(0, len(pairs), args.batch_size):
        chunk = pairs[start : start + args.batch_size]
        idxs = list(range(start, start + len(chunk)))
        # pad ragged final batches so one program serves every batch (and
        # the mesh divides evenly); padded outputs are dropped
        want = args.batch_size
        if mesh is not None:
            want = max(want, mesh.devices.size)
            want += (-want) % mesh.devices.size
        while len(chunk) < want:
            chunk = chunk + [chunk[-1]]
            idxs = idxs + [idxs[-1]]

        refs01, instructions = [], []
        for img_path, instruction in chunk:
            image = np.asarray(Image.open(img_path).convert("RGB"))
            refs01.append(center_crop_resize(image, resolution))
            instructions.append(instruction)
        ref = jnp.asarray(np.stack(refs01) * 2.0 - 1.0)
        t5_ids = jnp.asarray(tokenize_batch(t5_tok, instructions, 128,
            vocab_size=pipe.t5.cfg.vocab_size))
        clip_ids = jnp.asarray(tokenize_batch(clip_tok, instructions, 77,
            vocab_size=pipe.clip.cfg.vocab_size))
        # per-example deterministic noise, independent of batch size
        noise = jnp.concatenate([
            jax.random.normal(
                jax.random.fold_in(jax.random.key(args.seed), i),
                (1, latent, latent, latent_ch),
            )
            for i in idxs
        ])
        if mesh is not None:
            from consolver_tpu.dist import mesh as meshlib

            ref, t5_ids, clip_ids, noise = meshlib.shard_batch(
                mesh, (ref, t5_ids, clip_ids, noise)
            )
        key = jax.random.fold_in(jax.random.key(args.seed), 10_000_000 + start)
        edited, _ = pipe(
            key, t5_ids, clip_ids, ref, noise,
            num_inference_steps=args.steps, guidance_scale=args.cfg,
            solver=args.solver,
        )
        edited = np.asarray(edited)
        n_real = len(set(idxs))
        for j in range(n_real):
            i = idxs[j]
            instruction = instructions[j]
            # kontext-bench entries name the output folder by their `key`
            # (generate_ours.py:55,67); fall back to index+slug otherwise
            name = records[i].get("key") or (
                f"{i:05d}_" + "".join(
                    c if c.isalnum() else "_" for c in instruction[:40]
                )
            )
            write_example(args.out, name, refs01[j], instruction, edited[j])
    print(f"wrote {len(pairs)} examples to {args.out}")


if __name__ == "__main__":
    main()
