#!/usr/bin/env python
"""Consistency / FID evaluation CLI (compute_reward.sh + fid_test.py
equivalent).

  python scripts/evaluate.py consistency --generated results/ours8 \
      --reference results/teacher40 --reward image_psnr --out stats.json
  python scripts/evaluate.py fid --generated results/ours8 \
      --reference coco/val2017 --encoder-ckpt ckpts/inception
  python scripts/evaluate.py edit-score --results results/edits5 \
      --judge-ckpt ckpts/llava --out edit_stats.json
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("consistency")
    c.add_argument("--generated", required=True)
    c.add_argument("--reference", required=True)
    c.add_argument("--reward", default="image_psnr")
    c.add_argument("--encoder-ckpt", default=None)
    c.add_argument("--out", default=None)
    c.add_argument("--batch-size", type=int, default=32)
    c.add_argument(
        "--shard", action="store_true",
        help="shard reward batches over a data mesh of all visible devices",
    )

    f = sub.add_parser("fid")
    f.add_argument("--generated", required=True)
    f.add_argument("--reference", required=True)
    f.add_argument("--encoder-ckpt", default=None)
    f.add_argument(
        "--encoder-kind", default="inception",
        choices=("inception", "dino", "clip"),
        help="feature stream for the Frechet distance; 'inception' uses "
        "the clean-fid pool3 2048-d features (fid_test.py semantics)",
    )
    f.add_argument("--batch-size", type=int, default=32)

    e = sub.add_parser(
        "edit-score",
        help="score folder-per-example edit results with a local VLM "
        "(EditScore stand-in, edit_ppo/compute_score.py)",
    )
    e.add_argument("--results", required=True,
                   help="dir of generate_edit.py outputs")
    e.add_argument("--judge-ckpt", required=True,
                   help="local transformers image-text-to-text checkpoint")
    e.add_argument("--device", default="cpu")
    e.add_argument("--out", default=None)

    args = ap.parse_args()

    if args.cmd == "edit-score":
        from consolver_tpu.eval.edit_scores import score_results
        from consolver_tpu.rewards.vlm import load_transformers_edit_scorer

        stats = score_results(
            args.results,
            load_transformers_edit_scorer(args.judge_ckpt, args.device),
            output_json=args.out,
        )
        print(stats)
        return

    from consolver_tpu.eval.consistency import evaluate_consistency, pair_images, _load_image
    from consolver_tpu.rewards.registry import RewardModel, make_reward_fn

    def build_encoder(kind):
        from consolver_tpu.rewards.registry import build_encoder_for
        from scripts.train_sd15 import load_orbax

        return build_encoder_for(kind, load_orbax(args.encoder_ckpt))

    if args.cmd == "consistency":
        model = RewardModel()
        if args.reward in ("dino", "clip", "inception"):
            if not args.encoder_ckpt:
                raise SystemExit(f"--encoder-ckpt required for reward {args.reward}")
            model = RewardModel(encode=build_encoder(args.reward))
        reward_fn = make_reward_fn(args.reward, model)
        mesh = None
        if args.shard:
            from consolver_tpu.dist import mesh as meshlib

            mesh = meshlib.make_mesh()
        stats = evaluate_consistency(
            reward_fn, args.generated, args.reference,
            batch_size=args.batch_size, output_json=args.out, mesh=mesh,
        )
        print(stats)
        return

    # fid
    from consolver_tpu.eval import fid as fid_lib

    if args.encoder_ckpt:
        if args.encoder_kind == "inception":
            # FID uses the 2048-d pool3 features (clean-fid semantics),
            # not the reward's logits configuration
            from consolver_tpu.models.inception import (
                InceptionV3,
                make_inception_encoder,
            )
            from scripts.train_sd15 import load_orbax

            encode = make_inception_encoder(
                InceptionV3(), load_orbax(args.encoder_ckpt)
            )
        else:
            encode = build_encoder(args.encoder_kind)
    else:
        print("[smoke] no --encoder-ckpt: FID over downsampled pixels")
        import jax.image

        def encode(imgs):
            import jax.numpy as jnp

            x = jax.image.resize(jnp.asarray(imgs), (len(imgs), 8, 8, 3), "linear")
            return np.asarray(x.reshape(len(imgs), -1))

    def stream(d):
        import glob

        files = sorted(
            glob.glob(os.path.join(d, "**", "*.png"), recursive=True)
            + glob.glob(os.path.join(d, "**", "*.jpg"), recursive=True)
        )
        for start in range(0, len(files), args.batch_size):
            yield np.stack(
                [_load_image(p, (256, 256)) for p in files[start : start + args.batch_size]]
            )

    d = fid_lib.compute_fid(encode, stream(args.generated), stream(args.reference))
    print({"fid": d})


if __name__ == "__main__":
    main()
