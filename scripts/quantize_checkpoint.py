#!/usr/bin/env python
"""Convert a float pipeline checkpoint into a quantized SERVING checkpoint.

Runs the one-call ``pipeline.quantize()`` conversion (kernels/quant.py) once,
offline, and writes the quantized orbax trees + per-component
``_config.json`` (with ``quant_int8``/``quant_int4`` set) so serving hosts
load quantized weights directly — no per-startup quantization and a fraction
of the float checkpoint's disk/host RAM.  The 11.9B FLUX-Kontext DiT:
23.8 GB bf16 -> ~12 GB int8 (W8A8, the SPEED config — single-chip serving)
-> ~6.3 GB with ``--bits 4`` (W4A16 group-128, the MEMORY config: 2x faster
host->device loads, ~6 GB extra HBM headroom; compute runs at the bf16
rate).  docs/SERVING.md.

  python scripts/quantize_checkpoint.py --family sd --pretrained ckpts/sd15 \
      --dst ckpts/sd15_int8
  python scripts/quantize_checkpoint.py --family flux --pretrained ckpts/flux \
      --dst ckpts/flux_int8
  python scripts/quantize_checkpoint.py --family flux --bits 4 \
      --pretrained ckpts/flux --dst ckpts/flux_int4

The output directory is a drop-in ``--pretrained`` for generate.py /
generate_edit.py / the serving probes (build_pipeline reads the configs).
Float components (text encoders) are copied as-is.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def save_component(dst_root: str, name: str, params, cfg) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(dst_root, name))
    ocp.PyTreeCheckpointer().save(path, jax.device_get(params), force=True)
    with open(path + "_config.json", "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", required=True, choices=["sd", "flux"])
    ap.add_argument("--pretrained", required=True,
                    help="float checkpoint dir (convert_checkpoints.py layout)")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--bits", type=int, default=8, choices=[4, 8],
                    help="4 = packed int4 DiT weights (flux only; the VAE "
                         "decoder stays int8)")
    args = ap.parse_args()

    from consolver_tpu.configs.config import ExperimentConfig, apply_overrides
    from consolver_tpu.policy import FactorNet

    os.makedirs(args.dst, exist_ok=True)
    if args.family == "sd":
        from scripts.train_sd15 import build_pipeline

        cfg = apply_overrides(
            ExperimentConfig.sd15_ppo(),
            {"model.pretrained_path": args.pretrained},
        )
        if args.bits != 8:
            raise SystemExit("--bits 4 is a FLUX DiT option (the SD UNet is "
                             "conv-dominated and fits one chip at int8)")
        fnet = FactorNet(cfg.factor_net)
        pipe = build_pipeline(cfg, fnet, fnet.init(jax.random.key(0))).quantize()
        save_component(args.dst, "unet", pipe.unet_params, pipe.unet.cfg)
        save_component(args.dst, "vae", pipe.vae_params, pipe.vae.cfg)
        save_component(args.dst, "clip_text", pipe.text_params,
                       pipe.text_encoder.cfg)
    else:
        from scripts.train_flux import build_pipeline

        cfg = apply_overrides(
            ExperimentConfig.flux_ppo(),
            {"model.pretrained_path": args.pretrained},
        )
        fnet = FactorNet(cfg.factor_net)
        pipe = build_pipeline(
            cfg, fnet, fnet.init(jax.random.key(0))
        ).quantize(bits=args.bits)
        save_component(args.dst, "transformer", pipe.transformer_params,
                       pipe.transformer.cfg)
        save_component(args.dst, "vae", pipe.vae_params, pipe.vae.cfg)
        save_component(args.dst, "t5", pipe.t5_params, pipe.t5.cfg)
        save_component(args.dst, "clip_text", pipe.clip_params, pipe.clip.cfg)

    # the float checkpoint's tokenizer dirs must travel with the int8 copy
    # (generate.py / generate_edit.py read them; load_tokenizer silently
    # falls back to the hash tokenizer when they are missing)
    import shutil

    for tok_dir in ("tokenizer", "tokenizer_t5"):
        src = os.path.join(args.pretrained, tok_dir)
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(args.dst, tok_dir),
                            dirs_exist_ok=True)

    from consolver_tpu.kernels.quant import tree_bytes

    total = sum(
        tree_bytes(t) for t in (
            [pipe.unet_params, pipe.vae_params] if args.family == "sd"
            else [pipe.transformer_params, pipe.vae_params]
        )
    )
    print(f"wrote int{args.bits} serving checkpoint to {args.dst} "
          f"({total / 1e9:.2f} GB quantized compute params)")


if __name__ == "__main__":
    main()
