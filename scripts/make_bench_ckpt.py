#!/usr/bin/env python
"""Materialize a FULL-SIZE converted SD checkpoint for bench.py's quality
gate (VERDICT r4 task #3).

Synthesizes a diffusers-layout torch state dict at the real SD-1.5 sizes
(859.5M UNet + 83.7M VAE) with random-normal values, runs the REAL
converters (consolver_tpu/models/convert.py), and saves the orbax trees +
config sidecars in bench.py's expected layout:

  ckpts/sd15/unet  + unet_config.json
  ckpts/sd15/vae   + vae_config.json

bench.py picks the directory up automatically (real_ckpt_path), so the
round-end bench run reports ``int8_quality_weights: "converted"`` at real
scale — the gate then measures genuine conversion->quantization numerics
instead of in-memory random trees, and is exactly the code path weights
day will use (only the state-dict VALUES will differ).

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/make_bench_ckpt.py \
      [--dst ckpts/sd15] [--seed 7]

Runs entirely on the host CPU; ~2 GB on disk (f32 orbax).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dst", default="ckpts/sd15")
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    # CPU pinning on this box needs BOTH the env var and the config flag
    # (the axon plugin ignores a plain config override once registered);
    # the env var only helps if the backend is not yet initialized, which
    # is why drive_eval invokes this script as a subprocess.
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    jax.config.update("jax_platforms", "cpu")

    import orbax.checkpoint as ocp

    from consolver_tpu.models import convert as c
    from consolver_tpu.models.unet_2d import UNetConfig, UNet2DCondition
    from consolver_tpu.models.vae import AutoencoderKL, VaeConfig
    from scripts.selftest_conversion import tree_to_torch_sd

    ucfg, vcfg = UNetConfig.sd15(), VaeConfig.sd15()
    specs = {
        "unet": (
            ucfg,
            jax.eval_shape(
                UNet2DCondition(ucfg).init, jax.random.key(0),
                jnp.zeros((1, 64, 64, 4)), jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 77, ucfg.cross_attention_dim)),
            )["params"],
            c.convert_unet,
        ),
        "vae": (
            vcfg,
            jax.eval_shape(
                AutoencoderKL(vcfg).init, jax.random.key(0),
                jnp.zeros((1, 512, 512, 3)), jax.random.key(1),
            )["params"],
            c.convert_vae,
        ),
    }

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.dst, exist_ok=True)
    for name, (cfg, init, convert) in specs.items():
        sd = tree_to_torch_sd(init, name)
        # the synthesizer emits zeros; the gate needs real value ranges so
        # quantization error is nonzero (same recipe as bench.py's
        # converted_gate_smoke, at full scale)
        sd = {
            k: rng.normal(0.0, 0.04, v.shape).astype(np.float16)
            for k, v in sd.items()
        }
        converted = convert(sd)
        n = sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(converted))
        dst = os.path.join(args.dst, name)
        ocp.PyTreeCheckpointer().save(os.path.abspath(dst), converted,
                                      force=True)
        with open(dst + "_config.json", "w") as f:
            json.dump(dataclasses.asdict(cfg), f)
        print(f"{name}: {len(sd)} tensors -> {dst} ({n/1e6:.1f}M params)",
              flush=True)
    print(f"done — bench.py will now report int8_quality_weights="
          f"'converted' (CONSOLVER_BENCH_CKPT={args.dst})")


if __name__ == "__main__":
    main()
