#!/usr/bin/env python
"""Convert locally-downloaded HF checkpoints into consolver-tpu param trees.

The reference pulls every large model from the hub at runtime
(train_ppo.py:102-131); in this framework weights are converted ONCE into
orbax checkpoints and loaded natively.

Usage:
  python scripts/convert_checkpoints.py --kind unet \
      --src /path/to/sd15/unet --dst ckpts/sd15/unet
  kinds: unet | vae | clip_text | clip_vision | dinov2 | t5 | flux |
         factor_net | depth_anything | segformer | inception
  (inception expects a torchvision inception_v3 state dict and keeps the
  fc head — the reward configuration; FID applies the same params with
  num_classes=0 for pool3 features)

--src is a directory containing *.safetensors (preferred) or
pytorch_model*.bin / diffusion_pytorch_model*.bin shards.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_state_dict(src: str) -> dict:
    files = sorted(glob.glob(os.path.join(src, "*.safetensors")))
    state = {}
    if files:
        from safetensors.numpy import load_file

        for f in files:
            state.update(load_file(f))
        return state
    files = sorted(glob.glob(os.path.join(src, "*.bin"))) + sorted(
        glob.glob(os.path.join(src, "*.pth"))
    ) + sorted(glob.glob(os.path.join(src, "*.ckpt")))
    if not files:
        raise FileNotFoundError(f"No safetensors/bin/pth weights under {src}")
    import torch

    for f in files:
        state.update(torch.load(f, map_location="cpu", weights_only=True))
    return state


def convert(kind: str, state: dict, factor_cfg=None):
    from consolver_tpu.models import convert as c

    if kind == "unet":
        return c.convert_unet(state)
    if kind == "vae":
        return c.convert_vae(state)
    if kind == "clip_text":
        return c.convert_clip_text(state)
    if kind == "flux":
        return c.convert_flux(state)
    if kind == "t5":
        from consolver_tpu.models.t5 import convert_t5

        return convert_t5(state)
    if kind == "clip_vision":
        from consolver_tpu.models.vit import convert_clip_vision

        return convert_clip_vision(state)
    if kind == "dinov2":
        from consolver_tpu.models.vit import convert_dinov2

        return convert_dinov2(state)
    if kind == "depth_anything":
        from consolver_tpu.models.depth_anything import convert_depth_anything

        return convert_depth_anything(state)
    if kind == "segformer":
        from consolver_tpu.models.segformer import convert_segformer

        return convert_segformer(state)
    if kind == "inception":
        from consolver_tpu.models.inception import convert_inception

        return convert_inception(state, keep_fc=True)
    if kind == "factor_net":
        # reference model.ckpt: use policy.FactorNet.load_torch_state_dict.
        # The policy dims are a checkpoint property the reference passes on
        # its generation CLI (gen.sh: --order_dim=4 --scaler_dim=0
        # --factor_num_actions=21); factor_cfg carries them here and is
        # recorded as factor_net_config.json beside the dst.
        from consolver_tpu.policy import FactorNet

        net = FactorNet(factor_cfg)
        return net.load_torch_state_dict(state)
    raise ValueError(f"unknown kind {kind}")


def model_config(kind: str, preset: str):
    """The in-repo config dataclass matching a converted checkpoint, so the
    pipeline builders can reconstruct the module without hard-coding sizes."""
    if kind == "unet":
        from consolver_tpu.models.unet_2d import UNetConfig as C
    elif kind == "vae":
        from consolver_tpu.models.vae import VaeConfig as C
    elif kind == "clip_text":
        from consolver_tpu.models.clip_text import ClipTextConfig as C
    else:
        return None
    factory = getattr(C, preset, None)
    if factory is None:
        raise SystemExit(f"no preset {preset!r} on {C.__name__}")
    return factory()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", required=True)
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument(
        "--config", default="sd15",
        help="config preset recorded as {dst}_config.json (unet/vae/clip_text)",
    )
    # factor_net checkpoint dims (gen.sh passes these on the reference CLI)
    ap.add_argument("--order-dim", type=int, default=4)
    ap.add_argument("--scaler-dim", type=int, default=0)
    ap.add_argument("--mu-dim", type=int, default=0)
    ap.add_argument("--num-actions", type=int, default=11)
    ap.add_argument("--hidden-dim", type=int, default=256)
    ap.add_argument("--family", default="sd", choices=["sd", "fm"])
    args = ap.parse_args()

    factor_cfg = None
    if args.kind == "factor_net":
        from consolver_tpu.policy import FactorNetConfig

        factor_cfg = FactorNetConfig(
            order_dim=args.order_dim, scaler_dim=args.scaler_dim,
            mu_dim=args.mu_dim, num_actions=args.num_actions,
            hidden_dim=args.hidden_dim, family=args.family,
        )

    state = load_state_dict(args.src)
    params = convert(args.kind, state, factor_cfg)

    if factor_cfg is not None:
        # the sidecar exists to guarantee generation rebuilds the net at the
        # trained dims — validate them against the checkpoint HERE, where a
        # mismatch is a clear error (head out-features = num_actions *
        # action_dims, factor_net_ppo.py:75-81)
        head_out = np.shape(params["params"]["head"]["kernel"])[-1]
        want = factor_cfg.num_actions * factor_cfg.action_dims
        if head_out != want:
            raise SystemExit(
                f"factor_net dims mismatch: checkpoint head has {head_out} "
                f"out-features but --num-actions={factor_cfg.num_actions} x "
                f"action_dims={factor_cfg.action_dims} = {want}; pass the "
                "dims this policy was trained with (the reference's gen.sh "
                "CLI values)"
            )
        hidden = np.shape(params["params"]["fc0"]["kernel"])[-1]
        if hidden != factor_cfg.hidden_dim:
            raise SystemExit(
                f"factor_net hidden_dim mismatch: checkpoint {hidden} vs "
                f"--hidden-dim {factor_cfg.hidden_dim}"
            )
    if args.dtype == "bfloat16":
        import jax.numpy as jnp
        import jax

        params = jax.tree.map(lambda x: np.asarray(x, jnp.bfloat16), params)

    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.abspath(args.dst), params, force=True)

    if factor_cfg is not None:
        import dataclasses
        import json

        # collision-free sibling sidecar ({dst}_factor_net_config.json, like
        # the other kinds' {dst}_config.json) so two policies converted into
        # the same parent dir keep their own dims; load_factor_ckpt checks
        # this name first
        with open(args.dst.rstrip("/") + "_factor_net_config.json", "w") as f:
            json.dump(dataclasses.asdict(factor_cfg), f, indent=2)

    cfg = model_config(args.kind, args.config)
    if cfg is not None:
        import dataclasses
        import json

        # sibling file (never inside the orbax dir): pipeline builders read
        # it to reconstruct the module at the checkpoint's actual size
        with open(args.dst.rstrip("/") + "_config.json", "w") as f:
            json.dump(dataclasses.asdict(cfg), f, indent=2)

    n = sum(int(np.prod(np.shape(x))) for x in __import__("jax").tree.leaves(params))
    print(f"converted {args.kind}: {len(state)} tensors -> {n/1e6:.1f}M params at {args.dst}")


if __name__ == "__main__":
    main()
