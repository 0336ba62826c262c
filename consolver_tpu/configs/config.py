"""Typed configuration system replacing the reference's 366-line argparse
module (config.py, duplicated verbatim at edit_ppo/config.py).

Dataclass-based with a thin CLI overlay: every field is overridable as
``--section.field=value`` and production presets mirror the reference launch
scripts (run_ppo.sh, edit_ppo/run_ppo.sh).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Any, Optional, get_args, get_origin

from consolver_tpu.policy.factor_net import FactorNetConfig
from consolver_tpu.rl.ppo import PPOConfig
from consolver_tpu.rl.train import TrainConfig


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    family: str = "sd15"  # "sd15" | "flux"
    pretrained_path: Optional[str] = None  # converted checkpoint dir
    resolution: int = 512
    dtype: str = "bfloat16"
    # Beyond-parity TPU knob: run the FROZEN rollout denoiser + VAE decoder
    # on the W8A8 int8 MXU path (pipeline .quantize(); the policy update is
    # untouched).  The policy then trains against the int8 serving
    # environment it will be deployed into.  The reference's analogue is
    # its fp16-autocast rollout (train_ppo.py:352-364).  Composes with
    # dist.data_parallel; untested under model_parallel.
    quantize_rollout: bool = False
    # Bit width for quantize_rollout on the FLUX family: 8 = W8A8 int8
    # (speed), 4 = packed int4 weights / bf16 compute (memory — frees ~6GB
    # of the 11.9B DiT's HBM for 1024^2 rollout activations).  The SD UNet
    # path ignores this (conv stack is int8-only).
    quantize_bits: int = 8


@dataclasses.dataclass(frozen=True)
class DataConfig:
    train_data_dir: str = "data/teacher/sd15"
    # PER-SHARD batch, like the reference's per-process train_batch_size
    # (run_ppo.sh: 80 on 1 GPU; edit_ppo/run_ppo.sh: 10/GPU x 8 = global 80).
    # The training CLIs feed batch_size * data_parallel to the dataset.
    batch_size: int = 80
    shuffle: bool = False


@dataclasses.dataclass(frozen=True)
class DistConfig:
    """Mesh topology (replaces accelerate --num_processes + NCCL DDP,
    run_ppo.sh:5 / edit_ppo/run_ppo.sh:5).  data_parallel shards the group
    batch (one prompt group per shard); model_parallel tensor-shards the
    frozen denoiser by dist/tp rules.  Requested shards clamp to visible
    devices (dist.mesh.mesh_from_config)."""

    data_parallel: int = 1
    model_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class RewardConfig:
    reward_type: str = "depth"  # run_ppo.sh: depth; edit_ppo: dino
    encoder_checkpoint: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    dist: DistConfig = dataclasses.field(default_factory=DistConfig)
    reward: RewardConfig = dataclasses.field(default_factory=RewardConfig)
    factor_net: FactorNetConfig = dataclasses.field(default_factory=FactorNetConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    @classmethod
    def sd15_ppo(cls) -> "ExperimentConfig":
        """Production SD-1.5 PPO preset (run_ppo.sh:5-33): 1 process, bs=80,
        lr=1e-4, wd=1e-3, 3001 steps, ckpt every 100 keep 20, seed
        453645634, order_dim=4, scaler_dim=0, 11 actions, reward=depth,
        ppo_epochs=1, cfg=3."""
        return cls(
            model=ModelConfig(family="sd15", resolution=512),
            data=DataConfig(batch_size=80),
            dist=DistConfig(data_parallel=1),
            reward=RewardConfig(reward_type="depth"),
            factor_net=FactorNetConfig(
                order_dim=4, scaler_dim=0, num_actions=11, hidden_dim=256, family="sd"
            ),
            train=TrainConfig(
                max_train_steps=3001,
                guidance_scale=3.0,
                checkpointing_steps=100,
                checkpoints_total_limit=20,
                seed=453645634,
                ppo=PPOConfig(
                    ppo_epochs=1,
                    clip_range=0.2,
                    entropy_coef=0.01,
                    learning_rate=1e-4,
                    weight_decay=1e-3,
                    advantage_scale=10.0,
                ),
            ),
        )

    @classmethod
    def flux_ppo(cls) -> "ExperimentConfig":
        """Production FLUX-Kontext PPO preset (edit_ppo/run_ppo.sh:5-32):
        8 processes DP, bs=10/process (global 80, 8 per-rank groups),
        lr=1e-3, wd=1e-3, 1001 steps, ckpt every 100 keep 20, seed
        453645634, order_dim=2, 11 actions, reward=dino, ppo_epochs=4,
        cfg=2.5, steps in [2, 6)."""
        return cls(
            model=ModelConfig(family="flux", resolution=1024),
            data=DataConfig(batch_size=10, train_data_dir="data/teacher/flux"),
            dist=DistConfig(data_parallel=8),
            reward=RewardConfig(reward_type="dino"),
            factor_net=FactorNetConfig(
                order_dim=2, scaler_dim=0, mu_dim=0, num_actions=11,
                hidden_dim=256, family="fm",
            ),
            train=TrainConfig(
                max_train_steps=1001,
                guidance_scale=2.5,
                min_inference_steps=2,
                max_inference_steps=6,
                checkpointing_steps=100,
                checkpoints_total_limit=20,
                seed=453645634,
                ppo=PPOConfig(
                    ppo_epochs=4,
                    clip_range=0.2,
                    entropy_coef=0.01,
                    learning_rate=1e-3,
                    weight_decay=1e-3,
                    advantage_scale=1.0,
                ),
            ),
        )


def _coerce(value: str, typ: Any) -> Any:
    if not isinstance(value, str):
        # already-typed value (programmatic apply_overrides caller):
        # trust it — coercion exists for CLI "--set k=v" strings
        return value
    if get_origin(typ) is not None:  # Optional[...] etc.
        args = [a for a in get_args(typ) if a is not type(None)]
        if value.lower() in ("none", "null"):
            return None
        return _coerce(value, args[0])
    if typ is bool:
        return value.lower() in ("1", "true", "yes")
    if typ in (int, float, str):
        return typ(value)
    return json.loads(value)


def apply_overrides(config: Any, overrides: dict[str, str]) -> Any:
    """Apply dotted-path overrides ('train.ppo.learning_rate' -> value) to a
    frozen dataclass tree, returning a new tree."""
    for path, raw in overrides.items():
        parts = path.split(".")
        config = _apply_one(config, parts, raw)
    return config


def _apply_one(node: Any, parts: list[str], raw: str) -> Any:
    import typing

    name = parts[0]
    fields = {f.name: f for f in dataclasses.fields(node)}
    if name not in fields:
        raise KeyError(f"Unknown config field {name!r}; valid: {sorted(fields)}")
    if len(parts) == 1:
        hints = typing.get_type_hints(type(node))
        return dataclasses.replace(node, **{name: _coerce(raw, hints[name])})
    child = _apply_one(getattr(node, name), parts[1:], raw)
    return dataclasses.replace(node, **{name: child})


def parse_cli(argv: Optional[list[str]] = None) -> ExperimentConfig:
    """CLI: --preset sd15_ppo|flux_ppo plus --set section.field=value."""
    parser = argparse.ArgumentParser(description="consolver-tpu")
    parser.add_argument("--preset", default="sd15_ppo",
                        choices=["sd15_ppo", "flux_ppo", "default"])
    parser.add_argument("--set", action="append", default=[], metavar="K=V")
    args = parser.parse_args(argv)
    if args.preset == "sd15_ppo":
        config = ExperimentConfig.sd15_ppo()
    elif args.preset == "flux_ppo":
        config = ExperimentConfig.flux_ppo()
    else:
        config = ExperimentConfig()
    overrides = dict(kv.split("=", 1) for kv in args.set)
    return apply_overrides(config, overrides)
