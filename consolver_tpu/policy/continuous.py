"""Continuous-action FactorNet (Gaussian policy).

The reference's continuous PPO path is dead as shipped: scheduler_ppo.py:23
imports ``factor_net_ppo_continous.FactorNetPPOContinous`` which does not
exist in the repo (SURVEY.md section 0), and the FM variant asserts
(scheduler_fmppo.py:166-170).  This is a working TPU-native design for that
path: a diagonal Gaussian over the same action semantics, state-dependent
mean (zero-init so the initial policy matches the discrete zero-init
behavior: mean coefficients 0 -> p0=1 after set_default_coefficients),
learned global log-std, analytic log-densities and entropy.

It slots into the same PPO machinery: ``sample_action`` returns per-dim
densities in place of categorical probabilities — the joint surrogate's
ratio exp(sum log p_new - sum log p_old) is the correct density ratio.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from consolver_tpu.policy.factor_net import FactorNetConfig, _FactorMLP, _cosine_features


@dataclasses.dataclass(frozen=True)
class ContinuousFactorNetConfig:
    hidden_dim: int = 256
    order_dim: int = 4
    scaler_dim: int = 2
    mu_dim: int = 0
    use_conv: bool = False
    family: str = "sd"
    init_log_std: float = -1.0

    @property
    def action_dims(self) -> int:
        return self.order_dim + self.scaler_dim + self.mu_dim - 1

    @property
    def input_scale(self) -> float:
        return 1.0 / 999.0 if self.family == "sd" else 1.0

    def action_bounds(self) -> Tuple[np.ndarray, np.ndarray]:
        """Per-dim clip bounds matching the discrete grids' ranges."""
        disc = FactorNetConfig(
            num_actions=3, hidden_dim=self.hidden_dim, order_dim=self.order_dim,
            scaler_dim=self.scaler_dim, mu_dim=self.mu_dim, family=self.family,
        ).action_value_grid()
        return disc.min(axis=1), disc.max(axis=1)


class ContinuousFactorNet:
    def __init__(self, config: ContinuousFactorNetConfig):
        self.config = config
        self.mlp = _FactorMLP(
            hidden_dim=config.hidden_dim,
            out_dim=config.action_dims,
            zero_init_head=True,
        )
        lo, hi = config.action_bounds()
        self.low = jnp.asarray(lo)
        self.high = jnp.asarray(hi)

    def init(self, key: jax.Array) -> Any:
        k1, _ = jax.random.split(key)
        params = self.mlp.init(k1, jnp.zeros((1, self._input_dim()), jnp.float32))
        params = dict(params)
        params["log_std"] = jnp.full(
            (self.config.action_dims,), self.config.init_log_std, jnp.float32
        )
        return params

    def _input_dim(self) -> int:
        return 2 + (self.config.order_dim - 1 if self.config.use_conv else 0)

    def _features(self, conds: Dict[str, jax.Array]) -> jax.Array:
        x = conds["x"].astype(jnp.float32) * self.config.input_scale
        if self.config.use_conv:
            x = jnp.concatenate(
                [x, _cosine_features(conds["epsilon"], self.config.order_dim)], axis=-1
            )
        return x

    def _dist(self, params: Any, conds: Dict[str, jax.Array]):
        mean = self.mlp.apply(
            {"params": params["params"]}, self._features(conds)
        )
        std = jnp.exp(params["log_std"])[None, :]
        return mean, std

    def sample_action(self, params: Any, key: jax.Array, conds: Dict[str, jax.Array]):
        """Returns (actions clipped to the grid ranges, per-dim densities)."""
        mean, std = self._dist(params, conds)
        raw = mean + std * jax.random.normal(key, mean.shape)
        actions = jnp.clip(raw, self.low[None, :], self.high[None, :])
        # Density is evaluated at the CLIPPED value — the value stored in the
        # trajectory and re-evaluated by get_action_probs during PPO epochs.
        # Using the raw draw's density would make the first-epoch ratio
        # N(clipped)/N(raw) != 1 for every clipped sample, violating the
        # clipped-surrogate trust region before any parameter update.
        dens = self._density(mean, std, actions)
        return actions, dens

    @staticmethod
    def _density(mean, std, value):
        z = (value - mean) / std
        return jnp.exp(-0.5 * z**2) / (std * math.sqrt(2 * math.pi))

    def get_action_probs(self, params: Any, conds: Dict[str, jax.Array], actions: jax.Array):
        """(per-dim densities of the given actions, per-dim entropy).

        Entropy is the analytic Gaussian entropy (nats); unlike the discrete
        variant it is not normalized to [0, 1]."""
        mean, std = self._dist(params, conds)
        dens = self._density(mean, std, actions.astype(jnp.float32))
        entropy = 0.5 * jnp.log(2 * math.pi * math.e * std**2)
        entropy = jnp.broadcast_to(entropy, mean.shape)
        return dens, entropy
