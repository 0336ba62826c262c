"""MuNet: a 1-layer policy over a discrete shift-value grid.

Equivalent of the reference's ``MuNetPPO``
(edit_ppo/factor_net_ppo.py:200-266): a single linear layer mapping a
scalar condition to a categorical over shift values linspace(1, 2, 21).
Like the reference, it is provided but not wired into any trainer (the
production FM configs use the static/dynamic sigma shift instead).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class _MuMLP(nn.Module):
    num_actions: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.num_actions, name="fc")(x)


class MuNet:
    def __init__(self, input_dim: int = 1, num_actions: int = 21,
                 low: float = 1.0, high: float = 2.0):
        self.num_actions = num_actions
        self.mlp = _MuMLP(num_actions)
        self.action_values = jnp.asarray(np.linspace(low, high, num_actions), jnp.float32)
        self.input_dim = input_dim

    def init(self, key: jax.Array) -> Any:
        return self.mlp.init(key, jnp.zeros((1, self.input_dim), jnp.float32))

    def log_probs(self, params: Any, x: jax.Array) -> jax.Array:
        return jax.nn.log_softmax(self.mlp.apply(params, x.astype(jnp.float32)), axis=-1)

    def sample_action(self, params: Any, key: jax.Array, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        logp = self.log_probs(params, x)
        idx = jax.random.categorical(key, logp, axis=-1)
        probs = jnp.take_along_axis(jnp.exp(logp), idx[:, None], axis=-1)[:, 0]
        return self.action_values[idx], probs

    def get_action_probs(self, params: Any, x: jax.Array, actions: jax.Array):
        logp = self.log_probs(params, x)
        idx = jnp.argmin(jnp.abs(actions[:, None] - self.action_values[None, :]), axis=-1)
        probs = jnp.take_along_axis(jnp.exp(logp), idx[:, None], axis=-1)[:, 0]
        entropy = -jnp.sum(jnp.exp(logp) * logp, axis=-1) / jnp.log(
            jnp.asarray(self.num_actions, jnp.float32)
        )
        return probs, entropy
