"""FactorNet: the policy network emitting per-step solver coefficients.

TPU-native re-design of the reference FactorNetPPO
(/root/reference/factor_net_ppo.py:57-184 for the SD variant,
/root/reference/edit_ppo/factor_net_ppo.py:57-196 for the flow-matching
variant).  A tiny MLP maps the (t, t_prev) — or (sigma, sigma_next) —
condition to independent categorical distributions over a fixed per-dimension
grid of coefficient values.  Everything is a pure function of a flax param
pytree so sampling and log-prob evaluation run inside jitted scans.

Family differences reproduced via :class:`FactorNetConfig`:
  * SD ("sd"):   input /999 normalization (factor_net_ppo.py:104-106),
                 zero-init last layer (:82-83), temperature 1.0,
                 first-order grid linspace(0, 2) (:87).
  * FM ("fm"):   no input normalization (edit_ppo/factor_net_ppo.py:112-114),
                 default init (:87-88 commented out), sharpened softmax
                 logits/0.01 (:168), first-order grid linspace(0, 1) (:92),
                 optional mu action group with grid {0} + linspace(.5,.99) (:96).

Note: for the grid-kind rule we use the FM variant's corrected condition
(``i == 1 and i < order_dim - 1``); the SD variant's ``elif i == 1`` misfiles
the first scaler as a second-order coefficient when order_dim == 2 — a latent
reference bug never triggered by any production config (SURVEY.md section 2.2).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class FactorNetConfig:
    num_actions: int = 161
    hidden_dim: int = 256
    order_dim: int = 4
    scaler_dim: int = 2
    mu_dim: int = 0
    use_conv: bool = False  # cosine-similarity features of the eps history
    family: str = "sd"  # "sd" | "fm"
    # Beyond-reference knob: override the family's softmax temperature
    # (sd=1.0, fm=0.01).  The FM production sharpness makes the initial
    # random-init policy near-deterministic (almost no exploration) — useful
    # to soften for toy-scale learning studies (scripts/learning_check_edit).
    temperature_override: Optional[float] = None

    @property
    def action_dims(self) -> int:
        return self.order_dim + self.scaler_dim + self.mu_dim - 1

    @property
    def input_dim(self) -> int:
        return 2 + (self.order_dim - 1 if self.use_conv else 0)

    @property
    def input_scale(self) -> float:
        return 1.0 / 999.0 if self.family == "sd" else 1.0

    @property
    def temperature(self) -> float:
        if self.temperature_override is not None:
            return self.temperature_override
        return 1.0 if self.family == "sd" else 0.01

    @property
    def zero_init_head(self) -> bool:
        return self.family == "sd"

    def action_value_grid(self) -> np.ndarray:
        """Per-dimension discrete action value grids
        (factor_net_ppo.py:87-102, edit_ppo/factor_net_ppo.py:92-110)."""
        n = self.num_actions
        first = np.linspace(0, 2 if self.family == "sd" else 1, n)
        second = np.linspace(-2, 0, n)
        order = np.linspace(-1, 1, n)
        scaler = np.linspace(-0.05, 0.05, n)
        mu = np.concatenate([[0.0], np.linspace(0.5, 0.99, n - 1)])
        rows = []
        for i in range(self.action_dims):
            if i == 0:
                rows.append(first)
            elif i == 1 and i < self.order_dim - 1:
                rows.append(second)
            elif i < self.order_dim - 1:
                rows.append(order)
            elif i < self.order_dim + self.scaler_dim - 1:
                rows.append(scaler)
            else:
                rows.append(mu)
        return np.stack(rows).astype(np.float32)


class _FactorMLP(nn.Module):
    """2-hidden-layer ReLU MLP head (factor_net_ppo.py:75-83)."""

    hidden_dim: int
    out_dim: int
    zero_init_head: bool

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden_dim, name="fc0")(x))
        x = nn.relu(nn.Dense(self.hidden_dim, name="fc1")(x))
        if self.zero_init_head:
            head = nn.Dense(
                self.out_dim,
                name="head",
                kernel_init=nn.initializers.zeros_init(),
                bias_init=nn.initializers.zeros_init(),
            )
        else:
            head = nn.Dense(self.out_dim, name="head")
        return head(x)


def _cosine_features(epsilon: jax.Array, order_dim: int, eps: float = 1e-8) -> jax.Array:
    """Cosine similarity of each history slot to the most recent one
    (factor_net_ppo.py:108-130).  epsilon: [B, order_dim, ...]."""
    b = epsilon.shape[0]
    flat = epsilon.reshape(b, order_dim, -1).astype(jnp.float32)
    ref = flat[:, 0]
    ref_norm = jnp.maximum(jnp.linalg.norm(ref, axis=-1), eps)
    sims = []
    for i in range(1, order_dim):
        cur = flat[:, i]
        cur_norm = jnp.maximum(jnp.linalg.norm(cur, axis=-1), eps)
        sims.append(jnp.sum(ref * cur, axis=-1) / (ref_norm * cur_norm))
    return jnp.stack(sims, axis=-1)


class FactorNet:
    """Stateless wrapper bundling config, the MLP, and the action grids."""

    def __init__(self, config: FactorNetConfig):
        self.config = config
        self.mlp = _FactorMLP(
            hidden_dim=config.hidden_dim,
            out_dim=config.num_actions * config.action_dims,
            zero_init_head=config.zero_init_head,
        )
        self.action_values = jnp.asarray(config.action_value_grid())

    # -- params ------------------------------------------------------------

    def init(self, key: jax.Array) -> Any:
        dummy = jnp.zeros((1, self.config.input_dim), jnp.float32)
        return self.mlp.init(key, dummy)

    def load_torch_state_dict(self, state_dict: Dict[str, Any]) -> Any:
        """Convert a reference ``model.ckpt`` (torch ``nn.Sequential`` MLP:
        layers 0/2/4 of factor_net_ppo.py:75-81) into flax params."""
        import numpy as _np

        def to_np(v):
            return _np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

        mapping = {"fc0": "mlp.0", "fc1": "mlp.2", "head": "mlp.4"}
        params = {
            ours: {
                "kernel": to_np(state_dict[f"{theirs}.weight"]).T,
                "bias": to_np(state_dict[f"{theirs}.bias"]),
            }
            for ours, theirs in mapping.items()
        }
        return {"params": params}

    # -- distributions -----------------------------------------------------

    def _features(self, conds: Dict[str, jax.Array]) -> jax.Array:
        x = conds["x"].astype(jnp.float32) * self.config.input_scale
        if self.config.use_conv:
            cos = _cosine_features(conds["epsilon"], self.config.order_dim)
            x = jnp.concatenate([x, cos], axis=-1)
        return x

    def log_probs(self, params: Any, conds: Dict[str, jax.Array]) -> jax.Array:
        """[B, action_dims, num_actions] log-probabilities."""
        cfg = self.config
        logits = self.mlp.apply(params, self._features(conds))
        logits = logits.reshape(-1, cfg.action_dims, cfg.num_actions)
        return jax.nn.log_softmax(logits / cfg.temperature, axis=-1)

    def probs(self, params: Any, conds: Dict[str, jax.Array]) -> jax.Array:
        return jnp.exp(self.log_probs(params, conds))

    def sample_action(
        self, params: Any, key: jax.Array, conds: Dict[str, jax.Array]
    ) -> Tuple[jax.Array, jax.Array]:
        """Sample one action per dimension; returns (action values [B, A],
        their probabilities [B, A])  (factor_net_ppo.py:159-168)."""
        logp = self.log_probs(params, conds)
        idx = jax.random.categorical(key, logp, axis=-1)  # [B, A]
        probs = jnp.take_along_axis(jnp.exp(logp), idx[..., None], axis=-1)[..., 0]
        values = self.action_values[jnp.arange(self.config.action_dims)[None, :], idx]
        return values, probs

    def mode_action(
        self, params: Any, conds: Dict[str, jax.Array]
    ) -> Tuple[jax.Array, jax.Array]:
        """Most-likely action per dimension (argmax of the logits); same
        (values [B, A], probs [B, A]) contract as :meth:`sample_action` but
        RNG-free.  Serving-only: :meth:`sample_action` draws the whole batch
        from ONE key, so a sampled request's actions depend on its batch
        slot — mode actions make a request's output a pure function of its
        own (prompt, seed, program).  The reference has no equivalent (its
        inference samples from the global torch RNG, scheduler_ppo.py:243);
        at the FM family's production temperature 0.01 the two paths are
        near-identical anyway."""
        logp = self.log_probs(params, conds)
        idx = jnp.argmax(logp, axis=-1)  # [B, A]
        probs = jnp.take_along_axis(jnp.exp(logp), idx[..., None], axis=-1)[..., 0]
        values = self.action_values[jnp.arange(self.config.action_dims)[None, :], idx]
        return values, probs

    def actions_to_indices(self, actions: jax.Array) -> jax.Array:
        """Nearest-grid-point re-indexing (factor_net_ppo.py:174-178)."""
        diffs = jnp.abs(actions[:, :, None] - self.action_values[None, :, :])
        return jnp.argmin(diffs, axis=-1)

    def get_action_probs(
        self, params: Any, conds: Dict[str, jax.Array], actions: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """Probabilities of given action values under the current policy and
        the normalized per-dim entropy H/log(K)  (factor_net_ppo.py:170-184)."""
        logp = self.log_probs(params, conds)
        idx = self.actions_to_indices(actions)
        selected = jnp.take_along_axis(jnp.exp(logp), idx[..., None], axis=-1)[..., 0]
        entropy = -jnp.sum(jnp.exp(logp) * logp, axis=-1) / jnp.log(
            jnp.asarray(self.config.num_actions, jnp.float32)
        )
        return selected, entropy
