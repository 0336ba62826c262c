"""PPO machinery: group-relative advantages, clipped surrogate, update step.

TPU-native re-design of the reference PPO loop (train_ppo.py:322-437 for SD,
edit_ppo/train_ppo.py:259-389 for FLUX).  Semantics reproduced:

  * group advantages (rewards - mean)/(std + 1e-8) * scale with the group
    being one prompt repeated over the batch (train_ppo.py:376; scale 10)
  * FLUX baseline-clip variant: the group mean is clipped from below by the
    naive-solver baseline reward (edit_ppo/train_ppo.py:316-326; no scale)
  * per-step broadcast + warmup-mask multiply (train_ppo.py:377-390)
  * joint log-prob over action dims, ratio clip, -min(A r, A r_clip),
    entropy bonus -coef * H (train_ppo.py:406-427)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from consolver_tpu.pipelines.t2i import Trajectory
from consolver_tpu.policy.factor_net import FactorNet


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    clip_range: float = 0.2
    entropy_coef: float = 0.01
    ppo_epochs: int = 1
    advantage_scale: float = 10.0
    learning_rate: float = 1e-4
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    weight_decay: float = 1e-2
    max_grad_norm: float = 1.0
    # --gradient_accumulation_steps (config.py; run_ppo.sh:19 and
    # edit_ppo/run_ppo.sh:18 both run production at 1): apply the optimizer
    # every k update calls, averaging grads across them (the accelerate
    # `accumulate(factor_net)` wrapper, train_ppo.py:324).
    grad_accumulation_steps: int = 1


def group_advantages(
    rewards: jax.Array, scale: float = 10.0, num_groups: int = 1
) -> jax.Array:
    """(r - mean)/(std + 1e-8) * scale, normalized WITHIN each of
    ``num_groups`` contiguous groups (train_ppo.py:376).

    Under data parallelism the reference normalizes per rank — each rank is
    one group (train_ppo.py:337,376 runs per-process under accelerate) —
    so the flat [B] reward vector is [G, B/G] groups matching
    data.group.repeat_random_sample_groups' layout."""
    r = rewards.reshape(num_groups, -1)
    adv = (r - r.mean(axis=1, keepdims=True)) / (r.std(axis=1, keepdims=True) + 1e-8)
    return adv.reshape(rewards.shape) * scale


def baseline_clipped_advantages(
    rewards: jax.Array, baseline_reward: jax.Array, max_clip: float = 100.0,
    num_groups: int = 1,
) -> jax.Array:
    """FLUX variant: group mean clipped from below by the naive-scheduler
    baseline reward (edit_ppo/train_ppo.py:316-326), per group.

    ``baseline_reward`` is scalar (one group) or ``[num_groups]`` — the
    reference's DDP run computes one 1-sample Euler baseline PER RANK
    (edit_ppo/train_ppo.py:290-326), i.e. one per group."""
    r = rewards.reshape(num_groups, -1)
    base = jnp.broadcast_to(jnp.asarray(baseline_reward).reshape(-1), (num_groups,))
    mean = jnp.clip(r.mean(axis=1), base, max_clip)[:, None]
    adv = (r - mean) / (r.std(axis=1, keepdims=True) + 1e-8)
    return adv.reshape(rewards.shape)


def flatten_trajectory(
    traj: Trajectory, advantages: jax.Array
) -> Tuple[Dict[str, jax.Array], jax.Array, jax.Array, jax.Array, jax.Array]:
    """[B, S-1, ...] trajectory -> flat [B*(S-1), ...] PPO batch with the
    advantage broadcast over steps and masked (train_ppo.py:377-390).

    Returns (conds, actions, old_probs, masked_advantages[N, A],
    valid[N, 1]).  ``valid`` marks real rows of a padded rollout (all-ones
    otherwise); ppo_loss excludes pad rows from its means so the padded
    program is semantically identical to the per-count one."""
    b, s = traj.actions.shape[:2]
    n = b * s

    def flat(x):
        return x.reshape((n,) + x.shape[2:])

    conds = {"x": flat(traj.conds_x)}
    if traj.conds_eps is not None:
        conds["epsilon"] = flat(traj.conds_eps)
    actions = flat(traj.actions)
    old_probs = flat(traj.probs)
    masks = flat(traj.masks)
    adv = jnp.repeat(advantages.reshape(b, 1), s, axis=1).reshape(n, 1)
    valid = (
        jnp.ones((n, 1), jnp.float32)
        if traj.valid is None
        else flat(traj.valid).reshape(n, 1).astype(jnp.float32)
    )
    return conds, actions, old_probs, adv * masks, valid


def ppo_loss(
    factor_net: FactorNet,
    params: Any,
    conds: Dict[str, jax.Array],
    actions: jax.Array,
    old_probs: jax.Array,
    advantages: jax.Array,
    clip_range: float = 0.2,
    entropy_coef: float = 0.01,
    valid: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Clipped-surrogate loss with joint log-probs (train_ppo.py:406-427).

    ``valid`` [N, 1] weights rows in every mean — pad rows of a padded
    rollout contribute to neither the surrogate nor the entropy bonus, so
    the loss (and its gradients) equal the per-count program's on the real
    rows.  None = unweighted means (all rows real, the reference's case)."""
    curr_probs, entropy = factor_net.get_action_probs(params, conds, actions)
    log_probs = jnp.log(curr_probs + 1e-9).sum(axis=1, keepdims=True)
    old_log_probs = jnp.log(old_probs + 1e-9).sum(axis=1, keepdims=True)
    ratio = jnp.exp(log_probs - old_log_probs)
    clipped_ratio = jnp.clip(ratio, 1 - clip_range, 1 + clip_range)
    surrogate = -jnp.minimum(advantages * ratio, advantages * clipped_ratio)

    if valid is None:
        policy_loss = surrogate.mean()
        entropy_mean = entropy.mean()
        ratio_mean = ratio.mean()
    else:
        w = valid.reshape(-1, 1).astype(surrogate.dtype)
        n_rows = jnp.maximum(w.sum(), 1.0)
        policy_loss = (surrogate * w).sum() / (n_rows * surrogate.shape[1])
        entropy_mean = (entropy * w).sum() / (n_rows * entropy.shape[1])
        ratio_mean = (ratio * w).sum() / n_rows
    entropy_loss = -entropy_coef * entropy_mean
    loss = policy_loss + entropy_loss
    return loss, {
        "policy_loss": policy_loss,
        "entropy": entropy_mean,
        "ratio_mean": ratio_mean,
        "loss": loss,
    }


def make_optimizer(config: PPOConfig) -> optax.GradientTransformation:
    """AdamW + global-norm clip (replaces the 8-bit bnb Adam + accelerate
    clip_grad_norm, train_ppo.py:211-229,430-437).  With
    ``grad_accumulation_steps`` k > 1, grads are averaged across k update
    calls and the optimizer applies on every k-th (optax.MultiSteps — the
    accelerate ``accumulate`` wrapper, train_ppo.py:324; production runs
    use 1, run_ppo.sh:19)."""
    opt = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adamw(
            config.learning_rate,
            b1=config.adam_b1,
            b2=config.adam_b2,
            eps=config.adam_eps,
            weight_decay=config.weight_decay,
        ),
    )
    if config.grad_accumulation_steps > 1:
        opt = optax.MultiSteps(opt, config.grad_accumulation_steps)
    return opt


def make_update_fn(
    factor_net: FactorNet,
    optimizer: optax.GradientTransformation,
    config: PPOConfig,
    grad_sync: Optional[Callable[[Any], Any]] = None,
):
    """Build the jitted PPO update.  ``grad_sync`` hooks in the cross-device
    psum mean for data-parallel training (dist.mesh)."""

    def update(params, opt_state, conds, actions, old_probs, advantages,
               valid=None):
        def loss_fn(p):
            return ppo_loss(
                factor_net, p, conds, actions, old_probs, advantages,
                config.clip_range, config.entropy_coef, valid=valid,
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if grad_sync is not None:
            grads = grad_sync(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        aux["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, aux

    return update
