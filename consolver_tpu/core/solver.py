"""The learnable linear-multistep (LMM) solver core, as pure functions.

This is the TPU-native re-design of the reference's ``PPOScheduler.step``
(/root/reference/scheduler_ppo.py:178-299) and ``FMPPOScheduler.step``
(/root/reference/edit_ppo/scheduler_fmppo.py:306-455).  The reference keeps a
Python list ``self.ets`` of past model outputs; under ``jax.lax.scan`` that
history must instead live in a fixed-size ring buffer carried through the
scan, with an integer counter masking the warmup steps.

Semantics reproduced exactly (golden-tested against a list-based emulator):

  * history push / trim / zero-pad to ``order_dim``      (scheduler_ppo.py:214-232)
  * warm-up action mask ``masks[:, num_ets-1:order_dim-1] = 0``       (:248-249)
  * coefficient normalization ``set_default_coefficients``:
    placeholder-append, p0 += 1, p[num_ets-1] = 1 - sum(p[:num_ets-1])
    so the combination sums to 1, scalers += 1                        (:165-175)
  * epsilon-combination: first step passes the raw model output through;
    later steps combine the most-recent ``num_ets`` outputs           (:262-272)
  * optional output/sample scaling by 1 or 2 scaler actions           (:274-280)
  * DDIM x0-form update with v-prediction support                     (:306-332)
  * FM Euler update ``x + dt * v_hat``            (scheduler_fmppo.py:373-376,429)

All functions are batched: ``ets`` is ``[B, order_dim, *sample_shape]`` with
the most recent output at index 0 (matching ``stack(self.ets[::-1])``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LMMState:
    """Solver history carried through the denoise scan.

    Attributes:
      ets: ``[B, order_dim, *sample_shape]`` ring of past model outputs,
        most recent first; slots ``>= num_ets`` are zero (the reference's
        zero-padding, scheduler_ppo.py:222-232).
      num_ets: scalar int32, number of valid history entries (<= order_dim).
    """

    ets: jax.Array
    num_ets: jax.Array

    @property
    def order_dim(self) -> int:
        return self.ets.shape[1]


def init_state(batch: int, order_dim: int, sample_shape: Tuple[int, ...], dtype=jnp.float32) -> LMMState:
    return LMMState(
        ets=jnp.zeros((batch, order_dim) + tuple(sample_shape), dtype=dtype),
        num_ets=jnp.zeros((), dtype=jnp.int32),
    )


def push(state: LMMState, model_output: jax.Array) -> LMMState:
    """Push the newest model output into the history ring (most recent first)."""
    ets = jnp.concatenate(
        [model_output[:, None].astype(state.ets.dtype), state.ets[:, :-1]], axis=1
    )
    num_ets = jnp.minimum(state.num_ets + 1, state.order_dim)
    return LMMState(ets=ets, num_ets=num_ets)


def normalized_coefficients(order_actions: jax.Array, num_ets: jax.Array, order_dim: int) -> jax.Array:
    """``set_default_coefficients`` for the order coefficients.

    Args:
      order_actions: ``[B, order_dim - 1]`` raw sampled actions.
      num_ets: scalar int32 count of valid history entries.
    Returns:
      ``[B, order_dim]`` coefficients; when ``num_ets > 1`` the first
      ``num_ets`` of them sum to 1.
    """
    batch = order_actions.shape[0]
    if order_dim == 1:
        # No learnable order coefficients; first (and only) slot is the raw
        # output passthrough, coefficient 1.
        return jnp.ones((batch, 1), dtype=order_actions.dtype)
    # Placeholder-append of the last action (scheduler_ppo.py:166), then p0 += 1.
    base = jnp.concatenate([order_actions, order_actions[:, -1:]], axis=1)
    base = base.at[:, 0].add(1.0)
    idx = jnp.arange(order_dim)[None, :]
    prefix = jnp.sum(jnp.where(idx < num_ets - 1, base, 0.0), axis=1, keepdims=True)
    closing = (idx == num_ets - 1) & (num_ets > 1)
    return jnp.where(closing, 1.0 - prefix, base)


def combine(state: LMMState, coeffs: jax.Array) -> jax.Array:
    """epsilon_hat = sum_i c_i * ets_i over the valid history
    (scheduler_ppo.py:262-272).

    The first step (num_ets == 1) passes the raw model output through
    unscaled, matching the reference's explicit branch.
    """
    batch, order_dim = state.ets.shape[:2]
    valid = (jnp.arange(order_dim) < state.num_ets).astype(coeffs.dtype)
    weights = (coeffs * valid[None, :]).reshape(
        (batch, order_dim) + (1,) * (state.ets.ndim - 2)
    )
    mixed = jnp.sum(weights * state.ets.astype(coeffs.dtype), axis=1)
    return jnp.where(state.num_ets == 1, state.ets[:, 0].astype(coeffs.dtype), mixed)


def warmup_masks(num_ets: jax.Array, order_dim: int, action_dims: int, batch: int) -> jax.Array:
    """PPO masks: zero for order-action dims not yet active during warmup
    (masks[:, num_ets-1 : order_dim-1] = 0, scheduler_ppo.py:248-249)."""
    j = jnp.arange(action_dims)[None, :]
    inactive = (j >= num_ets - 1) & (j < order_dim - 1)
    return jnp.broadcast_to(
        jnp.where(inactive, 0.0, 1.0), (batch, action_dims)
    )


def split_actions(actions: jax.Array, order_dim: int, scaler_dim: int, mu_dim: int = 0):
    """Split ``[B, order_dim + scaler_dim + mu_dim - 1]`` sampled actions into
    (order, scaler, mu) groups (scheduler_ppo.py:253-255;
    scheduler_fmppo.py:406-409)."""
    order_actions = actions[:, : order_dim - 1]
    scale_actions = actions[:, order_dim - 1 : order_dim - 1 + scaler_dim]
    mu_actions = actions[:, order_dim - 1 + scaler_dim :]
    del mu_dim  # mu actions are carried for PPO but unused by the update.
    return order_actions, scale_actions, mu_actions


def apply_scalers(
    effective_output: jax.Array, sample: jax.Array, scale_actions: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Scale the combined output (and optionally the sample) by 1 + action
    (scheduler_ppo.py:174,274-280)."""
    scaler_dim = scale_actions.shape[1]
    if scaler_dim == 0:
        return effective_output, sample
    expand = (slice(None),) + (None,) * (effective_output.ndim - 1)
    effective_output = effective_output * (scale_actions[:, 0][expand] + 1.0)
    if scaler_dim == 2:
        sample = sample * (scale_actions[:, 1][expand] + 1.0)
    elif scaler_dim > 2:
        raise NotImplementedError("More than two scale parameters not supported.")
    return effective_output, sample


def lmm_combine_step(
    state: LMMState,
    model_output: jax.Array,
    actions: jax.Array,
    sample: jax.Array,
    order_dim: int,
    scaler_dim: int,
) -> Tuple[LMMState, jax.Array, jax.Array, jax.Array]:
    """One full learnable-LMM combination: push history, normalize sampled
    coefficients, combine, scale.

    Returns (new_state, effective_model_output, scaled_sample, masks).
    """
    state = push(state, model_output)
    order_actions, scale_actions, _ = split_actions(actions, order_dim, scaler_dim)
    coeffs = normalized_coefficients(
        order_actions.astype(jnp.float32), state.num_ets, order_dim
    )
    effective = combine(state, coeffs)
    effective, sample = apply_scalers(effective, sample, scale_actions.astype(jnp.float32))
    masks = warmup_masks(state.num_ets, order_dim, actions.shape[1], actions.shape[0])
    return state, effective, sample, masks


# ---------------------------------------------------------------------------
# Family-specific updates
# ---------------------------------------------------------------------------


def ddim_update(
    sample: jax.Array,
    model_output: jax.Array,
    alpha_prod_t: jax.Array,
    alpha_prod_t_prev: jax.Array,
    prediction_type: str = "epsilon",
) -> jax.Array:
    """DDIM x0-form update (scheduler_ppo.py:306-332)."""
    beta_prod_t = 1.0 - alpha_prod_t
    beta_prod_t_prev = 1.0 - alpha_prod_t_prev
    if prediction_type == "v_prediction":
        model_output = (alpha_prod_t**0.5) * model_output + (beta_prod_t**0.5) * sample
    elif prediction_type != "epsilon":
        raise ValueError(f"Unsupported prediction_type: {prediction_type}")
    pred_original = (sample - beta_prod_t**0.5 * model_output) / alpha_prod_t**0.5
    return alpha_prod_t_prev**0.5 * pred_original + beta_prod_t_prev**0.5 * model_output


def fm_euler_update(sample: jax.Array, velocity: jax.Array, dt: jax.Array) -> jax.Array:
    """Flow-matching Euler update x <- x + dt * v  (scheduler_fmppo.py:429)."""
    return sample + dt * velocity


def gather_alpha_prods(
    alphas_cumprod: jax.Array,
    timestep: jax.Array,
    prev_timestep: jax.Array,
    final_alpha_cumprod: float,
) -> Tuple[jax.Array, jax.Array]:
    """alpha-bar at t and t_prev with the final-step underflow fallback
    (scheduler_ppo.py:309-310)."""
    alpha_prod_t = alphas_cumprod[timestep]
    alpha_prod_t_prev = jnp.where(
        prev_timestep >= 0,
        alphas_cumprod[jnp.clip(prev_timestep, 0, alphas_cumprod.shape[0] - 1)],
        jnp.asarray(final_alpha_cumprod, alphas_cumprod.dtype),
    )
    return alpha_prod_t, alpha_prod_t_prev


def add_noise(
    alphas_cumprod: jax.Array,
    original_samples: jax.Array,
    noise: jax.Array,
    timesteps: jax.Array,
) -> jax.Array:
    """DDPM forward process (scheduler_ppo.py:336-358)."""
    a = alphas_cumprod[timesteps].astype(original_samples.dtype)
    shape = a.shape + (1,) * (original_samples.ndim - a.ndim)
    a = a.reshape(shape)
    return a**0.5 * original_samples + (1 - a) ** 0.5 * noise


def fm_scale_noise(
    sigma: jax.Array, sample: jax.Array, noise: jax.Array
) -> jax.Array:
    """Flow-matching forward process x_sigma = sigma*noise + (1-sigma)*x
    (scheduler_fmppo.py:457-484)."""
    shape = sigma.shape + (1,) * (sample.ndim - sigma.ndim)
    sigma = sigma.reshape(shape).astype(sample.dtype)
    return sigma * noise + (1.0 - sigma) * sample


def fm_per_token_update(
    sample: jax.Array,
    velocity: jax.Array,
    per_token_timesteps: jax.Array,
    sigma_ladder: jax.Array,
    num_train_timesteps: int = 1000,
) -> jax.Array:
    """Per-token flow-matching Euler step (scheduler_fmppo.py:363-376,429).

    Each token pairs its own sigma with the largest ladder sigma strictly
    below it, but the reference's dt is ``current - next`` (POSITIVE, the
    mirror of the ladder branch's ``next - current``): the branch is built
    for the inverted Mochi-style ladder, so against a normal descending
    ladder it steps opposite to the ladder program.  Reproduced faithfully
    (golden-tested against scheduler_fmppo.py under the diffusers stub).

    sample/velocity: [B, S, C]; per_token_timesteps: [B, S] in train-timestep
    units; sigma_ladder: [L] descending inference sigmas (with terminal 0).
    """
    per_token_sigmas, lower_sigmas = per_token_sigma_pair(
        per_token_timesteps, sigma_ladder, num_train_timesteps
    )
    dt = (per_token_sigmas - lower_sigmas)[..., None]
    return (sample.astype(jnp.float32) + dt * velocity.astype(jnp.float32)).astype(
        sample.dtype
    )


def per_token_sigma_pair(
    per_token_timesteps: jax.Array,
    sigma_ladder: jax.Array,
    num_train_timesteps: int = 1000,
) -> tuple[jax.Array, jax.Array]:
    """(current, next) sigmas for the per-token branch
    (scheduler_fmppo.py:364-371): each token's next sigma is the largest
    ladder entry strictly below its current sigma (0 when already at the
    terminal).  Shapes: per_token_timesteps [B, S] -> both outputs [B, S]."""
    per_token_sigmas = per_token_timesteps.astype(jnp.float32) / num_train_timesteps
    ladder = sigma_ladder.astype(jnp.float32)  # [L]
    lower_mask = ladder[:, None, None] < per_token_sigmas[None] - 1e-6  # [L, B, S]
    lower_sigmas = jnp.max(
        jnp.where(lower_mask, ladder[:, None, None], 0.0), axis=0
    )  # [B, S]
    return per_token_sigmas, lower_sigmas
