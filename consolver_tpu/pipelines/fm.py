"""Flow-matching denoise pipelines: the learnable FMPPO solver and the
training-free FM baseline zoo.

TPU-native rebuild of edit_ppo/scheduler_fmppo.py (learnable multistep over
the FM Euler update) and edit_ppo/scheduler_fm.py (euler / heun / dpm-solver
/ dpm-solver-multistep baselines behind one switch, :405-484).  Same design
as the DDPM-side pipelines: sigma ladders and all per-step coefficients are
static, the loop is one jitted scan (learnable path) or unrolled traced loop
(baselines), and the model is abstracted as ``velocity_fn(params, x,
timestep, cond) -> v``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from consolver_tpu.core import schedules, solver
from consolver_tpu.pipelines.t2i import Trajectory
from consolver_tpu.policy.factor_net import FactorNet

FM_SOLVERS = ("euler", "heun", "dpm-solver", "dpm-solver-multistep")


def make_fm_denoise_fn(
    velocity_fn: Callable[..., jax.Array],
    fm_config: schedules.FlowMatchConfig,
    factor_net: Optional[FactorNet],
    num_inference_steps: int,
    mu: Optional[float] = None,
    record_trajectory: bool = True,
    per_token: bool = False,
    deterministic_policy: bool = False,
):
    """Learnable-FM denoise scan (FMPPOScheduler.step semantics,
    edit_ppo/scheduler_fmppo.py:306-455).

    velocity_fn: (params, x, timestep[B] (= sigma*1000), cond) -> velocity.
    Returned fn: (model_params, factor_params, key, noise, cond) ->
    (final latents, Trajectory or None).  conds x = [sigma_t, sigma_next]
    (:383); update x <- x + dt*v_hat with dt = sigma_next - sigma_t (:429).

    ``per_token=True`` exposes the Mochi-style per-token-timesteps branch
    (scheduler_fmppo.py:363-371, production-unused): the returned fn takes
    an extra trailing ``per_token_timesteps`` [B, S] argument (noise must
    be token-major [B, S, C]); each token steps with dt = its own sigma
    minus the largest ladder sigma strictly below it (the reference's
    positive, Mochi-ladder dt — the mirror of the ladder branch, see
    solver.fm_per_token_update), and the carried per-token timesteps
    descend the ladder independently.  The policy conds keep the ladder
    sigma pair (the reference's per-token conds construction only admits
    one-element sigma tensors) and the velocity model is conditioned on
    the ladder timestep.  With ``per_token=False`` the traced program is
    unchanged.

    ``deterministic_policy=True`` takes the mode action each step
    (FactorNet.mode_action) — serving-mode knob making a row's output
    independent of its batch slot; training must sample."""
    if factor_net is None:
        order_dim, scaler_dim, action_dims = 1, 0, 1
    else:
        order_dim = factor_net.config.order_dim
        scaler_dim = factor_net.config.scaler_dim
        action_dims = factor_net.config.action_dims
    use_conv = factor_net is not None and factor_net.config.use_conv

    sigmas, timesteps = schedules.fm_sigmas(fm_config, num_inference_steps, mu=mu)
    sig_t = jnp.asarray(sigmas[:-1])
    sig_next = jnp.asarray(sigmas[1:])
    ladder = jnp.asarray(sigmas)
    ts = jnp.asarray(timesteps)
    n_train = fm_config.num_train_timesteps

    @jax.jit
    def denoise(model_params, factor_params, key, noise, cond,
                per_token_timesteps=None):
        batch = noise.shape[0]
        state = solver.init_state(batch, order_dim, noise.shape[1:])

        def body(carry, xs):
            if per_token:
                st, x, k, ptts = carry
            else:
                st, x, k = carry
            t, s_t, s_next = xs
            v = velocity_fn(
                model_params, x, jnp.broadcast_to(t, (batch,)), cond
            ).astype(jnp.float32)
            x32 = x.astype(jnp.float32)

            conds_x = jnp.tile(jnp.stack([s_t, s_next])[None], (batch, 1))
            st = solver.push(st, v)
            if factor_net is not None:
                k, sub = jax.random.split(k)
                conds = {"x": conds_x, "epsilon": st.ets}
                if deterministic_policy:
                    actions, probs = factor_net.mode_action(factor_params, conds)
                else:
                    actions, probs = factor_net.sample_action(
                        factor_params, sub, conds
                    )
            else:
                actions = jnp.zeros((batch, action_dims), jnp.float32)
                probs = jnp.ones((batch, action_dims), jnp.float32)

            order_a, scale_a, _ = solver.split_actions(actions, order_dim, scaler_dim)
            coeffs = solver.normalized_coefficients(
                order_a.astype(jnp.float32), st.num_ets, order_dim
            )
            eff = solver.combine(st, coeffs)
            eff, x32 = solver.apply_scalers(eff, x32, scale_a.astype(jnp.float32))
            masks = solver.warmup_masks(st.num_ets, order_dim, action_dims, batch)

            record = (conds_x, actions, probs, masks) + ((st.ets,) if use_conv else ())
            if per_token:
                cur_s, low_s = solver.per_token_sigma_pair(ptts, ladder, n_train)
                # dt = current - next (scheduler_fmppo.py:371): the mirror of
                # the ladder branch — see solver.fm_per_token_update.
                dt = (cur_s - low_s)[..., None]
                x_new = (x32 + dt * eff).astype(x.dtype)
                return (st, x_new, k, low_s * n_train), record
            x_new = solver.fm_euler_update(x32, eff, s_next - s_t).astype(x.dtype)
            return (st, x_new, k), record

        if per_token:
            init = (state, noise, key, jnp.asarray(per_token_timesteps, jnp.float32))
            (_, x, _, _), records = jax.lax.scan(
                init=init, xs=(ts, sig_t, sig_next), f=body
            )
        else:
            (_, x, _), records = jax.lax.scan(
                body, (state, noise, key), (ts, sig_t, sig_next)
            )
        if not record_trajectory:
            return x, None

        def to_traj(a):
            return jnp.swapaxes(a[1:], 0, 1)

        traj = Trajectory(
            conds_x=to_traj(records[0]),
            actions=to_traj(records[1]),
            probs=to_traj(records[2]),
            masks=to_traj(records[3]),
            conds_eps=to_traj(records[4]) if use_conv else None,
        )
        return x, traj

    return denoise


def padded_fm_ladder(
    fm_config: schedules.FlowMatchConfig,
    num_inference_steps: int,
    max_steps: int,
    mu: Optional[float] = None,
):
    """Host-side ladder for :func:`make_padded_fm_denoise_fn`: the true
    ``num_inference_steps`` FM sigma ladder front-loaded into [max_steps]
    arrays with a validity mask (pad steps repeat the last entries and are
    masked to passthrough).  FM twin of t2i.padded_ladder."""
    assert 1 <= num_inference_steps <= max_steps
    import numpy as np

    sigmas, timesteps = schedules.fm_sigmas(
        fm_config, num_inference_steps, mu=mu
    )
    sig_t = np.asarray(sigmas[:-1], np.float32)
    sig_next = np.asarray(sigmas[1:], np.float32)
    ts = np.asarray(timesteps, np.float32)
    pad = max_steps - num_inference_steps
    ts_p = np.concatenate([ts, np.repeat(ts[-1:], pad)])
    st_p = np.concatenate([sig_t, np.repeat(sig_t[-1:], pad)])
    sn_p = np.concatenate([sig_next, np.repeat(sig_next[-1:], pad)])
    valid = np.concatenate([np.ones(num_inference_steps), np.zeros(pad)])
    return (
        jnp.asarray(ts_p),
        jnp.asarray(st_p),
        jnp.asarray(sn_p),
        jnp.asarray(valid, jnp.float32),
    )


def make_padded_fm_denoise_fn(
    velocity_fn: Callable[..., jax.Array],
    fm_config: schedules.FlowMatchConfig,
    factor_net: Optional[FactorNet],
    max_steps: int,
    record_trajectory: bool = True,
    deterministic_policy: bool = False,
):
    """Pad-to-max variant of :func:`make_fm_denoise_fn`: ONE compiled
    program serves every inference-step count in [1, max_steps] — the FM
    twin of t2i.make_padded_denoise_fn (the reference's FLUX trainer
    randomizes steps in [2, 6), edit_ppo/train_ppo.py:275, which costs one
    ~10-min full-size remote compile per count; serving gets arbitrary
    step counts from one program).  The (t, sigma_t, sigma_next, valid)
    ladder is scan DATA (:func:`padded_fm_ladder`); pad steps run the
    velocity model but revert latent + solver history (passthrough) and
    zero their trajectory masks; ``Trajectory.valid`` carries the row
    flags so the PPO loss excludes pad rows from surrogate AND entropy.

    Returned fn: (model_params, factor_params, key, noise, cond,
    ts[M], sig_t[M], sig_next[M], valid[M]) -> (latents, Trajectory)."""
    if factor_net is None:
        order_dim, scaler_dim, action_dims = 1, 0, 1
    else:
        order_dim = factor_net.config.order_dim
        scaler_dim = factor_net.config.scaler_dim
        action_dims = factor_net.config.action_dims
    use_conv = factor_net is not None and factor_net.config.use_conv

    @jax.jit
    def denoise(model_params, factor_params, key, noise, cond,
                ts, sig_t, sig_next, valid):
        batch = noise.shape[0]
        state = solver.init_state(batch, order_dim, noise.shape[1:])

        def body(carry, xs):
            st0, x0, k = carry
            t, s_t, s_next, v_row = xs
            v = velocity_fn(
                model_params, x0, jnp.broadcast_to(t, (batch,)), cond
            ).astype(jnp.float32)
            x32 = x0.astype(jnp.float32)

            conds_x = jnp.tile(jnp.stack([s_t, s_next])[None], (batch, 1))
            st = solver.push(st0, v)
            if factor_net is not None:
                k, sub = jax.random.split(k)
                conds = {"x": conds_x, "epsilon": st.ets}
                if deterministic_policy:
                    actions, probs = factor_net.mode_action(factor_params, conds)
                else:
                    actions, probs = factor_net.sample_action(
                        factor_params, sub, conds
                    )
            else:
                actions = jnp.zeros((batch, action_dims), jnp.float32)
                probs = jnp.ones((batch, action_dims), jnp.float32)

            order_a, scale_a, _ = solver.split_actions(
                actions, order_dim, scaler_dim
            )
            coeffs = solver.normalized_coefficients(
                order_a.astype(jnp.float32), st.num_ets, order_dim
            )
            eff = solver.combine(st, coeffs)
            eff, x32 = solver.apply_scalers(eff, x32, scale_a.astype(jnp.float32))
            masks = solver.warmup_masks(st.num_ets, order_dim, action_dims, batch)
            masks = masks * v_row  # pad steps contribute no advantage

            x_new = solver.fm_euler_update(x32, eff, s_next - s_t).astype(x0.dtype)
            # passthrough on pad steps: latent and solver history unchanged
            x_new = jnp.where(v_row > 0, x_new, x0)
            st = jax.tree.map(
                lambda new, old: jnp.where(
                    jnp.reshape(v_row > 0, (1,) * new.ndim), new, old
                ),
                st, st0,
            )
            valid_row = jnp.broadcast_to(v_row, (batch,))
            record = (conds_x, actions, probs, masks, valid_row) + (
                (st.ets,) if use_conv else ()
            )
            return (st, x_new, k), record

        (_, x, _), records = jax.lax.scan(
            body, (state, noise, key), (ts, sig_t, sig_next, valid)
        )
        if not record_trajectory:
            return x, None

        def to_traj(a):
            return jnp.swapaxes(a[1:], 0, 1)

        traj = Trajectory(
            conds_x=to_traj(records[0]),
            actions=to_traj(records[1]),
            probs=to_traj(records[2]),
            masks=to_traj(records[3]),
            valid=to_traj(records[4]),
            conds_eps=to_traj(records[5]) if use_conv else None,
        )
        return x, traj

    return denoise


class FmBaseline:
    """Training-free FM solver zoo (edit_ppo/scheduler_fm.py:405-484):
    euler, heun (2-stage over sigma pairs), dpm-solver (2-stage), and
    dpm-solver-multistep.  Python-level state; use inside an unrolled
    traced loop."""

    def __init__(
        self,
        fm_config: schedules.FlowMatchConfig,
        num_inference_steps: int,
        solver_type: str = "euler",
        mu: Optional[float] = None,
    ):
        if solver_type not in FM_SOLVERS:
            raise ValueError(f"Unknown FM solver {solver_type!r}; one of {FM_SOLVERS}")
        self.type = solver_type
        self.sigmas, self.timesteps = schedules.fm_sigmas(
            fm_config, num_inference_steps, mu=mu
        )
        self.reset()

    def reset(self):
        self.prev_dt = None
        self.prev_sample = None
        self.prev_model_output = None

    def step(self, i: int, x, v):
        sig = self.sigmas
        x = x.astype(jnp.float32)
        if self.type == "euler":
            dt = float(sig[i + 1] - sig[i])
            out = x + dt * v
        elif self.type == "heun":
            # 2-stage over sigma pairs: predictor jumps two sigmas, the next
            # call averages the two velocities (scheduler_fm.py:412-430)
            if i % 2 == 0:
                nxt = sig[i + 2] if i + 2 < len(sig) else sig[-1]
                dt = float(nxt - sig[i])
                self.prev_dt, self.prev_sample, self.prev_model_output = dt, x, v
                out = x + dt * v
            else:
                out = self.prev_sample + 0.5 * self.prev_dt * (
                    self.prev_model_output + v
                )
        elif self.type == "dpm-solver":
            # 2-stage: predictor takes one sigma, the corrector re-integrates
            # the combined interval with the midpoint velocity (:431-452)
            if i % 2 == 0:
                dt = float(sig[i + 1] - sig[i])
                self.prev_dt, self.prev_sample, self.prev_model_output = dt, x, v
                out = x + dt * v
            else:
                dt = self.prev_dt + float(sig[i + 1] - sig[i])
                out = self.prev_sample + dt * v
        else:  # dpm-solver-multistep (:454-484)
            if i == 0:
                dt = float(sig[i + 1] - sig[i])
                self.prev_dt, self.prev_sample = dt, x
                out = x + dt * v
            else:
                dt = self.prev_dt + float(sig[i + 1] - sig[i])
                out = self.prev_sample + dt * v
                self.prev_dt = float(sig[i + 1] - sig[i])
                self.prev_sample = x
        return out


def make_fm_baseline_denoise_fn(
    velocity_fn: Callable[..., jax.Array],
    fm_config: schedules.FlowMatchConfig,
    solver_type: str,
    num_inference_steps: int,
    mu: Optional[float] = None,
):
    """Jitted unrolled FM baseline denoise: (model_params, noise, cond) ->
    final latents."""

    @jax.jit
    def denoise(model_params, noise, cond):
        s = FmBaseline(fm_config, num_inference_steps, solver_type, mu=mu)
        x = noise
        batch = x.shape[0]
        for i, t in enumerate(s.timesteps):
            v = velocity_fn(
                model_params, x, jnp.full((batch,), float(t), jnp.float32), cond
            ).astype(jnp.float32)
            x = s.step(i, x, v).astype(noise.dtype)
        return x

    return denoise
