"""TRUE golden oracles: the reference's own scheduler code (torch-CPU,
imported under tests/diffusers_stub) step-compared against our solver stack
(VERDICT r2 Missing #4 — replaces reliance on the hand-written emulator).

Covered: PPOScheduler (scheduler_ppo.py:178-299) vs core/solver ops,
FlowMatchGeneralDiscreteScheduler's 4 baselines (edit_ppo/scheduler_fm.py
:405-484) vs pipelines/fm.FmBaseline, FMPPOScheduler (edit_ppo/
scheduler_fmppo.py:306-455) vs the FM solver ops, and the AMED plugin
(diffusers_amed_plugin_dpmpp.py:27-436 — sigma-snap schedule, grad scales,
dpmsolver++ and both sde variants with injected variance noise) vs
solver_zoo.DpmMultistep.  Actions are injected identically on both sides
via diffusers_stub.FixedActionNet.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from consolver_tpu.core import schedules, solver
from consolver_tpu.pipelines.fm import FmBaseline
from tests.diffusers_stub import FixedActionNet, load_reference


def _ref_ppo_scheduler(**kw):
    mod = load_reference("scheduler_ppo.py")
    return mod.PPOScheduler(**kw)


def _ref_fm_scheduler(**kw):
    mod = load_reference("edit_ppo/scheduler_fm.py")
    return mod.FlowMatchGeneralDiscreteScheduler(**kw)


def _ref_fmppo_scheduler(**kw):
    mod = load_reference("edit_ppo/scheduler_fmppo.py")
    return mod.FMPPOScheduler(**kw)


class TestPPOSchedulerGolden:
    """Our ring-buffer LMM + DDIM update (core/solver) against the actual
    scheduler_ppo.PPOScheduler stepping the same eps/action sequences."""

    @pytest.mark.parametrize("order_dim,scaler_dim", [(4, 0), (3, 1), (2, 2)])
    def test_step_trajectory(self, order_dim, scaler_dim, capsys):
        num_steps, batch = 8, 2
        rng = np.random.default_rng(order_dim * 10 + scaler_dim)
        n_actions = order_dim + scaler_dim - 1
        actions = rng.uniform(-0.3, 0.3, (num_steps, batch, n_actions)).astype(
            np.float32
        )
        eps_seq = rng.standard_normal((num_steps, batch, 3, 4, 4)).astype(np.float32)
        noise = rng.standard_normal((batch, 3, 4, 4)).astype(np.float32)

        # --- reference oracle (matches our sd15 schedule + trailing ladder) ---
        sched = _ref_ppo_scheduler(
            num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
            beta_schedule="scaled_linear", timestep_spacing="trailing",
            steps_offset=1, order_dim=order_dim, scaler_dim=scaler_dim,
        )
        sched.set_timesteps(num_steps)
        sched.factor_net = FixedActionNet(list(actions))
        x_ref = torch.from_numpy(noise.copy())
        ref_traj, ref_masks = [], []
        for i, t in enumerate(sched.timesteps):
            out = sched.step(
                torch.from_numpy(eps_seq[i]), int(t), x_ref, return_dict=False
            )
            x_ref = out[0]
            ref_traj.append(x_ref.numpy().copy())
            ref_masks.append(out[4].numpy().copy())
        capsys.readouterr()  # swallow the reference's per-step prints

        # --- our side: the exact op sequence pipelines/t2i traces ---
        our = schedules.DiffusionSchedule.sd15()
        np.testing.assert_allclose(
            our.alphas_cumprod, sched.alphas_cumprod.numpy(), rtol=1e-5
        )
        ts = schedules.spaced_timesteps(1000, num_steps, "trailing", 1)
        np.testing.assert_array_equal(ts, sched.timesteps.numpy())
        alphas = jnp.asarray(our.alphas_cumprod)
        state = solver.init_state(batch, order_dim, (3, 4, 4))
        x = jnp.asarray(noise)
        for i, t in enumerate(ts):
            t_prev = int(t) - 1000 // num_steps
            state = solver.push(state, jnp.asarray(eps_seq[i]))
            order_a, scale_a, _ = solver.split_actions(
                jnp.asarray(actions[i]), order_dim, scaler_dim
            )
            coeffs = solver.normalized_coefficients(
                order_a, state.num_ets, order_dim
            )
            eff = solver.combine(state, coeffs)
            eff, scaled = solver.apply_scalers(eff, x, scale_a)
            masks = solver.warmup_masks(
                state.num_ets, order_dim, n_actions, batch
            )
            a_t, a_prev = solver.gather_alpha_prods(
                alphas, int(t), t_prev, our.final_alpha_cumprod
            )
            x = solver.ddim_update(scaled, eff, a_t, a_prev, "epsilon")
            np.testing.assert_allclose(
                np.asarray(x), ref_traj[i], rtol=1e-5, atol=1e-5,
                err_msg=f"step {i} (t={t})",
            )
            np.testing.assert_array_equal(np.asarray(masks), ref_masks[i])


class TestFmBaselineGolden:
    """pipelines/fm.FmBaseline against the actual scheduler_fm code for all
    four solver types, with an x-dependent velocity so errors would
    compound."""

    @pytest.mark.parametrize(
        "solver_type", ["euler", "heun", "dpm-solver", "dpm-solver-multistep"]
    )
    @pytest.mark.parametrize("shift", [1.0, 3.0])
    def test_step_trajectory(self, solver_type, shift):
        num_steps, batch = 6, 2
        # str hash is process-salted — seed deterministically by index
        from consolver_tpu.pipelines.fm import FM_SOLVERS

        rng = np.random.default_rng(FM_SOLVERS.index(solver_type))
        noise = rng.standard_normal((batch, 5, 4)).astype(np.float32)
        consts = rng.standard_normal((num_steps, batch, 5, 4)).astype(np.float32)

        def velocity(x_np, i):
            return np.sin(x_np) * 0.3 + consts[i]

        sched = _ref_fm_scheduler(shift=shift, type=solver_type)
        sched.set_timesteps(num_inference_steps=num_steps)
        x_ref = torch.from_numpy(noise.copy())
        ref_traj = []
        for i, t in enumerate(sched.timesteps):
            v = torch.from_numpy(velocity(x_ref.numpy(), i))
            x_ref = sched.step(v, t, x_ref, return_dict=False)[0]
            ref_traj.append(x_ref.numpy().copy())

        ours = FmBaseline(
            schedules.FlowMatchConfig(shift=shift), num_steps, solver_type
        )
        np.testing.assert_allclose(
            np.asarray(ours.sigmas), sched.sigmas.numpy(), rtol=1e-5, atol=1e-7
        )
        x = jnp.asarray(noise)
        for i in range(num_steps):
            v = jnp.asarray(velocity(np.asarray(x), i))
            x = ours.step(i, x, v)
            np.testing.assert_allclose(
                np.asarray(x), ref_traj[i], rtol=1e-5, atol=2e-5,
                err_msg=f"{solver_type} step {i}",
            )


class TestFMPPOGolden:
    """The FM learnable solver (make_fm_denoise_fn's op sequence) against
    the actual FMPPOScheduler with injected actions."""

    @pytest.mark.parametrize("order_dim,scaler_dim", [(2, 0), (3, 1)])
    @pytest.mark.parametrize("shift", [1.0, 3.0])
    def test_step_trajectory(self, order_dim, scaler_dim, shift, capsys):
        num_steps, batch = 5, 2
        rng = np.random.default_rng(order_dim + int(shift))
        n_actions = order_dim + scaler_dim - 1
        actions = rng.uniform(-0.3, 0.3, (num_steps, batch, n_actions)).astype(
            np.float32
        )
        v_seq = rng.standard_normal((num_steps, batch, 6, 4)).astype(np.float32)
        noise = rng.standard_normal((batch, 6, 4)).astype(np.float32)

        sched = _ref_fmppo_scheduler(
            shift=shift, order_dim=order_dim, scaler_dim=scaler_dim, mu_dim=0,
        )
        sched.set_timesteps(num_inference_steps=num_steps)
        sched.factor_net = FixedActionNet(list(actions))
        x_ref = torch.from_numpy(noise.copy())
        ref_traj, ref_masks = [], []
        for i, t in enumerate(sched.timesteps):
            out = sched.step(
                torch.from_numpy(v_seq[i]), t, x_ref, return_dict=False
            )
            x_ref = out[0]
            ref_traj.append(x_ref.numpy().copy())
            ref_masks.append(out[4].numpy().copy())
        capsys.readouterr()

        sigmas, _ = schedules.fm_sigmas(
            schedules.FlowMatchConfig(shift=shift), num_steps
        )
        np.testing.assert_allclose(
            sigmas, sched.sigmas.numpy(), rtol=1e-5, atol=1e-7
        )
        state = solver.init_state(batch, order_dim, (6, 4))
        x = jnp.asarray(noise)
        for i in range(num_steps):
            dt = float(sigmas[i + 1] - sigmas[i])
            state = solver.push(state, jnp.asarray(v_seq[i]))
            order_a, scale_a, _ = solver.split_actions(
                jnp.asarray(actions[i]), order_dim, scaler_dim
            )
            coeffs = solver.normalized_coefficients(
                order_a, state.num_ets, order_dim
            )
            eff = solver.combine(state, coeffs)
            eff, x32 = solver.apply_scalers(eff, x, scale_a)
            masks = solver.warmup_masks(
                state.num_ets, order_dim, n_actions, batch
            )
            x = solver.fm_euler_update(x32, eff, dt)
            np.testing.assert_allclose(
                np.asarray(x), ref_traj[i], rtol=1e-5, atol=1e-5,
                err_msg=f"step {i}",
            )
            np.testing.assert_array_equal(np.asarray(masks), ref_masks[i])


class TestAmedPluginGolden:
    """Our AMED/sde zoo solver (solver_zoo.DpmMultistep with the learned
    schedule tables) against the actual diffusers_amed_plugin_dpmpp.py
    subclass running on the stub base (which reproduces only the diffusers
    base members the plugin relies on)."""

    def _drive(self, algorithm, num_steps, with_noise):
        from consolver_tpu.pipelines.solver_zoo import (
            AMED_SCHEDULES, DpmMultistep, amed_solver,
        )

        mod = load_reference("diffusers_amed_plugin_dpmpp.py")
        tbl = AMED_SCHEDULES[num_steps]
        rng = np.random.default_rng(num_steps)
        consts = rng.standard_normal((num_steps, 2, 3, 4, 4)).astype(np.float32)
        noises = rng.standard_normal((num_steps, 2, 3, 4, 4)).astype(np.float32)
        noise0 = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)

        def eps_fn(x_np, i):
            return 0.1 * x_np + consts[i]

        ref = mod.DPMSolverMultistepScheduler(
            num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
            beta_schedule="scaled_linear", solver_order=2,
            algorithm_type=algorithm, final_sigmas_type="sigma_min",
        )
        ref.scale_dirs = tbl["grad_scale"]
        ref.scale_times = tbl["time_scale"]
        ref.set_timesteps(timesteps=tbl["amed"])
        x_ref = torch.from_numpy(noise0.copy())
        ref_traj = []
        for i, t in enumerate(ref.timesteps):
            eps = torch.from_numpy(eps_fn(x_ref.numpy(), i))
            x_ref = ref.step(
                eps, int(t), x_ref,
                variance_noise=torch.from_numpy(noises[i]),
                return_dict=False,
            )[0]
            ref_traj.append(x_ref.numpy().copy())

        sched = schedules.DiffusionSchedule.sd15()
        if algorithm == "dpmsolver++":
            ours = amed_solver(sched, num_steps)
        else:
            base = amed_solver(sched, num_steps)
            ours = DpmMultistep(
                sched, num_steps, algorithm=algorithm,
                custom_timesteps=base.timesteps, custom_sigmas=base.sigmas,
                grad_scales=tbl["grad_scale"], noise_key=__import__("jax").random.key(0),
            )
        if with_noise:
            ours._noise = lambda i, shape, dtype: jnp.asarray(noises[i])
        # the sigma-snap must remap the same odd timesteps
        np.testing.assert_array_equal(ours.timesteps, ref.timesteps.numpy())
        x = jnp.asarray(noise0)
        for i in range(num_steps):
            eps = jnp.asarray(eps_fn(np.asarray(x), i))
            x = ours.step(i, x, eps)
            np.testing.assert_allclose(
                np.asarray(x), ref_traj[i], rtol=1e-4, atol=1e-5,
                err_msg=f"{algorithm} n={num_steps} step {i}",
            )

    @pytest.mark.parametrize("num_steps", [4, 8])
    def test_amed_dpmpp(self, num_steps):
        self._drive("dpmsolver++", num_steps, with_noise=False)

    @pytest.mark.parametrize("algorithm", ["sde-dpmsolver++", "sde-dpmsolver"])
    def test_amed_sde(self, algorithm):
        self._drive(algorithm, 4, with_noise=True)
