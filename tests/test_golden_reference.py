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


class TestPPOSchedulerConfigGolden:
    """Non-production PPOScheduler configs against the reference: beta
    schedules (scheduler_ppo.py:99-108), timestep spacings (:150-160) and
    v-prediction (:316-318)."""

    @pytest.mark.parametrize(
        "beta_schedule,spacing,offset,prediction_type",
        [
            ("linear", "linspace", 0, "epsilon"),
            ("squaredcos_cap_v2", "leading", 1, "epsilon"),
            ("scaled_linear", "trailing", 1, "v_prediction"),
        ],
    )
    def test_step_trajectory(
        self, beta_schedule, spacing, offset, prediction_type, capsys
    ):
        num_steps, batch, order_dim = 6, 2, 3
        # str hash is process-salted — seed deterministically by lengths
        rng = np.random.default_rng(len(beta_schedule) * 16 + len(spacing))
        actions = rng.uniform(-0.3, 0.3, (num_steps, batch, order_dim - 1)).astype(
            np.float32
        )
        noise = rng.standard_normal((batch, 3, 4, 4)).astype(np.float32)
        consts = rng.standard_normal((num_steps, batch, 3, 4, 4)).astype(np.float32)

        def eps_fn(x_np, i):
            return 0.1 * x_np + consts[i]

        sched = _ref_ppo_scheduler(
            num_train_timesteps=1000, beta_start=0.0001, beta_end=0.02,
            beta_schedule=beta_schedule, timestep_spacing=spacing,
            steps_offset=offset, prediction_type=prediction_type,
            order_dim=order_dim, scaler_dim=0,
        )
        sched.set_timesteps(num_steps)
        sched.factor_net = FixedActionNet(list(actions))
        x_ref = torch.from_numpy(noise.copy())
        ref_traj = []
        for i, t in enumerate(sched.timesteps):
            eps = torch.from_numpy(eps_fn(x_ref.numpy(), i))
            x_ref = sched.step(eps, int(t), x_ref, return_dict=False)[0]
            ref_traj.append(x_ref.numpy().copy())
        capsys.readouterr()

        our = schedules.DiffusionSchedule.create(
            beta_schedule=beta_schedule, prediction_type=prediction_type
        )
        np.testing.assert_allclose(
            our.alphas_cumprod, sched.alphas_cumprod.numpy(), rtol=1e-5
        )
        ts = schedules.spaced_timesteps(1000, num_steps, spacing, offset)
        np.testing.assert_array_equal(ts, sched.timesteps.numpy())
        alphas = jnp.asarray(our.alphas_cumprod)
        state = solver.init_state(batch, order_dim, (3, 4, 4))
        x = jnp.asarray(noise)
        for i, t in enumerate(ts):
            t_prev = int(t) - 1000 // num_steps
            eps = jnp.asarray(eps_fn(np.asarray(x), i))
            state = solver.push(state, eps)
            order_a, _, _ = solver.split_actions(
                jnp.asarray(actions[i]), order_dim, 0
            )
            coeffs = solver.normalized_coefficients(
                order_a, state.num_ets, order_dim
            )
            eff = solver.combine(state, coeffs)
            a_t, a_prev = solver.gather_alpha_prods(
                alphas, int(t), t_prev, our.final_alpha_cumprod
            )
            x = solver.ddim_update(x, eff, a_t, a_prev, prediction_type)
            np.testing.assert_allclose(
                np.asarray(x), ref_traj[i], rtol=1e-5, atol=1e-5,
                err_msg=f"{beta_schedule}/{spacing}/{prediction_type} step {i}",
            )


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


class TestFMPPOSigmaVariantsGolden:
    """The FM sigma machinery variants (scheduler_fmppo.py:212-238,489-550)
    against the reference: dynamic mu shift (exponential + linear),
    shift_terminal stretch, karras/exponential/beta transforms and the
    inverted Mochi ladder — each driven through a full order_dim=2
    trajectory with an x-dependent velocity so ladder errors compound."""

    VARIANTS = {
        "dynamic_exp": (dict(use_dynamic_shifting=True), 0.7),
        "dynamic_linear": (
            dict(use_dynamic_shifting=True, time_shift_type="linear"), 1.5,
        ),
        "terminal": (dict(shift=3.0, shift_terminal=0.3), None),
        "karras": (dict(shift=3.0, use_karras_sigmas=True), None),
        "exponential": (dict(shift=3.0, use_exponential_sigmas=True), None),
        "beta": (dict(shift=3.0, use_beta_sigmas=True), None),
        "invert": (dict(shift=1.0, invert_sigmas=True), None),
    }

    @pytest.mark.parametrize("variant", sorted(VARIANTS))
    def test_step_trajectory(self, variant, capsys):
        kwargs, mu = self.VARIANTS[variant]
        num_steps, batch, order_dim = 5, 2, 2
        rng = np.random.default_rng(sorted(self.VARIANTS).index(variant))
        actions = rng.uniform(-0.3, 0.3, (num_steps, batch, order_dim - 1)).astype(
            np.float32
        )
        noise = rng.standard_normal((batch, 6, 4)).astype(np.float32)
        consts = rng.standard_normal((num_steps, batch, 6, 4)).astype(np.float32)

        def velocity(x_np, i):
            return np.sin(x_np) * 0.3 + consts[i]

        sched = _ref_fmppo_scheduler(
            order_dim=order_dim, scaler_dim=0, mu_dim=0, **kwargs
        )
        sched.set_timesteps(num_inference_steps=num_steps, mu=mu)
        sched.factor_net = FixedActionNet(list(actions))
        x_ref = torch.from_numpy(noise.copy())
        ref_traj = []
        for i, t in enumerate(sched.timesteps):
            v = torch.from_numpy(velocity(x_ref.numpy(), i))
            x_ref = sched.step(v, t, x_ref, return_dict=False)[0]
            ref_traj.append(x_ref.numpy().copy())
        capsys.readouterr()

        cfg = schedules.FlowMatchConfig(**kwargs)
        sigmas, timesteps = schedules.fm_sigmas(cfg, num_steps, mu=mu)
        np.testing.assert_allclose(
            sigmas, sched.sigmas.numpy(), rtol=1e-5, atol=1e-6,
            err_msg=f"{variant} sigma ladder",
        )
        np.testing.assert_allclose(
            timesteps, sched.timesteps.numpy(), rtol=1e-5, atol=1e-3
        )
        state = solver.init_state(batch, order_dim, (6, 4))
        x = jnp.asarray(noise)
        for i in range(num_steps):
            dt = float(sigmas[i + 1] - sigmas[i])
            v = jnp.asarray(velocity(np.asarray(x), i))
            state = solver.push(state, v)
            order_a, scale_a, _ = solver.split_actions(
                jnp.asarray(actions[i]), order_dim, 0
            )
            coeffs = solver.normalized_coefficients(
                order_a, state.num_ets, order_dim
            )
            eff = solver.combine(state, coeffs)
            x = solver.fm_euler_update(x.astype(jnp.float32), eff, dt)
            np.testing.assert_allclose(
                np.asarray(x), ref_traj[i], rtol=1e-5, atol=2e-5,
                err_msg=f"{variant} step {i}",
            )


class TestFMPPOMuDimGolden:
    """mu_dim > 0 (the FLUX factor net's optional mu action group,
    scheduler_fmppo.py:406-410): the mu actions are sampled, recorded and
    masked but NEVER consumed by the update — verified against the
    reference with the extra action column present."""

    def test_step_trajectory(self, capsys):
        num_steps, batch, order_dim, mu_dim = 5, 2, 2, 1
        n_actions = order_dim + 0 + mu_dim - 1  # == 2
        rng = np.random.default_rng(11)
        actions = rng.uniform(-0.3, 0.3, (num_steps, batch, n_actions)).astype(
            np.float32
        )
        v_seq = rng.standard_normal((num_steps, batch, 6, 4)).astype(np.float32)
        noise = rng.standard_normal((batch, 6, 4)).astype(np.float32)

        sched = _ref_fmppo_scheduler(
            shift=3.0, order_dim=order_dim, scaler_dim=0, mu_dim=mu_dim,
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
            schedules.FlowMatchConfig(shift=3.0), num_steps
        )
        state = solver.init_state(batch, order_dim, (6, 4))
        x = jnp.asarray(noise)
        for i in range(num_steps):
            dt = float(sigmas[i + 1] - sigmas[i])
            state = solver.push(state, jnp.asarray(v_seq[i]))
            order_a, scale_a, mu_a = solver.split_actions(
                jnp.asarray(actions[i]), order_dim, 0, mu_dim
            )
            assert mu_a.shape == (batch, mu_dim)
            coeffs = solver.normalized_coefficients(
                order_a, state.num_ets, order_dim
            )
            eff = solver.combine(state, coeffs)
            masks = solver.warmup_masks(
                state.num_ets, order_dim, n_actions, batch
            )
            x = solver.fm_euler_update(x.astype(jnp.float32), eff, dt)
            np.testing.assert_allclose(
                np.asarray(x), ref_traj[i], rtol=1e-5, atol=1e-5,
                err_msg=f"step {i}",
            )
            np.testing.assert_array_equal(np.asarray(masks), ref_masks[i])


class TestFMPPOPerTokenGolden:
    """The per-token-timesteps branch (scheduler_fmppo.py:363-376) against
    the reference.  The reference's conds construction only admits
    one-element sigma tensors (torch.tensor of nested tensors), so the
    oracle runs at B=1, S=1 — which still pins the branch's sigma pairing
    and its POSITIVE dt = current - next (the mirror of the ladder
    branch)."""

    def test_step_trajectory(self, capsys):
        num_steps, order_dim = 5, 2
        rng = np.random.default_rng(13)
        actions = rng.uniform(-0.3, 0.3, (num_steps, 1, order_dim - 1)).astype(
            np.float32
        )
        noise = rng.standard_normal((1, 1, 4)).astype(np.float32)
        consts = rng.standard_normal((num_steps, 1, 1, 4)).astype(np.float32)

        def velocity(x_np, i):
            return np.sin(x_np) * 0.3 + consts[i]

        sched = _ref_fmppo_scheduler(
            shift=1.0, order_dim=order_dim, scaler_dim=0, mu_dim=0,
        )
        sched.set_timesteps(num_inference_steps=num_steps)
        sched.factor_net = FixedActionNet(list(actions))
        lad = sched.sigmas.numpy()

        def lower_sigma(cur):
            below = lad[lad < cur - 1e-6]
            return float(below.max()) if below.size else 0.0

        x_ref = torch.from_numpy(noise.copy())
        ptts_ref = float(sched.timesteps[0])
        ref_traj, ref_ptts = [], []
        for i, t in enumerate(sched.timesteps):
            v = torch.from_numpy(velocity(x_ref.numpy(), i))
            x_ref = sched.step(
                v, t, x_ref,
                per_token_timesteps=torch.full((1, 1), ptts_ref),
                return_dict=False,
            )[0]
            ref_traj.append(x_ref.numpy().copy())
            ptts_ref = lower_sigma(ptts_ref / 1000.0) * 1000.0
            ref_ptts.append(ptts_ref)
        capsys.readouterr()

        sigmas, _ = schedules.fm_sigmas(
            schedules.FlowMatchConfig(shift=1.0), num_steps
        )
        np.testing.assert_allclose(sigmas, lad, rtol=1e-5, atol=1e-7)
        ladder = jnp.asarray(sigmas)
        state = solver.init_state(1, order_dim, (1, 4))
        x = jnp.asarray(noise)
        ptts = jnp.full((1, 1), float(sigmas[0]) * 1000.0)
        for i in range(num_steps):
            v = jnp.asarray(velocity(np.asarray(x), i))
            state = solver.push(state, v)
            order_a, _, _ = solver.split_actions(
                jnp.asarray(actions[i]), order_dim, 0
            )
            coeffs = solver.normalized_coefficients(
                order_a, state.num_ets, order_dim
            )
            eff = solver.combine(state, coeffs)
            x = solver.fm_per_token_update(
                x.astype(jnp.float32), eff, ptts, ladder
            )
            _, low = solver.per_token_sigma_pair(ptts, ladder)
            ptts = low * 1000.0
            np.testing.assert_allclose(
                np.asarray(x), ref_traj[i], rtol=1e-5, atol=1e-5,
                err_msg=f"step {i}",
            )
            np.testing.assert_allclose(
                float(ptts[0, 0]), ref_ptts[i], atol=1e-3
            )


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


class TestDpmZooStockGolden:
    """The STOCK (non-AMED) dpm zoo solvers against the reference plugin
    run in identity-scales mode: scale_dirs/scale_times all ones make the
    sigma-snap a no-op and every update reduce to the verbatim diffusers
    multistep math the plugin carries (diffusers_amed_plugin_dpmpp.py:
    70-348 — first/second/third-order updates + the step() dispatch with
    lower_order_final/lower_order_second warmup).  This upgrades the zoo's
    dpm o1-3 coverage (gen_ppo.py:118-169 pulls them from diffusers) from
    property tests to a reference-file-exact oracle on shared timesteps;
    timestep SPACING itself stays covered by the linspace exactness tests
    (the spacing code lives in diffusers, not in /root/reference)."""

    @pytest.mark.parametrize(
        "algorithm,order,num_steps",
        [
            ("dpmsolver", 1, 8),
            ("dpmsolver", 2, 5),
            ("dpmsolver", 3, 8),
            ("dpmsolver++", 1, 8),
            ("dpmsolver++", 2, 5),
            ("dpmsolver++", 3, 8),
            # n >= 15: the final two steps run at FULL order (the
            # lower_order_final/second guards disengage)
            ("dpmsolver++", 2, 16),
            ("dpmsolver++", 3, 16),
        ],
    )
    def test_stock_dpm(self, algorithm, order, num_steps):
        from consolver_tpu.pipelines.solver_zoo import DpmMultistep

        mod = load_reference("diffusers_amed_plugin_dpmpp.py")
        sched = schedules.DiffusionSchedule.sd15()
        ours = DpmMultistep(
            sched, num_steps, algorithm=algorithm, solver_order=order
        )

        rng = np.random.default_rng(1000 * order + num_steps)
        consts = rng.standard_normal(
            (num_steps, 2, 3, 4, 4)
        ).astype(np.float32)
        noise0 = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)

        def eps_fn(x_np, i):
            return 0.1 * x_np + consts[i]

        ref = mod.DPMSolverMultistepScheduler(
            num_train_timesteps=1000, beta_start=0.00085, beta_end=0.012,
            beta_schedule="scaled_linear", solver_order=order,
            algorithm_type=algorithm, final_sigmas_type="sigma_min",
        )
        ref.scale_dirs = [1.0] * num_steps
        ref.scale_times = [1.0] * num_steps
        # explicit-timesteps entry: our stock linspace ladder + trailing 0
        ref.set_timesteps(timesteps=list(ours.timesteps) + [0])
        # identity scale_times: the sigma-snap must be a no-op
        np.testing.assert_array_equal(ours.timesteps, ref.timesteps.numpy())
        np.testing.assert_allclose(
            ours.sigmas, ref.sigmas.numpy(), rtol=1e-6
        )

        x_ref = torch.from_numpy(noise0.copy())
        ref_traj = []
        for i, t in enumerate(ref.timesteps):
            eps = torch.from_numpy(eps_fn(x_ref.numpy(), i))
            x_ref = ref.step(eps, int(t), x_ref, return_dict=False)[0]
            ref_traj.append(x_ref.numpy().copy())

        x = jnp.asarray(noise0)
        for i in range(num_steps):
            eps = jnp.asarray(eps_fn(np.asarray(x), i))
            x = ours.step(i, x, eps)
            # rtol 3e-4: we compute lambdas/coefficients in float64 where
            # the reference stays torch-float32; at order 3 the h**2 terms
            # amplify that to ~2e-4 rel on late steps (formula errors show
            # up at O(1) rel, far above this)
            np.testing.assert_allclose(
                np.asarray(x), ref_traj[i], rtol=3e-4, atol=1e-5,
                err_msg=f"{algorithm} o{order} n={num_steps} step {i}",
            )
