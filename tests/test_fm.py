import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consolver_tpu.core import schedules
from consolver_tpu.pipelines import fm
from consolver_tpu.policy import FactorNet, FactorNetConfig

CFG = schedules.FlowMatchConfig(shift=1.0)


def const_velocity(v0):
    def fn(params, x, t, cond):
        return jnp.broadcast_to(v0, x.shape)

    return fn


class TestFmBaselines:
    def test_euler_exact_for_const_velocity(self):
        """x(sigma) = x0 + (sigma-sigma0) v is exact for constant v; Euler
        must land on it regardless of step count."""
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))
        v0 = jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))
        for steps in [3, 5, 9]:
            denoise = fm.make_fm_baseline_denoise_fn(
                const_velocity(v0), CFG, "euler", steps
            )
            out = denoise(None, x0, None)
            solver = fm.FmBaseline(CFG, steps, "euler")
            total_dt = solver.sigmas[-1] - solver.sigmas[0]
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(x0 + total_dt * v0), rtol=1e-4, atol=1e-5
            )

    @pytest.mark.parametrize("solver_type", fm.FM_SOLVERS)
    def test_all_types_run(self, solver_type):
        v0 = jnp.ones((1, 4))
        denoise = fm.make_fm_baseline_denoise_fn(
            const_velocity(v0), CFG, solver_type, 5
        )
        out = denoise(None, jnp.zeros((1, 4)), None)
        assert bool(jnp.isfinite(out).all())

    def test_multistep_dpm_const_v_exact(self):
        """With constant velocity the multistep correction preserves
        exactness: endpoint = x0 + (sigma_end - sigma_0) * v."""
        v0 = jnp.full((1, 4), 2.0)
        denoise = fm.make_fm_baseline_denoise_fn(
            const_velocity(v0), CFG, "dpm-solver-multistep", 5
        )
        out = denoise(None, jnp.zeros((1, 4)), None)
        solver = fm.FmBaseline(CFG, 5, "dpm-solver-multistep")
        expected = (solver.sigmas[-1] - solver.sigmas[0]) * 2.0
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4)

    def test_heun_improves_on_euler(self):
        """Quadratic-in-sigma velocity: heun (trapezoid over pairs) should
        beat euler at matched model-call budget."""

        def vel(params, x, t, cond):
            s = t / 1000.0
            return (s**2)[:, None] * jnp.ones_like(x)

        # analytic integral of s^2 from 1 to 0 = -1/3
        target = -1.0 / 3.0
        e_out = fm.make_fm_baseline_denoise_fn(vel, CFG, "euler", 6)(
            None, jnp.zeros((1, 1)), None
        )
        h_out = fm.make_fm_baseline_denoise_fn(vel, CFG, "heun", 6)(
            None, jnp.zeros((1, 1)), None
        )
        e_err = abs(float(e_out[0, 0]) - target)
        h_err = abs(float(h_out[0, 0]) - target)
        assert h_err < e_err, (h_err, e_err)


class TestFmPpo:
    def test_ddim_like_passthrough_equals_euler(self):
        """factor_net=None (order 1) must reduce the learnable FM scan to
        plain Euler."""
        rng = np.random.default_rng(1)
        v0 = jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))
        noise = jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))
        learn = fm.make_fm_denoise_fn(const_velocity(v0), CFG, None, 5)
        base = fm.make_fm_baseline_denoise_fn(const_velocity(v0), CFG, "euler", 5)
        out_l, traj = learn(None, None, jax.random.key(0), noise, None)
        out_b = base(None, noise, None)
        np.testing.assert_allclose(
            np.asarray(out_l), np.asarray(out_b), rtol=1e-5, atol=1e-6
        )
        assert traj.actions.shape == (2, 4, 1)

    def test_fmppo_production_config(self):
        """FLUX production config: order_dim=2, scaler_dim=0, mu_dim=0,
        11 actions, fm family, dynamic shift (edit_ppo/run_ppo.sh)."""
        fcfg = FactorNetConfig(
            order_dim=2, scaler_dim=0, mu_dim=0, num_actions=11, family="fm"
        )
        fnet = FactorNet(fcfg)
        fparams = fnet.init(jax.random.key(0))
        flux_cfg = schedules.FlowMatchConfig.flux()
        mu = schedules.calculate_flux_mu(1024)

        def vel(params, x, t, cond):
            return -x * 0.5

        denoise = fm.make_fm_denoise_fn(vel, flux_cfg, fnet, 5, mu=mu)
        noise = jax.random.normal(jax.random.key(1), (3, 16, 8))
        out, traj = denoise(None, fparams, jax.random.key(2), noise, None)
        assert out.shape == noise.shape
        assert bool(jnp.isfinite(out).all())
        assert traj.actions.shape == (3, 4, 1)
        # conds carry [sigma_t, sigma_next] of recorded steps
        sigmas, _ = schedules.fm_sigmas(flux_cfg, 5, mu=mu)
        np.testing.assert_allclose(
            np.asarray(traj.conds_x[0, :, 0]), sigmas[1:-1], rtol=1e-5
        )
        # masks: order_dim=2 => first recorded step already has full history
        np.testing.assert_array_equal(np.asarray(traj.masks), 1.0)

    def test_mu_dim_action_recorded_but_unused(self):
        """mu_dim adds an action dimension that is carried for PPO but does
        not affect the update (scheduler_fmppo.py:406-410)."""
        fcfg = FactorNetConfig(
            order_dim=2, scaler_dim=0, mu_dim=1, num_actions=11, family="fm"
        )
        fnet = FactorNet(fcfg)
        fparams = fnet.init(jax.random.key(0))

        def vel(params, x, t, cond):
            return -x

        denoise = fm.make_fm_denoise_fn(vel, CFG, fnet, 4)
        noise = jax.random.normal(jax.random.key(1), (1, 8))
        out, traj = denoise(None, fparams, jax.random.key(2), noise, None)
        assert traj.actions.shape == (1, 3, 2)  # order(1) + mu(1)
        assert bool(jnp.isfinite(out).all())


class TestPaddedFm:
    """make_padded_fm_denoise_fn: one compiled program for every step count
    in [1, max_steps] — the FM twin of t2i's padded rollout."""

    def test_padded_matches_per_count_on_valid_steps(self):
        fnet = FactorNet(FactorNetConfig(
            order_dim=2, scaler_dim=0, mu_dim=0, num_actions=11, family="fm"
        ))
        fparams = fnet.init(jax.random.key(0))

        def vel(params, x, t, cond):
            return -x * 0.3 + 0.01 * t[:, None]

        noise = jax.random.normal(jax.random.key(1), (2, 8))
        per_count = fm.make_fm_denoise_fn(vel, CFG, fnet, 3)
        padded = fm.make_padded_fm_denoise_fn(vel, CFG, fnet, max_steps=5)
        out_pc, traj_pc = per_count(None, fparams, jax.random.key(2), noise, None)
        ladder = fm.padded_fm_ladder(CFG, 3, 5)
        out_p, traj_p = padded(None, fparams, jax.random.key(2), noise, None,
                               *ladder)
        # identical RNG chain prefix -> identical actions -> identical output
        np.testing.assert_array_equal(np.asarray(out_pc), np.asarray(out_p))
        np.testing.assert_array_equal(
            np.asarray(traj_pc.actions), np.asarray(traj_p.actions[:, :2])
        )
        # pad rows flagged invalid with zeroed masks
        np.testing.assert_array_equal(np.asarray(traj_p.valid[:, :2]), 1.0)
        np.testing.assert_array_equal(np.asarray(traj_p.valid[:, 2:]), 0.0)
        np.testing.assert_array_equal(np.asarray(traj_p.masks[:, 2:]), 0.0)

    def test_padded_degenerate_equals_euler_baseline(self):
        """factor_net=None padded program == the Euler baseline zoo solver
        (how the edit trainer's padded BASELINE rollout works)."""
        rng = np.random.default_rng(3)
        v0 = jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))
        noise = jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))
        base = fm.make_fm_baseline_denoise_fn(const_velocity(v0), CFG, "euler", 4)
        padded = fm.make_padded_fm_denoise_fn(
            const_velocity(v0), CFG, None, max_steps=6
        )
        ladder = fm.padded_fm_ladder(CFG, 4, 6)
        out_p, _ = padded(None, None, jax.random.key(0), noise, None, *ladder)
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(base(None, noise, None)),
            rtol=1e-5, atol=1e-6,
        )


class TestPerTokenBranch:
    """make_fm_denoise_fn(per_token=True): the Mochi-style per-token
    timestep branch (scheduler_fmppo.py:363-371, VERDICT r2 item #10)."""

    def _setup(self, per_token):
        fnet = FactorNet(FactorNetConfig(
            order_dim=2, scaler_dim=0, mu_dim=0, num_actions=11, family="fm"
        ))
        fparams = fnet.init(jax.random.key(2))
        rng = np.random.default_rng(3)
        noise = jnp.asarray(rng.standard_normal((2, 6, 4)).astype(np.float32))

        def vel(params, x, t, cond):
            return jnp.sin(x) * 0.3 + 0.5

        fn = fm.make_fm_denoise_fn(vel, CFG, fnet, 4, per_token=per_token)
        return fn, fnet, fparams, noise

    def test_uniform_tokens_mirror_ladder_path(self):
        """All tokens starting at the ladder top take the same |dt| sequence
        as the plain ladder program but with the reference's mirrored sign
        (per-token dt = current - next, scheduler_fmppo.py:371 vs :376).
        With an x-independent velocity and the same per-step RNG chain the
        two programs' total updates are exact negatives."""
        fnet = FactorNet(FactorNetConfig(
            order_dim=2, scaler_dim=0, mu_dim=0, num_actions=11, family="fm"
        ))
        fparams = fnet.init(jax.random.key(2))
        rng = np.random.default_rng(3)
        noise = jnp.asarray(rng.standard_normal((2, 6, 4)).astype(np.float32))

        def vel(params, x, t, cond):  # x-independent
            return jnp.broadcast_to(t[:, None, None] * 1e-3 + 0.5, x.shape)

        fn_ladder = fm.make_fm_denoise_fn(vel, CFG, fnet, 4, per_token=False)
        fn_pt = fm.make_fm_denoise_fn(vel, CFG, fnet, 4, per_token=True)
        sigmas, _ = schedules.fm_sigmas(CFG, 4)
        ptts = jnp.full((2, 6), float(sigmas[0]) * CFG.num_train_timesteps)
        out_l, traj_l = fn_ladder(None, fparams, jax.random.key(7), noise, None)
        out_p, traj_p = fn_pt(None, fparams, jax.random.key(7), noise, None, ptts)
        np.testing.assert_allclose(
            np.asarray(out_p - noise), -np.asarray(out_l - noise),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(traj_l.actions), np.asarray(traj_p.actions), atol=1e-6
        )

    def test_tokens_integrate_independently(self):
        """Tokens seeded at different ladder rungs take different dt's; a
        token already at the terminal sigma stays fixed."""
        fn_pt, _, fparams, noise = self._setup(per_token=True)
        # make tokens 0 and 4 identical in BOTH state and start sigma, so
        # their whole integration must coincide
        noise = noise.at[:, 4].set(noise[:, 0])
        sigmas, _ = schedules.fm_sigmas(CFG, 4)
        n = CFG.num_train_timesteps
        ptts = jnp.asarray(np.tile(
            [float(sigmas[0]) * n, float(sigmas[1]) * n, float(sigmas[2]) * n,
             0.0, float(sigmas[0]) * n, float(sigmas[3]) * n],
            (2, 1),
        ), jnp.float32)
        out, _ = fn_pt(None, fparams, jax.random.key(8), noise, None, ptts)
        out = np.asarray(out)
        assert np.isfinite(out).all()
        # token 3 started at sigma 0 -> dt = 0 every step -> unchanged
        np.testing.assert_allclose(out[:, 3], np.asarray(noise)[:, 3], atol=1e-6)
        # identical tokens with identical start sigma -> identical updates
        np.testing.assert_allclose(out[:, 0], out[:, 4], rtol=1e-6)
        # a mid-ladder token differs from a top-ladder token
        assert not np.allclose(out[:, 0], out[:, 1])

    def test_ladder_program_unchanged_when_disabled(self):
        """per_token=False output is byte-identical to the default builder
        (the flag must not perturb the traced ladder program)."""
        fnet = FactorNet(FactorNetConfig(
            order_dim=2, scaler_dim=0, num_actions=11, family="fm"
        ))
        fparams = fnet.init(jax.random.key(4))
        rng = np.random.default_rng(5)
        noise = jnp.asarray(rng.standard_normal((1, 5, 4)).astype(np.float32))

        def vel(params, x, t, cond):
            return x * 0.1 + 1.0

        a = fm.make_fm_denoise_fn(vel, CFG, fnet, 3)
        b = fm.make_fm_denoise_fn(vel, CFG, fnet, 3, per_token=False)
        out_a, _ = a(None, fparams, jax.random.key(9), noise, None)
        out_b, _ = b(None, fparams, jax.random.key(9), noise, None)
        np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
