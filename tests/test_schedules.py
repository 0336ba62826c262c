import numpy as np
import pytest

from consolver_tpu.core import schedules


class TestBetas:
    def test_linear(self):
        b = schedules.make_betas(1000, 0.0001, 0.02, "linear")
        assert b.shape == (1000,)
        assert np.isclose(b[0], 0.0001) and np.isclose(b[-1], 0.02)

    def test_scaled_linear_sd15(self):
        b = schedules.make_betas(1000, 0.00085, 0.012, "scaled_linear")
        assert np.isclose(b[0], 0.00085)
        assert np.isclose(b[-1], 0.012)
        # scaled_linear is linspace in sqrt-space
        sq = np.sqrt(b)
        diffs = np.diff(sq)
        assert np.allclose(diffs, diffs[0], atol=1e-7)

    def test_squaredcos(self):
        b = schedules.make_betas(100, beta_schedule="squaredcos_cap_v2")
        assert (b > 0).all() and (b <= 0.999).all()
        # cosine alpha-bar at t=0.5 via product
        # (valid while beta stays under the 0.999 cap — the final step is capped)
        abar = np.cumprod(1 - b)
        t = (np.arange(100) + 1) / 100
        expected = (np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2) / (
            np.cos(0.008 / 1.008 * np.pi / 2) ** 2
        )
        uncapped = b < 0.999
        assert np.allclose(abar[uncapped], expected[uncapped], rtol=1e-4)

    def test_final_alpha_cumprod(self):
        sched = schedules.DiffusionSchedule.sd15()
        assert np.isclose(sched.final_alpha_cumprod, sched.alphas_cumprod[0])


class TestSpacing:
    def test_trailing_sd15_8steps(self):
        # trailing: round(arange(1000, 0, -125)) - 1 = [999, 874, ..., 124]
        ts = schedules.spaced_timesteps(1000, 8, "trailing")
        assert ts.tolist() == [999, 874, 749, 624, 499, 374, 249, 124]

    def test_leading(self):
        ts = schedules.spaced_timesteps(1000, 8, "leading", steps_offset=1)
        assert ts.tolist() == [876, 751, 626, 501, 376, 251, 126, 1]

    def test_linspace(self):
        ts = schedules.spaced_timesteps(1000, 5, "linspace")
        assert ts[0] == 999 and ts[-1] == 0
        assert (np.diff(ts) < 0).all()

    def test_too_many_steps_raises(self):
        with pytest.raises(ValueError):
            schedules.spaced_timesteps(10, 11, "trailing")


class TestFlowMatch:
    def test_identity_shift(self):
        cfg = schedules.FlowMatchConfig(shift=1.0)
        sigmas, timesteps = schedules.fm_sigmas(cfg, 4)
        assert sigmas.shape == (5,)
        assert sigmas[-1] == 0.0
        assert np.isclose(sigmas[0], 1.0)
        assert np.allclose(timesteps, sigmas[:-1] * 1000)

    def test_static_shift_monotone(self):
        cfg = schedules.FlowMatchConfig(shift=3.0)
        sigmas, _ = schedules.fm_sigmas(cfg, 8)
        assert (np.diff(sigmas) < 0).all()
        # static shift fixes sigma=1 -> 1
        assert np.isclose(sigmas[0], 1.0, atol=1e-5)

    def test_dynamic_shift_requires_mu(self):
        cfg = schedules.FlowMatchConfig.flux()
        with pytest.raises(ValueError):
            schedules.fm_sigmas(cfg, 4)

    def test_dynamic_shift(self):
        cfg = schedules.FlowMatchConfig.flux()
        mu = schedules.calculate_flux_mu(image_seq_len=4096)
        sigmas, _ = schedules.fm_sigmas(cfg, 5, mu=mu)
        assert sigmas.shape == (6,)
        # exponential shift: sigma=1 maps to 1
        assert np.isclose(sigmas[0], 1.0, atol=1e-5)
        assert sigmas[-1] == 0.0

    def test_shift_formula(self):
        # exp-shift closed form: s(t) = e^mu / (e^mu + (1/t - 1))
        t = np.array([0.25, 0.5, 0.75])
        out = schedules.time_shift(1.0, 1.0, t, "exponential")
        expected = np.e / (np.e + (1 / t - 1))
        assert np.allclose(out, expected)

    def test_karras(self):
        s = schedules.convert_to_karras(np.array([1.0, 0.5, 0.002]), 5)
        assert s.shape == (5,)
        assert np.isclose(s[0], 1.0) and np.isclose(s[-1], 0.002)

    def test_shift_terminal(self):
        sig = np.linspace(1, 0.1, 5)
        out = schedules.stretch_shift_to_terminal(sig, 0.3)
        assert np.isclose(out[-1], 0.3)

    def test_flux_mu_endpoints(self):
        assert np.isclose(schedules.calculate_flux_mu(256), 0.5)
        assert np.isclose(schedules.calculate_flux_mu(4096), 1.15)


def test_invert_sigmas():
    """invert_sigmas flips the ladder and appends terminal 1 (the Mochi
    convention, scheduler_fmppo.py:233-238)."""
    cfg = schedules.FlowMatchConfig(shift=1.0, invert_sigmas=True)
    sigmas, timesteps = schedules.fm_sigmas(cfg, 4)
    assert sigmas[-1] == 1.0
    assert (np.diff(sigmas) > 0).all()
    np.testing.assert_allclose(timesteps, sigmas[:-1] * 1000)
