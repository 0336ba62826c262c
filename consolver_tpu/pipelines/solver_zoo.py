"""Training-free baseline solver zoo for the DDPM family.

TPU-native rebuild of the solvers the reference pulls from diffusers
(gen_ppo.py:118-169): multistep DPM-Solver ("dpmsolver", final sigma
sigma_min), UniPC, DEIS, iPNDM/PLMS, DDIM(-trailing for DMD2), and the AMED
plugin (learned integer schedules + time/grad scales,
diffusers_amed_plugin_dpmpp.py:27-437 with tables gen_ppo.py:24-52).

Design: every coefficient in these solvers depends only on the *static* step
index, so each solver precomputes numpy coefficient tables on the host and
the denoise loop is an UNROLLED traced python loop — warmup branches,
solver-order ramps and history management are static Python control flow
that traces to straight-line XLA (no dynamic control flow on device at all).
Formulas follow DPM-Solver (arXiv 2206.00927 / 2211.01095), UniPC
(arXiv 2302.04867), DEIS (arXiv 2204.13902) and PLMS (arXiv 2202.09778)
with the diffusers-0.26 default configurations the reference relies on.
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from consolver_tpu.core import schedules

# AMED-solver learned schedules printed by the AMED weights (gen_ppo.py:24-52).
AMED_SCHEDULES = {
    4: {
        "amed": [999, 694, 500, 110, 0],
        "grad_scale": [1.0, 0.991, 1.0, 0.9912, 1.0],
        "time_scale": [1.0, 1.0333, 1.0, 0.9861, 1.0],
    },
    6: {
        "amed": [999, 758, 666, 495, 333, 107, 0],
        "grad_scale": [1.0, 0.9924, 1.0, 0.9916, 1.0, 0.9906, 1.0],
        "time_scale": [1.0, 1.052, 1.0, 0.9998, 1.0, 0.9781, 1.0],
    },
    8: {
        "amed": [999, 831, 749, 623, 500, 394, 250, 88, 0],
        "grad_scale": [1.0, 0.9976, 1.0, 0.991, 1.0, 0.9907, 1.0, 0.9905, 1.0],
        "time_scale": [1.0, 1.0257, 1.0, 0.9989, 1.0, 1.0022, 1.0, 0.9747, 1.0],
    },
    10: {
        "amed": [999, 885, 799, 705, 599, 492, 400, 329, 200, 73, 0],
        "grad_scale": [1.0, 0.9974, 1.0, 0.9904, 1.0, 0.991, 1.0, 0.9905, 1.0, 0.9904, 1.0],
        "time_scale": [1.0, 0.9872, 1.0, 1.0152, 1.0, 1.0186, 1.0, 0.9934, 1.0, 0.9731, 1.0],
    },
    14: {
        "amed": [999, 924, 856, 790, 714, 623, 571, 494, 428, 374, 285, 241, 143, 55, 0],
        "grad_scale": [1.0, 0.9922, 1.0, 0.9909, 1.0, 0.9914, 1.0, 0.9908, 1.0, 0.9904,
                       1.0, 0.9903, 1.0, 0.9904, 1.0],
        "time_scale": [1.0, 0.9835, 1.0, 1.0293, 1.0, 1.0216, 1.0, 1.0241, 1.0, 1.0021,
                       1.0, 0.9844, 1.0, 0.9714, 1.0],
    },
}


def _all_sigmas(schedule: schedules.DiffusionSchedule) -> np.ndarray:
    """Karras-style sigma table sigma_i = sqrt((1-abar_i)/abar_i), float64."""
    abar = schedule.alphas_cumprod.astype(np.float64)
    return np.sqrt((1 - abar) / abar)


def _alpha_sigma(sigma: np.ndarray):
    """sigma (table value) -> (alpha_t, sigma_t) with alpha_t^2+sigma_t^2=1."""
    alpha_t = 1.0 / np.sqrt(1.0 + sigma**2)
    return alpha_t, sigma * alpha_t


def _linspace_timesteps(num_train: int, num_steps: int) -> np.ndarray:
    """diffusers multistep-scheduler 'linspace' spacing:
    linspace(0, T-1, S+1).round()[::-1][:-1]."""
    return (
        np.linspace(0, num_train - 1, num_steps + 1)
        .round()[::-1][:-1]
        .copy()
        .astype(np.int64)
    )


def _sigma_ladder(
    schedule: schedules.DiffusionSchedule,
    timesteps: np.ndarray,
    final_sigmas_type: str,
) -> np.ndarray:
    table = _all_sigmas(schedule)
    sig = table[timesteps]
    if final_sigmas_type == "sigma_min":
        last = table[0]
    elif final_sigmas_type == "zero":
        last = 0.0
    else:
        raise ValueError(final_sigmas_type)
    return np.concatenate([sig, [last]])


class BaselineSolver:
    """Interface: ``timesteps`` (ints fed to the denoiser) and ``step(i, x,
    eps)`` called once per entry with the CFG-combined epsilon prediction.
    Implementations keep python-level history lists (traced arrays) —
    usable only inside an unrolled traced loop."""

    timesteps: np.ndarray

    def reset(self):
        raise NotImplementedError

    def step(self, i: int, x: jax.Array, eps: jax.Array) -> jax.Array:
        raise NotImplementedError


# ---------------------------------------------------------------------------
# Multistep DPM-Solver (orders 1-2, 'dpmsolver' eps-space or 'dpmsolver++'
# x0-space, midpoint) — diffusers DPMSolverMultistepScheduler semantics.
# ---------------------------------------------------------------------------


class DpmMultistep(BaselineSolver):
    def __init__(
        self,
        schedule: schedules.DiffusionSchedule,
        num_steps: int,
        algorithm: str = "dpmsolver",
        solver_order: int = 2,
        final_sigmas_type: str = "sigma_min",
        lower_order_final: bool = True,
        custom_timesteps: Optional[Sequence[int]] = None,
        custom_sigmas: Optional[np.ndarray] = None,
        grad_scales: Optional[Sequence[float]] = None,
        noise_key: Optional[jax.Array] = None,
    ):
        # sde-* variants follow the AMED plugin's stochastic updates
        # (diffusers_amed_plugin_dpmpp.py:124-137,230-261); they need a
        # jax.random key for the per-step variance noise.
        assert algorithm in (
            "dpmsolver", "dpmsolver++", "sde-dpmsolver", "sde-dpmsolver++"
        )
        if algorithm.startswith("sde-") and noise_key is None:
            raise ValueError(f"{algorithm} requires noise_key")
        self.noise_key = noise_key
        self.algorithm = algorithm
        self.solver_order = solver_order
        self.num_steps = num_steps
        if custom_timesteps is not None:
            self.timesteps = np.asarray(custom_timesteps, np.int64)
            self.sigmas = np.asarray(custom_sigmas, np.float64)
        else:
            self.timesteps = _linspace_timesteps(
                schedule.num_train_timesteps, num_steps
            )
            self.sigmas = _sigma_ladder(schedule, self.timesteps, final_sigmas_type)
        self.lower_order_final = lower_order_final
        self.final_sigmas_type = final_sigmas_type
        self.grad_scales = (
            list(grad_scales) if grad_scales is not None else [1.0] * len(self.timesteps)
        )
        self.reset()

    def reset(self):
        self.hist: List[jax.Array] = []
        self.lower_order_nums = 0

    def _convert(self, i: int, x, eps):
        """eps -> the solver's prediction space (x0 for the ++ variants)."""
        if self.algorithm in ("dpmsolver", "sde-dpmsolver"):
            return eps
        alpha_t, sigma_t = _alpha_sigma(self.sigmas[i])
        return (x - float(sigma_t) * eps) / float(alpha_t)

    def _noise(self, i: int, shape, dtype):
        return jax.random.normal(
            jax.random.fold_in(self.noise_key, i), shape, dtype
        )

    def _lam(self, i: int) -> float:
        alpha_t, sigma_t = _alpha_sigma(self.sigmas[i])
        return float(np.log(alpha_t) - np.log(sigma_t))

    def step(self, i: int, x, eps):
        n = len(self.timesteps)
        lower_order_final = (i == n - 1) and (
            (self.lower_order_final and n < 15) or self.final_sigmas_type == "zero"
        )
        lower_order_second = (i == n - 2) and self.lower_order_final and n < 15

        m = self._convert(i, x, eps)
        self.hist = (self.hist + [m])[-self.solver_order :]
        scale = float(self.grad_scales[i])

        alpha_t, sigma_t = _alpha_sigma(self.sigmas[i + 1])
        alpha_s0, sigma_s0 = _alpha_sigma(self.sigmas[i])
        lam_t, lam_s0 = self._lam(i + 1), self._lam(i)
        h = lam_t - lam_s0

        first = (
            self.solver_order == 1 or self.lower_order_nums < 1 or lower_order_final
        )
        second = self.solver_order == 2 or self.lower_order_nums < 2 or lower_order_second

        if first:
            m0 = self.hist[-1]
            if self.algorithm == "dpmsolver++":
                x = float(sigma_t / sigma_s0) * x - scale * float(
                    alpha_t * (math.exp(-h) - 1.0)
                ) * m0
            elif self.algorithm == "dpmsolver":
                x = float(alpha_t / alpha_s0) * x - scale * float(
                    sigma_t * (math.exp(h) - 1.0)
                ) * m0
            elif self.algorithm == "sde-dpmsolver++":
                noise = self._noise(i, x.shape, x.dtype)
                x = (
                    float(sigma_t / sigma_s0 * math.exp(-h)) * x
                    + scale * float(alpha_t * (1 - math.exp(-2.0 * h))) * m0
                    + float(sigma_t * math.sqrt(1.0 - math.exp(-2 * h))) * noise
                )
            else:  # sde-dpmsolver
                noise = self._noise(i, x.shape, x.dtype)
                x = (
                    float(alpha_t / alpha_s0) * x
                    - scale * 2.0 * float(sigma_t * (math.exp(h) - 1.0)) * m0
                    + float(sigma_t * math.sqrt(math.exp(2 * h) - 1.0)) * noise
                )
        elif second:
            lam_s1 = self._lam(i - 1)
            h_0 = lam_s0 - lam_s1
            r0 = h_0 / h
            m0, m1 = self.hist[-1], self.hist[-2]
            d0 = m0
            d1 = (m0 - m1) / float(r0)
            if self.algorithm == "dpmsolver++":  # midpoint
                c = float(alpha_t * (math.exp(-h) - 1.0))
                x = float(sigma_t / sigma_s0) * x - scale * c * d0 - scale * 0.5 * c * d1
            elif self.algorithm == "dpmsolver":  # midpoint
                c = float(sigma_t * (math.exp(h) - 1.0))
                x = float(alpha_t / alpha_s0) * x - scale * c * d0 - scale * 0.5 * c * d1
            elif self.algorithm == "sde-dpmsolver++":  # midpoint
                noise = self._noise(i, x.shape, x.dtype)
                c = float(alpha_t * (1 - math.exp(-2.0 * h)))
                x = (
                    float(sigma_t / sigma_s0 * math.exp(-h)) * x
                    + scale * c * d0
                    + scale * 0.5 * c * d1
                    + float(sigma_t * math.sqrt(1.0 - math.exp(-2 * h))) * noise
                )
            else:  # sde-dpmsolver midpoint
                noise = self._noise(i, x.shape, x.dtype)
                c = float(sigma_t * (math.exp(h) - 1.0))
                x = (
                    float(alpha_t / alpha_s0) * x
                    - scale * 2.0 * c * d0
                    - scale * c * d1
                    + float(sigma_t * math.sqrt(math.exp(2 * h) - 1.0)) * noise
                )
        else:  # third order
            if self.algorithm.startswith("sde-"):
                raise NotImplementedError(
                    "sde variants support solver_order <= 2 (as in the plugin)"
                )
            lam_s1, lam_s2 = self._lam(i - 1), self._lam(i - 2)
            h_0, h_1 = lam_s0 - lam_s1, lam_s1 - lam_s2
            r0, r1 = h_0 / h, h_1 / h
            m0, m1, m2 = self.hist[-1], self.hist[-2], self.hist[-3]
            d1_0 = (m0 - m1) / float(r0)
            d1_1 = (m1 - m2) / float(r1)
            d1 = d1_0 + float(r0 / (r0 + r1)) * (d1_0 - d1_1)
            d2 = (d1_0 - d1_1) / float(r0 + r1)
            if self.algorithm == "dpmsolver++":
                x = (
                    float(sigma_t / sigma_s0) * x
                    - scale * float(alpha_t * (math.exp(-h) - 1.0)) * m0
                    + scale * float(alpha_t * ((math.exp(-h) - 1.0) / h + 1.0)) * d1
                    - scale
                    * float(alpha_t * ((math.exp(-h) - 1.0 + h) / h**2 - 0.5))
                    * d2
                )
            else:
                x = (
                    float(alpha_t / alpha_s0) * x
                    - scale * float(sigma_t * (math.exp(h) - 1.0)) * m0
                    - scale * float(sigma_t * ((math.exp(h) - 1.0) / h - 1.0)) * d1
                    - scale
                    * float(sigma_t * ((math.exp(h) - 1.0 - h) / h**2 - 0.5))
                    * d2
                )
        if self.lower_order_nums < self.solver_order:
            self.lower_order_nums += 1
        return x


def amed_solver(schedule: schedules.DiffusionSchedule, num_steps: int) -> DpmMultistep:
    """AMED plugin: dpmsolver++ over the learned integer schedule with the
    time-scale sigma-snap (diffusers_amed_plugin_dpmpp.py:50-59) and per-step
    grad scales threaded into the updates (:417-423)."""
    if num_steps not in AMED_SCHEDULES:
        raise ValueError(
            f"AMED schedule only published for {sorted(AMED_SCHEDULES)} steps"
        )
    sched_tbl = AMED_SCHEDULES[num_steps]
    ts = list(sched_tbl["amed"])
    table = _all_sigmas(schedule)
    sigmas = table[np.asarray(ts)]
    timesteps = np.asarray(ts[:-1], np.int64)  # drop trailing 0
    # snap odd-indexed sigmas scaled by time_scale back to the nearest table
    # sigma between the neighbors, and remap the timestep (:54-59)
    time_scale = sched_tbl["time_scale"]
    for i in range(len(time_scale)):
        if i % 2 == 1:
            target = sigmas[i] * time_scale[i]
            lo, hi = ts[i + 1] + 1, ts[i - 1]
            source = table[lo:hi]
            timesteps[i] = lo + int(np.argmin(np.abs(source - target)))
    return DpmMultistep(
        schedule,
        num_steps,
        algorithm="dpmsolver++",
        custom_timesteps=timesteps,
        custom_sigmas=sigmas,
        grad_scales=sched_tbl["grad_scale"],
    )


# ---------------------------------------------------------------------------
# DEIS (logrho, order 2, eps space) — diffusers DEISMultistepScheduler.
# ---------------------------------------------------------------------------


class Deis(BaselineSolver):
    def __init__(
        self,
        schedule: schedules.DiffusionSchedule,
        num_steps: int,
        solver_order: int = 2,
        lower_order_final: bool = True,
    ):
        self.num_steps = num_steps
        self.solver_order = solver_order
        self.lower_order_final = lower_order_final
        self.timesteps = _linspace_timesteps(schedule.num_train_timesteps, num_steps)
        self.sigmas = _sigma_ladder(schedule, self.timesteps, "sigma_min")
        self.reset()

    def reset(self):
        self.hist: List[jax.Array] = []
        self.lower_order_nums = 0

    def step(self, i: int, x, eps):
        n = len(self.timesteps)
        lower_order_final = (i == n - 1) and self.lower_order_final and n < 15
        lower_order_second = (i == n - 2) and self.lower_order_final and n < 15

        # DEIS keeps epsilon-space history (x0-roundtrip is identity here)
        self.hist = (self.hist + [eps])[-self.solver_order :]

        alpha_t, sigma_t = _alpha_sigma(self.sigmas[i + 1])
        alpha_s0, sigma_s0 = _alpha_sigma(self.sigmas[i])

        first = (
            self.solver_order == 1 or self.lower_order_nums < 1 or lower_order_final
        )
        second = self.solver_order == 2 or self.lower_order_nums < 2 or lower_order_second

        if first:
            lam_t = float(np.log(alpha_t) - np.log(sigma_t))
            lam_s = float(np.log(alpha_s0) - np.log(sigma_s0))
            h = lam_t - lam_s
            x = float(alpha_t / alpha_s0) * x - float(
                sigma_t * (math.exp(h) - 1.0)
            ) * self.hist[-1]
        elif second:
            rho_t = float(sigma_t / alpha_t)
            rho_s0 = float(sigma_s0 / alpha_s0)
            a1, s1 = _alpha_sigma(self.sigmas[i - 1])
            rho_s1 = float(s1 / a1)

            def ind_fn(t, b, c):
                # Integral of the log-Lagrange basis (DEIS 'logrho'):
                # Integrate[(log(t)-log(c))/(log(b)-log(c)), t]
                return t * (-math.log(c) + math.log(t) - 1.0) / (
                    math.log(b) - math.log(c)
                )

            coef1 = ind_fn(rho_t, rho_s0, rho_s1) - ind_fn(rho_s0, rho_s0, rho_s1)
            coef2 = ind_fn(rho_t, rho_s1, rho_s0) - ind_fn(rho_s0, rho_s1, rho_s0)
            m0, m1 = self.hist[-1], self.hist[-2]
            x = float(alpha_t) * (
                x / float(alpha_s0) + float(coef1) * m0 + float(coef2) * m1
            )
        else:
            raise NotImplementedError("DEIS third order not needed (order<=2)")
        if self.lower_order_nums < self.solver_order:
            self.lower_order_nums += 1
        return x


# ---------------------------------------------------------------------------
# UniPC (bh2, predict_x0, order 2, with UniC corrector) — diffusers
# UniPCMultistepScheduler semantics (arXiv 2302.04867).
# ---------------------------------------------------------------------------


class UniPC(BaselineSolver):
    def __init__(
        self,
        schedule: schedules.DiffusionSchedule,
        num_steps: int,
        solver_order: int = 2,
        lower_order_final: bool = True,
    ):
        self.num_steps = num_steps
        self.solver_order = solver_order
        self.lower_order_final = lower_order_final
        self.timesteps = _linspace_timesteps(schedule.num_train_timesteps, num_steps)
        self.sigmas = _sigma_ladder(schedule, self.timesteps, "sigma_min")
        self.reset()

    def reset(self):
        self.hist: List[jax.Array] = []
        self.last_x = None
        self.lower_order_nums = 0
        self.last_order = None

    def _as(self, idx: int):
        return _alpha_sigma(self.sigmas[idx])

    def _x0(self, idx: int, x, eps):
        alpha_t, sigma_t = self._as(idx)
        return (x - float(sigma_t) * eps) / float(alpha_t)

    def _bh_coeffs(self, idx_t: int, idx_s0: int, hist_idx: List[int], order: int):
        """Static rks / R / b of the B(h) expansion at the transition
        s0 -> t, with prior nodes hist_idx (earlier steps)."""
        alpha_t, sigma_t = self._as(idx_t)
        alpha_s0, sigma_s0 = self._as(idx_s0)
        lam = lambda a, s: math.log(a) - math.log(s)
        lam_t, lam_s0 = lam(alpha_t, sigma_t), lam(alpha_s0, sigma_s0)
        h = lam_t - lam_s0
        rks = []
        for si in hist_idx:
            a, s = self._as(si)
            rks.append((lam(a, s) - lam_s0) / h)
        rks.append(1.0)
        rks = np.asarray(rks, np.float64)

        hh = -h  # predict_x0
        h_phi_1 = math.expm1(hh)
        h_phi_k = h_phi_1 / hh - 1
        b_h = math.expm1(hh)  # bh2
        R, b = [], []
        factorial_i = 1.0
        for i in range(1, order + 1):
            R.append(rks ** (i - 1))
            b.append(h_phi_k * factorial_i / b_h)
            factorial_i *= i + 1
            h_phi_k = h_phi_k / hh - 1 / factorial_i
        return (
            float(alpha_t), float(sigma_t), float(sigma_s0), float(h_phi_1),
            float(b_h), rks, np.stack(R), np.asarray(b, np.float64),
        )

    def step(self, i: int, x, eps):
        n = len(self.timesteps)
        m_t = self._x0(i, x, eps)

        # --- corrector (UniC) on the transition just taken ---
        if i > 0 and self.last_x is not None:
            order = self.last_order
            hist_idx = [i - 1 - k for k in range(1, order)]
            (alpha_t, sigma_t, sigma_s0, h_phi_1, b_h, rks, R, b) = self._bh_coeffs(
                i, i - 1, hist_idx, order
            )
            m0 = self.hist[-1]
            d1s = [
                (self.hist[-(k + 2)] - m0) / float(rks[k]) for k in range(order - 1)
            ]
            if order == 1:
                rhos_c = np.asarray([0.5])
            else:
                rhos_c = np.linalg.solve(R, b)
            x_t_ = float(sigma_t / sigma_s0) * self.last_x - float(
                alpha_t * h_phi_1
            ) * m0
            corr = sum(float(rhos_c[k]) * d1s[k] for k in range(order - 1))
            d1_t = m_t - m0
            x = x_t_ - float(alpha_t * b_h) * (corr + float(rhos_c[-1]) * d1_t)

        # diffusers UniPCMultistepScheduler.step converts the model output
        # ONCE, with the pre-corrector sample, and stores THAT conversion in
        # model_outputs (convert_model_output runs before the UniC update
        # reassigns `sample`); the corrected x only feeds the predictor.
        self.hist = (self.hist + [m_t])[-self.solver_order :]

        # --- predictor (UniP) ---
        if self.lower_order_final:
            this_order = min(self.solver_order, n - i)
        else:
            this_order = self.solver_order
        this_order = min(this_order, self.lower_order_nums + 1)
        self.last_order = this_order

        hist_idx = [i - k for k in range(1, this_order)]
        (alpha_t, sigma_t, sigma_s0, h_phi_1, b_h, rks, R, b) = self._bh_coeffs(
            i + 1, i, hist_idx, this_order
        )
        m0 = self.hist[-1]
        d1s = [
            (self.hist[-(k + 2)] - m0) / float(rks[k]) for k in range(this_order - 1)
        ]
        self.last_x = x
        x_t_ = float(sigma_t / sigma_s0) * x - float(alpha_t * h_phi_1) * m0
        if d1s:
            if this_order == 2:
                rhos_p = np.asarray([0.5])
            else:
                rhos_p = np.linalg.solve(R[:-1, :-1], b[:-1])
            pred = sum(float(rhos_p[k]) * d1s[k] for k in range(this_order - 1))
            x = x_t_ - float(alpha_t * b_h) * pred
        else:
            x = x_t_
        if self.lower_order_nums < self.solver_order:
            self.lower_order_nums += 1
        return x


# ---------------------------------------------------------------------------
# iPNDM / PLMS — diffusers PNDMScheduler with skip_prk_steps=True (the SD
# config), 'leading' spacing, steps_offset 1 (gen_ppo.py:144-148: "the
# diffusers implementation is exactly iPNDM").
# ---------------------------------------------------------------------------


class IPndm(BaselineSolver):
    def __init__(self, schedule: schedules.DiffusionSchedule, num_steps: int,
                 steps_offset: int = 1):
        self.schedule = schedule
        self.num_steps = num_steps
        self.step_ratio = schedule.num_train_timesteps // num_steps
        base = (np.arange(0, num_steps) * self.step_ratio).round().astype(np.int64)
        base = base + steps_offset  # ascending
        # plms schedule duplicates the second-to-last ascending entry
        # (diffusers PNDM: concat([ts[:-1], ts[-2:-1], ts[-1:]])[::-1])
        plms = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1].copy()
        self.timesteps = plms
        self.reset()

    def reset(self):
        self.ets: List[jax.Array] = []
        self.cur_sample = None
        self.counter = 0

    def _prev_sample(self, sample, t: int, t_prev: int, model_output):
        abar = self.schedule.alphas_cumprod
        a_t = float(abar[t])
        a_prev = float(abar[t_prev]) if t_prev >= 0 else float(
            self.schedule.final_alpha_cumprod
        )
        # PNDM's closed-form x_{t-1} (equivalent formulation of the DDIM
        # x0-form update used at PPOScheduler._get_prev_sample)
        x0 = (sample - (1 - a_t) ** 0.5 * model_output) / a_t**0.5
        return a_prev**0.5 * x0 + (1 - a_prev) ** 0.5 * model_output

    def step(self, i: int, x, eps):
        t = int(self.timesteps[i])
        if self.counter != 1:
            self.ets = self.ets[-3:]
            self.ets.append(eps)
            t_prev = t - self.step_ratio
        else:
            t_prev = t
            t = t + self.step_ratio

        if len(self.ets) == 1 and self.counter == 0:
            model_output = eps
            self.cur_sample = x
        elif len(self.ets) == 1 and self.counter == 1:
            model_output = (eps + self.ets[-1]) / 2
            x = self.cur_sample
            self.cur_sample = None
        elif len(self.ets) == 2:
            model_output = (3 * self.ets[-1] - self.ets[-2]) / 2
        elif len(self.ets) == 3:
            model_output = (
                23 * self.ets[-1] - 16 * self.ets[-2] + 5 * self.ets[-3]
            ) / 12
        else:
            model_output = (1 / 24) * (
                55 * self.ets[-1]
                - 59 * self.ets[-2]
                + 37 * self.ets[-3]
                - 9 * self.ets[-4]
            )
        self.counter += 1
        return self._prev_sample(x, t, t_prev, model_output)


# ---------------------------------------------------------------------------
# DDIM (incl. trailing spacing for DMD2 distilled weights, gen_ppo.py:164-169)
# ---------------------------------------------------------------------------


class Ddim(BaselineSolver):
    def __init__(
        self,
        schedule: schedules.DiffusionSchedule,
        num_steps: int,
        timestep_spacing: str = "leading",
        steps_offset: int = 1,
        eta: float = 0.0,
        noise_key: Optional[jax.Array] = None,
    ):
        """eta > 0 enables stochastic DDIM (the pipeline's eta parameter,
        gen_ppo.py generate_batch_images eta arg): per-step variance
        sigma_t = eta * sqrt((1-a_prev)/(1-a_t)) * sqrt(1 - a_t/a_prev)."""
        if eta > 0 and noise_key is None:
            raise ValueError("eta > 0 requires noise_key")
        self.schedule = schedule
        self.eta = eta
        self.noise_key = noise_key
        self.timesteps = schedules.spaced_timesteps(
            schedule.num_train_timesteps, num_steps, timestep_spacing, steps_offset
        )
        self.step_ratio = schedule.num_train_timesteps // num_steps
        self.reset()

    def reset(self):
        pass

    def step(self, i: int, x, eps):
        t = int(self.timesteps[i])
        t_prev = t - self.step_ratio
        abar = self.schedule.alphas_cumprod
        a_t = float(abar[t])
        a_prev = (
            float(abar[t_prev]) if t_prev >= 0 else float(self.schedule.final_alpha_cumprod)
        )
        x0 = (x - (1 - a_t) ** 0.5 * eps) / a_t**0.5
        if self.eta <= 0:
            return a_prev**0.5 * x0 + (1 - a_prev) ** 0.5 * eps
        sigma = (
            self.eta
            * math.sqrt((1 - a_prev) / (1 - a_t))
            * math.sqrt(1 - a_t / a_prev)
        )
        noise = jax.random.normal(
            jax.random.fold_in(self.noise_key, i), x.shape, x.dtype
        )
        return (
            a_prev**0.5 * x0
            + math.sqrt(max(1 - a_prev - sigma**2, 0.0)) * eps
            + sigma * noise
        )


# ---------------------------------------------------------------------------
# Builder registry + unrolled denoise loop
# ---------------------------------------------------------------------------

SOLVERS = (
    "ddim", "ipndm", "unipc", "deis", "multistep-dpm", "amed", "dmd2",
    "sde-dpmsolver", "sde-dpmsolver++",
)


def make_solver(
    name: str,
    schedule: schedules.DiffusionSchedule,
    num_steps: int,
    noise_key: Optional[jax.Array] = None,
    eta: float = 0.0,
) -> BaselineSolver:
    """Instantiate a zoo solver by the reference's names (gen_ppo.py:118-169).
    The ``sde-*`` stochastic variants (the AMED plugin's algorithm_type
    options, diffusers_amed_plugin_dpmpp.py:124-137) need ``noise_key``, as
    do ddim/dmd2 with ``eta > 0`` (the pipeline call's eta parameter)."""
    if name == "ddim":
        return Ddim(schedule, num_steps, eta=eta, noise_key=noise_key)
    if name == "dmd2":  # DDIM-trailing; pair with DMD2-distilled UNet weights
        return Ddim(schedule, num_steps, timestep_spacing="trailing",
                    steps_offset=0, eta=eta, noise_key=noise_key)
    if eta > 0:
        raise ValueError(f"eta only applies to ddim/dmd2, not {name!r}")
    if name == "ipndm":
        return IPndm(schedule, num_steps)
    if name == "unipc":
        return UniPC(schedule, num_steps)
    if name == "deis":
        return Deis(schedule, num_steps)
    if name == "multistep-dpm":
        return DpmMultistep(
            schedule, num_steps, algorithm="dpmsolver", final_sigmas_type="sigma_min"
        )
    if name in ("sde-dpmsolver", "sde-dpmsolver++"):
        return DpmMultistep(
            schedule, num_steps, algorithm=name,
            final_sigmas_type="sigma_min", noise_key=noise_key,
        )
    if name == "amed":
        return amed_solver(schedule, num_steps)
    raise ValueError(f"Unknown solver {name!r}; one of {SOLVERS}")


def make_baseline_denoise_fn(
    unet_apply: Callable[..., jax.Array],
    schedule: schedules.DiffusionSchedule,
    solver_name: str,
    num_inference_steps: int,
    guidance_scale: float = 3.0,
    eta: float = 0.0,
):
    """Jitted unrolled denoise loop for a zoo solver: (unet_params, noise,
    context, uncond_context) -> final latents.  CFG-batched like the learnable
    pipeline (pipelines/t2i.py).  Stochastic solvers — ``sde-*``, or
    ddim/dmd2 with ``eta > 0`` — take an extra leading ``key`` argument:
    (unet_params, key, noise, context, uncond).  The key is a TRACED
    argument (not a closure constant), so one compile serves every batch of
    a generation sweep."""
    do_cfg = guidance_scale > 1.0
    stochastic = solver_name.startswith("sde-") or eta > 0

    def _run(unet_params, noise, context, uncond_context, noise_key):
        solver = make_solver(
            solver_name, schedule, num_inference_steps, noise_key=noise_key,
            eta=eta,
        )
        x = jnp.asarray(noise, jnp.float32)
        batch = x.shape[0]
        if do_cfg:
            full_ctx = jnp.concatenate([uncond_context, context], axis=0)
        for i, t in enumerate(solver.timesteps):
            t_arr = jnp.full((batch,), int(t), jnp.int32)
            if do_cfg:
                eps_all = unet_apply(
                    unet_params,
                    jnp.concatenate([x, x], axis=0),
                    jnp.concatenate([t_arr, t_arr], axis=0),
                    full_ctx,
                )
                e_u, e_c = jnp.split(eps_all, 2, axis=0)
                eps = e_u + guidance_scale * (e_c - e_u)
            else:
                eps = unet_apply(unet_params, x, t_arr, context)
            x = solver.step(i, x, eps.astype(jnp.float32))
        return x

    if stochastic:
        @jax.jit
        def denoise(unet_params, key, noise, context, uncond_context):
            return _run(unet_params, noise, context, uncond_context, key)
    else:
        @jax.jit
        def denoise(unet_params, noise, context, uncond_context):
            return _run(unet_params, noise, context, uncond_context, None)

    return denoise
