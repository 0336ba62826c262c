import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consolver_tpu.core import schedules
from consolver_tpu.pipelines.preview import PreviewSession
from consolver_tpu.pipelines.solver_zoo import DpmMultistep, UniPC
from consolver_tpu.pipelines.t2i import TextToImagePipeline
from consolver_tpu.policy import FactorNet, FactorNetConfig
from tests.test_pipeline import make_tiny_stack
from tests.test_solver_zoo import run_solver

SCHED = schedules.DiffusionSchedule.sd15()


@pytest.mark.slow
def test_preview_refine_workflow():
    (unet, unet_params), (te, te_params), (vae, vae_params) = make_tiny_stack()
    fcfg = FactorNetConfig(order_dim=4, scaler_dim=0, num_actions=11, family="sd")
    fnet = FactorNet(fcfg)
    pipe = TextToImagePipeline(
        unet, unet_params, te, te_params, vae, vae_params, SCHED,
        factor_net=fnet, factor_params=fnet.init(jax.random.key(0)),
    )
    session = PreviewSession(pipe, preview_steps=4, refine_steps=10)
    prompt_ids = jnp.ones((4,), jnp.int32)
    previews = session.preview(
        jax.random.key(1), prompt_ids, latent_hw=(8, 8), num_candidates=3
    )
    assert len(previews) == 3
    for p in previews:
        assert p.image.shape == (16, 16, 3)
        assert p.noise.shape == (8, 8, 4)
    # candidates differ (different noises)
    assert not np.allclose(np.asarray(previews[0].image), np.asarray(previews[1].image))

    refined = session.refine(previews[1])
    assert refined.shape == (16, 16, 3)
    assert bool(jnp.isfinite(refined).all())
    # refinement reuses the preview's exact noise: refining twice is identical
    refined2 = session.refine(previews[1])
    np.testing.assert_allclose(np.asarray(refined), np.asarray(refined2))


class TestOrder3Solvers:
    """solver_order=3 paths (diffusers supports them; production uses 2)."""

    def _const_check(self, solver):
        rng = np.random.default_rng(0)
        x0 = rng.standard_normal((1, 6)).astype(np.float32)
        e0 = rng.standard_normal((1, 6)).astype(np.float32)
        t0 = int(solver.timesteps[0])
        abar = SCHED.alphas_cumprod[t0]
        x = jnp.asarray(abar**0.5 * x0 + (1 - abar) ** 0.5 * e0)
        out = run_solver(solver, x, lambda x, t: jnp.asarray(e0))
        sigma = solver.sigmas[-1]
        a_end = 1 / np.sqrt(1 + sigma**2)
        expected = a_end * x0 + sigma * a_end * e0
        np.testing.assert_allclose(np.asarray(out), expected, rtol=5e-4, atol=5e-4)

    def test_dpm_order3_const_exact(self):
        self._const_check(
            DpmMultistep(SCHED, 10, algorithm="dpmsolver", solver_order=3,
                         final_sigmas_type="sigma_min")
        )

    def test_dpmpp_order3_const_exact(self):
        self._const_check(
            DpmMultistep(SCHED, 10, algorithm="dpmsolver++", solver_order=3,
                         final_sigmas_type="sigma_min")
        )

    def test_unipc_order3_const_exact(self):
        self._const_check(UniPC(SCHED, 10, solver_order=3))

    def test_order3_converges(self):
        def eps_model(x, t):
            abar = SCHED.alphas_cumprod[int(t)]
            return (x - abar**0.5 * jnp.tanh(x)) / (1 - abar) ** 0.5

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, 8)).astype(np.float32))
        from consolver_tpu.pipelines.solver_zoo import Ddim

        ref = np.asarray(run_solver(Ddim(SCHED, 400), x, eps_model))
        o3 = np.asarray(
            run_solver(
                DpmMultistep(SCHED, 16, algorithm="dpmsolver", solver_order=3,
                             final_sigmas_type="sigma_min"),
                x, eps_model,
            )
        )
        assert float(np.abs(o3 - ref).mean()) < 0.1
