import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consolver_tpu.core import schedules, solver
from tests.reference_emulator import ListLMM, ddim_update_np


def _random_actions(rng, batch, order_dim, scaler_dim, mu_dim=0):
    a = rng.standard_normal((batch, order_dim + scaler_dim + mu_dim - 1)) * 0.5
    return a.astype(np.float32)


@pytest.mark.parametrize(
    "order_dim,scaler_dim", [(4, 0), (4, 2), (2, 0), (3, 1), (2, 2)]
)
def test_lmm_matches_list_emulator(order_dim, scaler_dim):
    """Ring-buffer solver == reference-style list implementation across a full
    trajectory including the warmup steps."""
    rng = np.random.default_rng(0)
    batch, shape = 3, (2, 4, 4)
    emulator = ListLMM(order_dim, scaler_dim)
    state = solver.init_state(batch, order_dim, shape)

    sample = rng.standard_normal((batch, *shape)).astype(np.float32)
    for step in range(order_dim + 3):
        eps = rng.standard_normal((batch, *shape)).astype(np.float32)
        actions = _random_actions(rng, batch, order_dim, scaler_dim)

        ref_eff, ref_sample, ref_masks = emulator.step(eps, sample, actions)
        state, eff, scaled_sample, masks = solver.lmm_combine_step(
            state, jnp.asarray(eps), jnp.asarray(actions), jnp.asarray(sample),
            order_dim, scaler_dim,
        )
        np.testing.assert_allclose(np.asarray(eff), ref_eff, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(scaled_sample), ref_sample, rtol=1e-5, atol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(masks), ref_masks)


def test_coefficients_sum_to_one():
    """After normalization the first num_ets coefficients sum to 1 for
    num_ets > 1 (set_default_coefficients property)."""
    rng = np.random.default_rng(1)
    order_dim = 4
    actions = jnp.asarray(rng.standard_normal((5, order_dim - 1)).astype(np.float32))
    for num_ets in range(2, order_dim + 1):
        p = solver.normalized_coefficients(actions, jnp.asarray(num_ets), order_dim)
        sums = np.asarray(jnp.sum(p[:, :num_ets], axis=1))
        np.testing.assert_allclose(sums, 1.0, rtol=1e-5)


def test_first_step_passthrough():
    """num_ets == 1 must return the raw model output, not p0 * output."""
    batch, shape = 2, (3, 3)
    state = solver.init_state(batch, 4, shape)
    eps = jnp.ones((batch, *shape)) * 2.5
    actions = jnp.full((batch, 3), 0.7)  # p0 would be 1.7 if applied
    state, eff, _, _ = solver.lmm_combine_step(
        state, eps, actions, jnp.zeros((batch, *shape)), 4, 0
    )
    np.testing.assert_allclose(np.asarray(eff), 2.5)


def test_push_ring_semantics():
    state = solver.init_state(1, 3, (1,))
    for v in [1.0, 2.0, 3.0, 4.0]:
        state = solver.push(state, jnp.full((1, 1), v))
    # Most recent first, capacity 3
    np.testing.assert_allclose(np.asarray(state.ets[0, :, 0]), [4.0, 3.0, 2.0])
    assert int(state.num_ets) == 3


def test_warmup_masks():
    # order_dim=4, action_dims=5 (scaler_dim=2): masks[:, num_ets-1:3] = 0
    m = solver.warmup_masks(jnp.asarray(1), 4, 5, 2)
    np.testing.assert_array_equal(np.asarray(m[0]), [0, 0, 0, 1, 1])
    m = solver.warmup_masks(jnp.asarray(3), 4, 5, 2)
    np.testing.assert_array_equal(np.asarray(m[0]), [1, 1, 0, 1, 1])
    m = solver.warmup_masks(jnp.asarray(4), 4, 5, 2)
    np.testing.assert_array_equal(np.asarray(m[0]), [1, 1, 1, 1, 1])


class TestDdimUpdate:
    def test_matches_numpy(self):
        rng = np.random.default_rng(2)
        sched = schedules.DiffusionSchedule.sd15()
        sample = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
        eps = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
        t, t_prev = 999, 874
        a_t, a_prev = solver.gather_alpha_prods(
            jnp.asarray(sched.alphas_cumprod), jnp.asarray(t), jnp.asarray(t_prev),
            sched.final_alpha_cumprod,
        )
        out = solver.ddim_update(jnp.asarray(sample), jnp.asarray(eps), a_t, a_prev)
        expected = ddim_update_np(
            sample, eps, sched.alphas_cumprod[t], sched.alphas_cumprod[t_prev]
        )
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)

    def test_final_step_fallback(self):
        sched = schedules.DiffusionSchedule.sd15()
        _, a_prev = solver.gather_alpha_prods(
            jnp.asarray(sched.alphas_cumprod), jnp.asarray(124), jnp.asarray(-1),
            sched.final_alpha_cumprod,
        )
        assert np.isclose(float(a_prev), sched.final_alpha_cumprod)

    def test_v_prediction(self):
        rng = np.random.default_rng(3)
        sched = schedules.DiffusionSchedule.sd15()
        sample = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
        v = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
        a_t = sched.alphas_cumprod[500]
        a_prev = sched.alphas_cumprod[400]
        out = solver.ddim_update(
            jnp.asarray(sample), jnp.asarray(v), jnp.asarray(a_t), jnp.asarray(a_prev),
            prediction_type="v_prediction",
        )
        expected = ddim_update_np(sample, v, a_t, a_prev, "v_prediction")
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)


def test_fm_euler_update():
    x = jnp.ones((2, 3))
    v = jnp.full((2, 3), 2.0)
    out = solver.fm_euler_update(x, v, jnp.asarray(-0.25))
    np.testing.assert_allclose(np.asarray(out), 0.5)


def test_add_noise():
    sched = schedules.DiffusionSchedule.sd15()
    x = jnp.ones((2, 1, 2, 2))
    n = jnp.zeros((2, 1, 2, 2))
    ts = jnp.asarray([0, 999])
    out = solver.add_noise(jnp.asarray(sched.alphas_cumprod), x, n, ts)
    np.testing.assert_allclose(
        np.asarray(out[0]), sched.alphas_cumprod[0] ** 0.5, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out[1]), sched.alphas_cumprod[999] ** 0.5, rtol=1e-6
    )


def test_fm_scale_noise():
    x = jnp.ones((2, 3))
    n = jnp.zeros((2, 3))
    out = solver.fm_scale_noise(jnp.asarray([0.25, 1.0]), x, n)
    np.testing.assert_allclose(np.asarray(out[0]), 0.75)
    np.testing.assert_allclose(np.asarray(out[1]), 0.0)


def test_lmm_step_jits_and_scans():
    """The combine step must be trace-compatible: run it inside lax.scan."""
    order_dim, scaler_dim, batch, shape = 4, 2, 2, (1, 4, 4)
    state = solver.init_state(batch, order_dim, shape)
    sample0 = jnp.zeros((batch, *shape))
    eps_seq = jnp.asarray(
        np.random.default_rng(4).standard_normal((6, batch, *shape)), jnp.float32
    )
    actions_seq = jnp.zeros((6, batch, order_dim + scaler_dim - 1))

    def body(carry, xs):
        state, sample = carry
        eps, actions = xs
        state, eff, sample, masks = solver.lmm_combine_step(
            state, eps, actions, sample, order_dim, scaler_dim
        )
        return (state, sample + eff), masks

    (state, _), masks = jax.jit(
        lambda c, xs: jax.lax.scan(body, c, xs)
    )((state, sample0), (eps_seq, actions_seq))
    assert int(state.num_ets) == order_dim
    assert masks.shape == (6, batch, order_dim + scaler_dim - 1)


def test_fm_per_token_update():
    """Per-token FM stepping: each token pairs with the largest ladder sigma
    below its own, and dt = current - next, the reference's positive
    Mochi-ladder sign (scheduler_fmppo.py:363-376,429)."""
    ladder = jnp.asarray([1.0, 0.75, 0.5, 0.25, 0.0])
    sample = jnp.zeros((1, 3, 2))
    velocity = jnp.ones((1, 3, 2))
    # tokens at t=1000, 600, 250 -> sigmas 1.0, 0.6, 0.25
    tts = jnp.asarray([[1000.0, 600.0, 250.0]])
    out = solver.fm_per_token_update(sample, velocity, tts, ladder)
    # dt per token: 1.0-0.75=0.25; 0.6-0.5=0.1; 0.25-0.0=0.25
    np.testing.assert_allclose(
        np.asarray(out[0, :, 0]), [0.25, 0.1, 0.25], atol=1e-6
    )
