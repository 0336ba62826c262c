import jax
import jax.numpy as jnp
import numpy as np

from consolver_tpu.policy.continuous import (
    ContinuousFactorNet,
    ContinuousFactorNetConfig,
)
from consolver_tpu.policy.mu_net import MuNet


class TestContinuous:
    def _net(self, **kw):
        cfg = ContinuousFactorNetConfig(order_dim=4, scaler_dim=0, family="sd", **kw)
        net = ContinuousFactorNet(cfg)
        return net, net.init(jax.random.key(0))

    def test_zero_init_mean(self):
        net, params = self._net()
        conds = {"x": jnp.asarray([[999.0, 874.0]])}
        mean, std = net._dist(params, conds)
        np.testing.assert_allclose(np.asarray(mean), 0.0)
        np.testing.assert_allclose(np.asarray(std), np.exp(-1.0), rtol=1e-5)

    def test_sample_within_bounds(self):
        net, params = self._net()
        conds = {"x": jnp.tile(jnp.asarray([[500.0, 400.0]]), (256, 1))}
        actions, dens = net.sample_action(params, jax.random.key(1), conds)
        lo, hi = np.asarray(net.low), np.asarray(net.high)
        assert (np.asarray(actions) >= lo[None] - 1e-6).all()
        assert (np.asarray(actions) <= hi[None] + 1e-6).all()
        assert (np.asarray(dens) > 0).all()

    def test_density_roundtrip_and_ppo_compat(self):
        """Densities from sampling == densities from re-evaluation at the
        stored (clipped) actions — INCLUDING clipped samples — so the PPO
        ratio is exactly 1 on the first update epoch."""
        net, params = self._net()
        conds = {"x": jnp.tile(jnp.asarray([[100.0, 50.0]]), (64, 1))}
        actions, dens = net.sample_action(params, jax.random.key(2), conds)
        dens2, entropy = net.get_action_probs(params, conds, actions)
        clipped = (
            (np.asarray(actions) <= np.asarray(net.low)[None] + 1e-6)
            | (np.asarray(actions) >= np.asarray(net.high)[None] - 1e-6)
        )
        assert clipped.any()  # the draw must exercise the clipped branch
        np.testing.assert_allclose(np.asarray(dens), np.asarray(dens2), rtol=1e-5)
        # analytic Gaussian entropy at std=e^-1
        expected = 0.5 * np.log(2 * np.pi * np.e * np.exp(-2.0))
        np.testing.assert_allclose(np.asarray(entropy), expected, rtol=1e-5)

    def test_ppo_update_works(self):
        """The continuous net slots into the existing PPO loss: rewarding
        large first coefficients shifts the mean up."""
        import optax
        from consolver_tpu.rl import ppo
        from consolver_tpu.rl.ppo import PPOConfig

        net, params = self._net()
        conds = {"x": jnp.tile(jnp.asarray([[500.0, 400.0]]), (128, 1))}
        pcfg = PPOConfig(learning_rate=5e-3, entropy_coef=0.0)
        optimizer = ppo.make_optimizer(pcfg)
        opt_state = optimizer.init(params)
        update = jax.jit(ppo.make_update_fn(net, optimizer, pcfg))

        key = jax.random.key(3)
        for step in range(20):
            key, sub = jax.random.split(key)
            actions, dens = net.sample_action(params, sub, conds)
            rewards = actions[:, 0]  # reward the raw first coefficient
            adv = ppo.group_advantages(rewards, scale=1.0).reshape(-1, 1)
            params, opt_state, _ = update(params, opt_state, conds, actions, dens, adv)
        mean, _ = net._dist(params, conds)
        assert float(mean[0, 0]) > 0.05


class TestMuNet:
    def test_sample_and_grid(self):
        net = MuNet()
        params = net.init(jax.random.key(0))
        x = jnp.ones((8, 1))
        actions, probs = net.sample_action(params, jax.random.key(1), x)
        grid = np.asarray(net.action_values)
        for a in np.asarray(actions):
            assert np.any(np.isclose(grid, a))
        p2, entropy = net.get_action_probs(params, x, actions)
        np.testing.assert_allclose(np.asarray(probs), np.asarray(p2), rtol=1e-5)
        assert (np.asarray(entropy) <= 1.0 + 1e-5).all()

    def test_grid_matches_reference(self):
        net = MuNet()
        np.testing.assert_allclose(
            np.asarray(net.action_values), np.linspace(1.0, 2.0, 21), rtol=1e-6
        )
