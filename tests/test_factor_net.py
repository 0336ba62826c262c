import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consolver_tpu.policy import FactorNet, FactorNetConfig


def make_net(family="sd", **kw):
    cfg = FactorNetConfig(family=family, **kw)
    net = FactorNet(cfg)
    params = net.init(jax.random.key(0))
    return net, params


class TestGrids:
    def test_sd_production_grid(self):
        # run_ppo.sh: order_dim=4, scaler_dim=0, num_actions=11
        cfg = FactorNetConfig(order_dim=4, scaler_dim=0, num_actions=11, family="sd")
        g = cfg.action_value_grid()
        assert g.shape == (3, 11)
        np.testing.assert_allclose(g[0], np.linspace(0, 2, 11))
        np.testing.assert_allclose(g[1], np.linspace(-2, 0, 11))
        np.testing.assert_allclose(g[2], np.linspace(-1, 1, 11))

    def test_sd_default_grid_with_scalers(self):
        cfg = FactorNetConfig(order_dim=4, scaler_dim=2, num_actions=161, family="sd")
        g = cfg.action_value_grid()
        assert g.shape == (5, 161)
        np.testing.assert_allclose(g[3], np.linspace(-0.05, 0.05, 161))
        np.testing.assert_allclose(g[4], np.linspace(-0.05, 0.05, 161))

    def test_fm_production_grid(self):
        # edit_ppo/run_ppo.sh: order_dim=2, scaler_dim=0, mu_dim=0, 11 actions
        cfg = FactorNetConfig(order_dim=2, scaler_dim=0, mu_dim=0, num_actions=11, family="fm")
        g = cfg.action_value_grid()
        assert g.shape == (1, 11)
        np.testing.assert_allclose(g[0], np.linspace(0, 1, 11))

    def test_fm_mu_grid(self):
        cfg = FactorNetConfig(order_dim=2, scaler_dim=0, mu_dim=1, num_actions=11, family="fm")
        g = cfg.action_value_grid()
        assert g.shape == (2, 11)
        assert g[1][0] == 0.0
        np.testing.assert_allclose(g[1][1:], np.linspace(0.5, 0.99, 10))


class TestDistributions:
    def test_sd_zero_init_uniform(self):
        """Zero-initialized head => exactly uniform distribution at init
        (factor_net_ppo.py:82-83)."""
        net, params = make_net("sd", num_actions=11, order_dim=4, scaler_dim=0)
        conds = {"x": jnp.asarray([[999.0, 874.0]])}
        probs = net.probs(params, conds)
        np.testing.assert_allclose(np.asarray(probs), 1.0 / 11, rtol=1e-6)

    def test_fm_not_zero_init(self):
        net, params = make_net("fm", num_actions=11, order_dim=2, scaler_dim=0, mu_dim=0)
        conds = {"x": jnp.asarray([[0.9, 0.5]])}
        probs = net.probs(params, conds)
        # sharpened softmax (T=0.01) of a random head is far from uniform
        assert float(jnp.max(probs)) > 0.5

    def test_sample_shapes_and_values_on_grid(self):
        net, params = make_net("sd", num_actions=11, order_dim=4, scaler_dim=2)
        batch = 6
        conds = {"x": jnp.tile(jnp.asarray([[999.0, 874.0]]), (batch, 1))}
        actions, probs = net.sample_action(params, jax.random.key(1), conds)
        assert actions.shape == (batch, 5) and probs.shape == (batch, 5)
        # every sampled value lies on its grid row
        grid = np.asarray(net.action_values)
        for d in range(5):
            for v in np.asarray(actions[:, d]):
                assert np.any(np.isclose(grid[d], v, atol=1e-6))

    def test_get_action_probs_roundtrip(self):
        """Sampling then re-evaluating via nearest-grid lookup must return the
        same probabilities (the PPO old-vs-new logprob contract)."""
        net, params = make_net("sd", num_actions=11, order_dim=4, scaler_dim=0)
        conds = {"x": jnp.tile(jnp.asarray([[499.0, 374.0]]), (4, 1))}
        actions, probs = net.sample_action(params, jax.random.key(2), conds)
        probs2, entropy = net.get_action_probs(params, conds, actions)
        np.testing.assert_allclose(np.asarray(probs), np.asarray(probs2), rtol=1e-6)
        # uniform => normalized entropy == 1
        np.testing.assert_allclose(np.asarray(entropy), 1.0, rtol=1e-5)

    def test_sampling_statistics(self):
        """Non-uniform head: empirical frequencies track probabilities."""
        net, params = make_net("fm", num_actions=5, order_dim=2, scaler_dim=0, mu_dim=0)
        conds = {"x": jnp.tile(jnp.asarray([[0.8, 0.4]]), (4000, 1))}
        probs = np.asarray(net.probs(params, conds))[0, 0]
        actions, _ = net.sample_action(params, jax.random.key(3), conds)
        grid = np.asarray(net.action_values)[0]
        freq = np.array(
            [np.mean(np.isclose(np.asarray(actions[:, 0]), g)) for g in grid]
        )
        np.testing.assert_allclose(freq, probs, atol=0.05)

    def test_cosine_features_change_logits(self):
        net, params = make_net("sd", num_actions=11, order_dim=4, scaler_dim=0, use_conv=True)
        # make head nonzero (and non-constant) so features matter
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(jax.random.key(9), len(leaves))
        params = jax.tree.unflatten(
            treedef,
            [l + 0.1 * jax.random.normal(k, l.shape) for l, k in zip(leaves, keys)],
        )
        x = jnp.asarray([[999.0, 874.0]])
        eps_a = jnp.ones((1, 4, 2, 4, 4))
        eps_b = jnp.concatenate(
            [jnp.ones((1, 1, 2, 4, 4)), -jnp.ones((1, 3, 2, 4, 4))], axis=1
        )
        pa = net.probs(params, {"x": x, "epsilon": eps_a})
        pb = net.probs(params, {"x": x, "epsilon": eps_b})
        assert not np.allclose(np.asarray(pa), np.asarray(pb))

    def test_input_normalization_families(self):
        sd_cfg = FactorNetConfig(family="sd")
        fm_cfg = FactorNetConfig(family="fm")
        assert np.isclose(sd_cfg.input_scale, 1 / 999)
        assert fm_cfg.input_scale == 1.0


class TestTorchConversion:
    def test_load_torch_state_dict(self):
        torch = pytest.importorskip("torch")
        cfg = FactorNetConfig(num_actions=11, order_dim=4, scaler_dim=0, family="sd")
        net = FactorNet(cfg)
        # build an equivalent torch MLP and compare forward passes
        tnet = torch.nn.Sequential(
            torch.nn.Linear(2, cfg.hidden_dim),
            torch.nn.ReLU(),
            torch.nn.Linear(cfg.hidden_dim, cfg.hidden_dim),
            torch.nn.ReLU(),
            torch.nn.Linear(cfg.hidden_dim, cfg.num_actions * cfg.action_dims),
        )
        sd = {f"mlp.{i}.{k}": v for i in [0, 2, 4] for k, v in tnet[i].state_dict().items()}
        params = net.load_torch_state_dict(sd)

        x = np.asarray([[999.0, 874.0], [499.0, 374.0]], dtype=np.float32)
        with torch.no_grad():
            tlogits = tnet(torch.from_numpy(x) / 999.0).numpy()
        tprobs = torch.softmax(
            torch.from_numpy(tlogits).view(-1, cfg.action_dims, cfg.num_actions), dim=-1
        ).numpy()
        jprobs = np.asarray(net.probs(params, {"x": jnp.asarray(x)}))
        np.testing.assert_allclose(jprobs, tprobs, rtol=1e-4, atol=1e-5)


def test_temperature_override():
    """Beyond-reference knob: soften the FM production sharpness for
    exploration studies (scripts/learning_check_edit.py)."""
    assert FactorNetConfig(family="fm").temperature == 0.01
    assert FactorNetConfig(family="sd").temperature == 1.0
    assert FactorNetConfig(family="fm", temperature_override=1.0).temperature == 1.0


class TestReferenceGolden:
    """TRUE policy-net goldens: the reference's own FactorNetPPO modules
    (root SD variant, edit_ppo FM variant) run on torch-CPU with randomized
    weights transferred into our FactorNet — pinning the action grids, the
    input normalization, the (sharpened) softmax, nearest-grid re-indexing
    and the normalized entropy (factor_net_ppo.py:57-184,
    edit_ppo/factor_net_ppo.py:57-196)."""

    @staticmethod
    def _randomize(tnet, seed, scale):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(seed)
        sd = tnet.state_dict()
        for k, v in sd.items():
            if k.startswith("mlp."):
                sd[k] = torch.from_numpy(
                    (rng.standard_normal(tuple(v.shape)) * scale).astype(np.float32)
                )
        tnet.load_state_dict(sd)
        tnet.eval()
        return tnet

    def _compare(self, tnet, ours, params, x_np, eps_np, seed):
        torch = pytest.importorskip("torch")
        np.testing.assert_allclose(
            np.asarray(ours.action_values), tnet.action_values.numpy(), atol=1e-6
        )
        x_dict = {"x": torch.from_numpy(x_np)}
        conds = {"x": jnp.asarray(x_np)}
        if eps_np is not None:
            x_dict["epsilon"] = torch.from_numpy(eps_np)
            conds["epsilon"] = jnp.asarray(eps_np)
        with torch.no_grad():
            ref_probs = tnet.forward_(x_dict).numpy()
        our_probs = np.asarray(ours.probs(params, conds))
        np.testing.assert_allclose(
            our_probs, ref_probs, rtol=1e-4, atol=1e-6
        )
        # off-grid action values must re-index to the same grid points
        rng = np.random.default_rng(seed)
        grid = tnet.action_values.numpy()
        actions = rng.uniform(
            grid.min(axis=1), grid.max(axis=1), (x_np.shape[0], grid.shape[0])
        ).astype(np.float32)
        with torch.no_grad():
            sel_ref, ent_ref = tnet.get_action_probs(
                x_dict, torch.from_numpy(actions)
            )
        sel, ent = ours.get_action_probs(params, conds, jnp.asarray(actions))
        np.testing.assert_allclose(
            np.asarray(sel), sel_ref.numpy(), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(ent), ent_ref.numpy(), rtol=1e-4, atol=1e-6
        )

    @pytest.mark.parametrize("use_conv", [False, True])
    def test_sd_variant(self, use_conv, capsys):
        pytest.importorskip("torch")
        from tests.diffusers_stub import load_reference

        mod = load_reference("factor_net_ppo.py")
        tnet = mod.FactorNetPPO(
            hidden_dim=32, num_actions=11, order_dim=4, scaler_dim=2,
            use_conv=use_conv,
        )
        capsys.readouterr()
        self._randomize(tnet, seed=int(use_conv), scale=0.5)
        ours = FactorNet(FactorNetConfig(
            num_actions=11, hidden_dim=32, order_dim=4, scaler_dim=2,
            use_conv=use_conv, family="sd",
        ))
        params = ours.load_torch_state_dict(tnet.state_dict())
        rng = np.random.default_rng(7)
        x = rng.integers(0, 1000, (3, 2)).astype(np.float32)
        eps = (
            rng.standard_normal((3, 4, 2, 4, 4)).astype(np.float32)
            if use_conv else None
        )
        self._compare(tnet, ours, params, x, eps, seed=21)

    @pytest.mark.parametrize("mu_dim", [0, 1])
    def test_fm_variant(self, mu_dim, capsys):
        pytest.importorskip("torch")
        from tests.diffusers_stub import load_reference

        mod = load_reference("edit_ppo/factor_net_ppo.py")
        tnet = mod.FactorNetPPO(
            hidden_dim=32, num_actions=11, order_dim=2, scaler_dim=0,
            mu_dim=mu_dim,
        )
        capsys.readouterr()
        # small weights keep logits/0.01 in a comparable range
        self._randomize(tnet, seed=10 + mu_dim, scale=0.003)
        ours = FactorNet(FactorNetConfig(
            num_actions=11, hidden_dim=32, order_dim=2, scaler_dim=0,
            mu_dim=mu_dim, family="fm",
        ))
        params = ours.load_torch_state_dict(tnet.state_dict())
        rng = np.random.default_rng(9)
        x = rng.uniform(0, 1, (3, 2)).astype(np.float32)
        self._compare(tnet, ours, params, x, None, seed=23)
