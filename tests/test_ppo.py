import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consolver_tpu.core import schedules
from consolver_tpu.pipelines.t2i import Trajectory
from consolver_tpu.policy import FactorNet, FactorNetConfig
from consolver_tpu.rl import ppo
from consolver_tpu.rl.ppo import PPOConfig


def test_group_advantages():
    r = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    adv = ppo.group_advantages(r, scale=10.0)
    np.testing.assert_allclose(float(adv.mean()), 0.0, atol=1e-5)
    expected = (np.asarray(r) - 2.5) / (np.std(np.asarray(r)) + 1e-8) * 10
    np.testing.assert_allclose(np.asarray(adv), expected, rtol=1e-4)


def test_baseline_clipped_advantages():
    r = jnp.asarray([1.0, 2.0, 3.0])
    # baseline above the mean clips the mean up to the baseline
    adv = ppo.baseline_clipped_advantages(r, jnp.asarray(2.5))
    expected = (np.asarray(r) - 2.5) / (np.std(np.asarray(r)) + 1e-8)
    np.testing.assert_allclose(np.asarray(adv), expected, rtol=1e-4)
    # baseline below the mean leaves the mean unchanged
    adv2 = ppo.baseline_clipped_advantages(r, jnp.asarray(0.0))
    expected2 = (np.asarray(r) - 2.0) / (np.std(np.asarray(r)) + 1e-8)
    np.testing.assert_allclose(np.asarray(adv2), expected2, rtol=1e-4)


def test_group_advantages_per_group():
    """num_groups=G normalizes within each contiguous group independently
    (the reference's per-rank normalization, train_ppo.py:376 under DDP)."""
    r = jnp.asarray([1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0, 40.0])
    adv = ppo.group_advantages(r, scale=10.0, num_groups=2)
    a = np.asarray(r[:4])
    b = np.asarray(r[4:])
    expected = np.concatenate([
        (a - a.mean()) / (a.std() + 1e-8) * 10,
        (b - b.mean()) / (b.std() + 1e-8) * 10,
    ])
    np.testing.assert_allclose(np.asarray(adv), expected, rtol=1e-4)
    # groups see only their own statistics: scaling group 2's rewards leaves
    # group 1's advantages untouched
    adv2 = ppo.group_advantages(r.at[4:].multiply(7.0), 10.0, num_groups=2)
    np.testing.assert_allclose(np.asarray(adv2[:4]), expected[:4], rtol=1e-4)


def test_baseline_clipped_advantages_per_group():
    """One baseline PER GROUP (edit_ppo/train_ppo.py:290-326 computes the
    Euler baseline per rank): each group's mean clips against its own."""
    r = jnp.asarray([1.0, 2.0, 3.0, 10.0, 20.0, 30.0])
    base = jnp.asarray([2.5, 0.0])  # clips group 1's mean, not group 2's
    adv = ppo.baseline_clipped_advantages(r, base, num_groups=2)
    a, b = np.asarray(r[:3]), np.asarray(r[3:])
    expected = np.concatenate([
        (a - 2.5) / (a.std() + 1e-8),        # mean 2.0 -> clipped to 2.5
        (b - b.mean()) / (b.std() + 1e-8),   # baseline 0 < mean 20
    ])
    np.testing.assert_allclose(np.asarray(adv), expected, rtol=1e-4)


def test_per_group_grads_equal_averaged_group_grads():
    """The semantic claim behind per-shard groups (VERDICT r2 Missing #2):
    one update on the full batch with per-group advantages == the average
    of each group's own gradients (what the reference's DDP all-reduce
    computes across ranks, edit_ppo/train_ppo.py:258-326)."""
    fnet = FactorNet(FactorNetConfig(
        order_dim=3, scaler_dim=0, num_actions=5, hidden_dim=16, family="sd"
    ))
    params = fnet.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    n_per = 6  # rows per group
    conds = {"x": jnp.asarray(rng.uniform(0, 999, (2 * n_per, 2)), jnp.float32)}
    key = jax.random.key(1)
    actions, probs = fnet.sample_action(params, key, conds)
    rewards = jnp.asarray(rng.standard_normal(2 * n_per), jnp.float32)
    adv = ppo.group_advantages(rewards, scale=10.0, num_groups=2)[:, None]

    def grads_of(c, a, p, ad):
        def loss_fn(pp):
            return ppo.ppo_loss(fnet, pp, c, a, p, ad)[0]
        return jax.grad(loss_fn)(params)

    g_full = grads_of(conds, actions, probs, adv)
    half = {"x": conds["x"][:n_per]}, actions[:n_per], probs[:n_per], adv[:n_per]
    other = {"x": conds["x"][n_per:]}, actions[n_per:], probs[n_per:], adv[n_per:]
    g1, g2 = grads_of(*half), grads_of(*other)
    g_avg = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)
    for got, want in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_avg)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6
        )


def test_flatten_trajectory():
    b, s, a = 2, 3, 4
    traj = Trajectory(
        conds_x=jnp.arange(b * s * 2, dtype=jnp.float32).reshape(b, s, 2),
        actions=jnp.zeros((b, s, a)),
        probs=jnp.full((b, s, a), 0.5),
        masks=jnp.concatenate(
            [jnp.zeros((b, s, 1)), jnp.ones((b, s, a - 1))], axis=-1
        ),
    )
    advantages = jnp.asarray([1.0, -2.0])
    conds, actions, old_probs, adv, valid = ppo.flatten_trajectory(
        traj, advantages
    )
    assert conds["x"].shape == (b * s, 2)
    assert actions.shape == (b * s, a)
    assert adv.shape == (b * s, a)
    # advantage broadcast per sample over steps, zeroed where masked
    np.testing.assert_allclose(np.asarray(adv[0]), [0, 1, 1, 1])
    np.testing.assert_allclose(np.asarray(adv[3]), [0, -2, -2, -2])
    # no valid flags recorded -> every row is real
    np.testing.assert_allclose(np.asarray(valid), np.ones((b * s, 1)))


def _bandit_setup(seed=0):
    cfg = FactorNetConfig(order_dim=2, scaler_dim=0, num_actions=5, family="sd")
    net = FactorNet(cfg)
    params = net.init(jax.random.key(seed))
    conds = {"x": jnp.tile(jnp.asarray([[500.0, 400.0]]), (64, 1))}
    return cfg, net, params, conds


def test_ppo_loss_zero_advantage_is_entropy_only():
    cfg, net, params, conds = _bandit_setup()
    actions = jnp.zeros((64, 1))
    old_probs = jnp.full((64, 1), 0.2)
    loss, aux = ppo.ppo_loss(
        net, params, conds, actions, old_probs, jnp.zeros((64, 1)),
        clip_range=0.2, entropy_coef=0.01,
    )
    np.testing.assert_allclose(float(aux["policy_loss"]), 0.0, atol=1e-6)
    # uniform policy at zero-init: normalized entropy == 1
    np.testing.assert_allclose(float(loss), -0.01, rtol=1e-4)


def test_ppo_bandit_learns():
    """One-step bandit: rewarding a single grid action must raise its
    probability (the SURVEY.md section 4 'PPO-update on a bandit toy')."""
    cfg, net, params, conds = _bandit_setup()
    optimizer = ppo.make_optimizer(PPOConfig(learning_rate=5e-3, entropy_coef=0.0))
    opt_state = optimizer.init(params)
    update = jax.jit(
        ppo.make_update_fn(net, optimizer, PPOConfig(learning_rate=5e-3, entropy_coef=0.0))
    )

    target_value = float(np.asarray(net.action_values)[0, 3])
    key = jax.random.key(1)
    for step in range(30):
        key, sub = jax.random.split(key)
        actions, probs = net.sample_action(params, sub, conds)
        rewards = jnp.where(jnp.isclose(actions[:, 0], target_value), 1.0, 0.0)
        adv = ppo.group_advantages(rewards, scale=1.0).reshape(-1, 1)
        params, opt_state, aux = update(params, opt_state, conds, actions, probs, adv)

    final_probs = net.probs(params, conds)
    p_target = float(final_probs[0, 0, 3])
    assert p_target > 0.5, f"policy failed to learn: p={p_target}"


def test_update_moves_toward_positive_advantage():
    cfg, net, params, conds = _bandit_setup()
    pcfg = PPOConfig(learning_rate=1e-3, entropy_coef=0.0)
    optimizer = ppo.make_optimizer(pcfg)
    opt_state = optimizer.init(params)
    update = jax.jit(ppo.make_update_fn(net, optimizer, pcfg))

    grid = np.asarray(net.action_values)
    actions = jnp.full((64, 1), float(grid[0, 2]))
    old_probs = jnp.full((64, 1), 0.2)
    before = float(net.probs(params, conds)[0, 0, 2])
    params, opt_state, _ = update(
        params, opt_state, conds, actions, old_probs, jnp.ones((64, 1))
    )
    after = float(net.probs(params, conds)[0, 0, 2])
    assert after > before


@pytest.mark.slow
def test_trainer_end_to_end(tmp_path):
    """Tiny full loop: rollout -> psnr reward -> PPO update -> checkpoint
    -> resume."""
    from tests.test_pipeline import make_tiny_stack
    from consolver_tpu.pipelines.t2i import TextToImagePipeline
    from consolver_tpu.rewards.registry import make_reward_fn
    from consolver_tpu.rl.train import PPOTrainer, TrainConfig

    (unet, unet_params), (te, te_params), (vae, vae_params) = make_tiny_stack()
    sched = schedules.DiffusionSchedule.sd15()
    fcfg = FactorNetConfig(order_dim=4, scaler_dim=0, num_actions=11, family="sd")
    fnet = FactorNet(fcfg)
    pipe = TextToImagePipeline(
        unet, unet_params, te, te_params, vae, vae_params, sched,
        factor_net=fnet, factor_params=fnet.init(jax.random.key(0)),
    )
    config = TrainConfig(
        max_train_steps=3,
        min_inference_steps=2,
        max_inference_steps=4,
        output_dir=str(tmp_path),
        checkpointing_steps=2,
        ppo=PPOConfig(ppo_epochs=2, learning_rate=1e-4),
    )
    trainer = PPOTrainer(pipe, make_reward_fn("image_psnr"), config)

    rng = np.random.default_rng(0)
    batch = {
        "noise": rng.standard_normal((4, 8, 8, 4)).astype(np.float32),
        "latent": rng.standard_normal((4, 8, 8, 4)).astype(np.float32),
        "prompt_ids": np.ones((4, 4), np.int64),
    }
    metrics = trainer.train_step(dict(batch))
    assert np.isfinite(metrics["loss"])
    assert np.isfinite(metrics["reward"])
    m2 = trainer.train_step(dict(batch))
    assert trainer.global_step == 2

    path = trainer.save_checkpoint()
    assert os.path.isdir(path)

    # fresh trainer resumes
    pipe2 = TextToImagePipeline(
        unet, unet_params, te, te_params, vae, vae_params, sched,
        factor_net=fnet, factor_params=fnet.init(jax.random.key(99)),
    )
    trainer2 = PPOTrainer(pipe2, make_reward_fn("image_psnr"), config)
    assert trainer2.resume_from_checkpoint("latest")
    assert trainer2.global_step == 2
    chex_equal = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
        trainer.params, trainer2.params,
    )
    assert all(jax.tree.leaves(chex_equal))


def test_resume_replays_uninterrupted_run(tmp_path):
    """Kill/resume parity (train_ppo.py:290-311): a run checkpointed at
    step 3 and resumed must reach step 6 with params + opt_state BIT-EQUAL
    to an uninterrupted 6-step run over the same data stream.  Exercises
    all three resume-determinism pieces: fit()'s data fast-forward, the
    per-step group RNG, and the (seed, global_step)-derived rollout key."""
    from tests.test_pipeline import make_tiny_stack
    from consolver_tpu.pipelines.t2i import TextToImagePipeline
    from consolver_tpu.rewards.registry import make_reward_fn
    from consolver_tpu.rl.train import PPOTrainer, TrainConfig

    (unet, unet_params), (te, te_params), (vae, vae_params) = make_tiny_stack()
    sched = schedules.DiffusionSchedule.sd15()
    fnet = FactorNet(
        FactorNetConfig(order_dim=4, scaler_dim=0, num_actions=11, family="sd")
    )

    def make_pipe():
        return TextToImagePipeline(
            unet, unet_params, te, te_params, vae, vae_params, sched,
            factor_net=fnet, factor_params=fnet.init(jax.random.key(0)),
        )

    def batches():
        # index-dependent content: any stream misalignment after resume
        # changes the consumed data and breaks bit-equality
        i = 0
        while True:
            rng = np.random.default_rng(100 + i)
            yield {
                "noise": rng.standard_normal((4, 8, 8, 4)).astype(np.float32),
                "latent": rng.standard_normal((4, 8, 8, 4)).astype(np.float32),
                "prompt_ids": rng.integers(1, 50, (4, 4)).astype(np.int64),
            }
            i += 1

    def config(out, max_steps, ckpt_steps=100):
        return TrainConfig(
            max_train_steps=max_steps, min_inference_steps=2,
            max_inference_steps=4, output_dir=str(out), seed=7,
            checkpointing_steps=ckpt_steps,
            ppo=PPOConfig(ppo_epochs=1, learning_rate=1e-3),
        )

    # uninterrupted control: 6 steps straight through
    control = PPOTrainer(
        make_pipe(), make_reward_fn("image_psnr"),
        config(tmp_path / "a", 6),
    )
    control.fit(batches())
    assert control.global_step == 6

    # victim: 3 steps, checkpoint, "crash"; a FRESH trainer resumes to 6
    victim = PPOTrainer(
        make_pipe(), make_reward_fn("image_psnr"),
        config(tmp_path / "b", 3, ckpt_steps=3),
    )
    victim.fit(batches())
    assert victim.global_step == 3

    resumed = PPOTrainer(
        make_pipe(), make_reward_fn("image_psnr"),
        config(tmp_path / "b", 6),
    )
    assert resumed.resume_from_checkpoint("latest")
    assert resumed.global_step == 3
    resumed.fit(batches())
    assert resumed.global_step == 6

    for got, want in zip(
        jax.tree.leaves((resumed.params, resumed.opt_state)),
        jax.tree.leaves((control.params, control.opt_state)),
    ):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_num_inference_deterministic_across_hosts():
    from consolver_tpu.rl.train import PPOTrainer, TrainConfig

    cfg = TrainConfig(seed=7)
    draws_a = [
        __import__("random").Random(f"{cfg.seed}-{s}").randrange(2, 16) for s in range(20)
    ]
    draws_b = [
        __import__("random").Random(f"{cfg.seed}-{s}").randrange(2, 16) for s in range(20)
    ]
    assert draws_a == draws_b
    assert min(draws_a) >= 2 and max(draws_a) <= 15


def test_reward_metrics():
    from consolver_tpu.rewards import metrics

    pred = jnp.zeros((2, 8, 8, 3))
    np.testing.assert_allclose(
        np.asarray(metrics.image_psnr_reward(pred, pred)), [80.0, 80.0], rtol=1e-3
    )
    target = jnp.ones((2, 8, 8, 3)) * 0.5
    r = metrics.image_psnr_reward(pred, target)
    np.testing.assert_allclose(np.asarray(r), 10 * np.log10(1 / 0.25), rtol=1e-4)

    f1 = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    f2 = jnp.asarray([[1.0, 0.0], [0.0, -1.0]])
    np.testing.assert_allclose(
        np.asarray(metrics.feature_cosine_reward(f1, f2)), [100.0, 0.0], atol=1e-4
    )

    d1 = jnp.tile(jnp.linspace(0, 5, 8)[None, :, None], (1, 1, 8))
    d2 = d1 * 3 + 7  # min-max normalization makes these identical
    r = metrics.depth_psnr_reward(d1, d2)
    assert float(r[0]) > 70

    m1 = jnp.zeros((1, 4, 4), jnp.int32)
    m2 = m1.at[0, 0, :].set(1)
    np.testing.assert_allclose(
        np.asarray(metrics.segmentation_reward(m1, m2)), [75.0]
    )


@pytest.mark.slow
def test_fit_checkpoints_on_failure(tmp_path):
    """fit() must save state before propagating an unexpected error."""
    from tests.test_pipeline import make_tiny_stack
    from consolver_tpu.pipelines.t2i import TextToImagePipeline
    from consolver_tpu.rewards.registry import make_reward_fn
    from consolver_tpu.rl.train import PPOTrainer, TrainConfig
    from consolver_tpu.core import schedules

    (unet, unet_params), (te, te_params), (vae, vae_params) = make_tiny_stack()
    fcfg = FactorNetConfig(order_dim=2, scaler_dim=0, num_actions=11, family="sd")
    fnet = FactorNet(fcfg)
    pipe = TextToImagePipeline(
        unet, unet_params, te, te_params, vae, vae_params,
        schedules.DiffusionSchedule.sd15(),
        factor_net=fnet, factor_params=fnet.init(jax.random.key(0)),
    )
    config = TrainConfig(
        max_train_steps=10, min_inference_steps=2, max_inference_steps=3,
        output_dir=str(tmp_path), checkpointing_steps=100,
        ppo=PPOConfig(ppo_epochs=1),
    )
    trainer = PPOTrainer(pipe, make_reward_fn("image_psnr"), config)

    rng = np.random.default_rng(0)
    good = {
        "noise": rng.standard_normal((2, 8, 8, 4)).astype(np.float32),
        "latent": rng.standard_normal((2, 8, 8, 4)).astype(np.float32),
        "prompt_ids": np.ones((2, 4), np.int64),
    }

    def batches():
        yield dict(good)
        raise RuntimeError("data source died")

    with pytest.raises(RuntimeError):
        trainer.fit(batches())
    # state was checkpointed at the failure point
    assert trainer._checkpoint_dirs(), "no checkpoint written on failure"
    # Multi-process: the failure save must be skipped — orbax's coordinated
    # save has an internal cross-process barrier, and only the failing
    # process would reach it (peers are blocked in the next collective),
    # deadlocking the cluster instead of surfacing the error.
    from unittest import mock
    with mock.patch.object(jax, "process_count", return_value=2):
        assert not trainer._can_failure_save()
    assert trainer._can_failure_save()
    trainer2 = PPOTrainer(pipe, make_reward_fn("image_psnr"), config)
    assert trainer2.resume_from_checkpoint("latest")
    assert trainer2.global_step == 1


def test_padded_rollout_trainer_matches_rewards(tmp_path):
    """padded_rollout=True: one compiled rollout for all step counts; the
    rollout itself is EXACT vs the per-count program (same RNG chain
    prefix), so per-step rewards must match the default trainer."""
    from tests.test_pipeline import make_tiny_stack
    from consolver_tpu.pipelines.t2i import TextToImagePipeline
    from consolver_tpu.rewards.registry import make_reward_fn
    from consolver_tpu.rl.train import PPOTrainer, TrainConfig

    (unet, unet_params), (te, te_params), (vae, vae_params) = make_tiny_stack()
    sched = schedules.DiffusionSchedule.sd15()
    fcfg = FactorNetConfig(order_dim=3, scaler_dim=0, num_actions=11, family="sd")

    def build(padded, out):
        fnet = FactorNet(fcfg)
        pipe = TextToImagePipeline(
            unet, unet_params, te, te_params, vae, vae_params, sched,
            factor_net=fnet, factor_params=fnet.init(jax.random.key(1)),
        )
        config = TrainConfig(
            min_inference_steps=2, max_inference_steps=5, seed=3,
            output_dir=out, padded_rollout=padded,
            ppo=PPOConfig(ppo_epochs=1, learning_rate=1e-3),
        )
        return PPOTrainer(pipe, make_reward_fn("image_psnr"), config)

    rng = np.random.default_rng(4)
    batch = {
        "noise": rng.standard_normal((4, 8, 8, 4)).astype(np.float32),
        "latent": rng.standard_normal((4, 8, 8, 4)).astype(np.float32),
        "prompt_ids": np.ones((4, 4), np.int64),
    }
    t_ref = build(False, str(tmp_path / "ref"))
    t_pad = build(True, str(tmp_path / "pad"))
    for _ in range(2):  # two different drawn step counts
        m_ref = t_ref.train_step(dict(batch))
        m_pad = t_pad.train_step(dict(batch))
        assert m_ref["num_inference"] == m_pad["num_inference"]
        np.testing.assert_allclose(m_ref["reward"], m_pad["reward"], rtol=1e-5)
        assert np.isfinite(m_pad["loss"])


def test_grad_accumulation_steps():
    """PPOConfig.grad_accumulation_steps=k: params move only every k-th
    update, by exactly the single-step update on the k-grad average
    (reference --gradient_accumulation_steps via accelerate accumulate,
    train_ppo.py:324; production k=1)."""
    import optax

    from consolver_tpu.rl.ppo import PPOConfig, make_optimizer

    params = {"w": jnp.ones((3,))}
    g1 = {"w": jnp.asarray([0.1, -0.2, 0.3])}
    g2 = {"w": jnp.asarray([0.3, 0.0, -0.1])}

    cfg = PPOConfig(grad_accumulation_steps=2)
    opt = make_optimizer(cfg)
    state = opt.init(params)
    up1, state = opt.update(g1, state, params)
    mid = optax.apply_updates(params, up1)
    # first micro-step: no movement
    np.testing.assert_array_equal(np.asarray(mid["w"]), np.asarray(params["w"]))
    up2, state = opt.update(g2, state, mid)
    after = optax.apply_updates(mid, up2)

    ref_opt = make_optimizer(PPOConfig())
    ref_state = ref_opt.init(params)
    gavg = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)
    ref_up, _ = ref_opt.update(gavg, ref_state, params)
    ref_after = optax.apply_updates(params, ref_up)
    np.testing.assert_allclose(
        np.asarray(after["w"]), np.asarray(ref_after["w"]), rtol=1e-6
    )


def test_trainer_pins_numpy_model_trees_on_device(tmp_path):
    """Single-chip trainers must device_put orbax-restored (host-numpy)
    model trees ONCE at init: numpy leaves re-stage the whole tree through
    the transfer path on EVERY jitted call (~100 s/step vs 13 s measured
    for the full-size SD stack on the tunneled chip)."""
    from tests.test_pipeline import make_tiny_stack
    from consolver_tpu.pipelines.t2i import TextToImagePipeline
    from consolver_tpu.rewards.registry import make_reward_fn
    from consolver_tpu.rl.train import PPOTrainer, TrainConfig

    (unet, unet_params), (te, te_params), (vae, vae_params) = make_tiny_stack()
    to_np = lambda t: jax.tree.map(lambda x: np.asarray(x), t)
    fnet = FactorNet(
        FactorNetConfig(order_dim=4, scaler_dim=0, num_actions=11, family="sd")
    )
    pipe = TextToImagePipeline(
        unet, to_np(unet_params), te, to_np(te_params), vae, to_np(vae_params),
        schedules.DiffusionSchedule.sd15(),
        factor_net=fnet, factor_params=fnet.init(jax.random.key(0)),
    )
    PPOTrainer(
        pipe, make_reward_fn("image_psnr"),
        TrainConfig(max_train_steps=1, output_dir=str(tmp_path),
                    ppo=PPOConfig(ppo_epochs=1)),
    )
    for tree in (pipe.unet_params, pipe.text_params, pipe.vae_params):
        for leaf in jax.tree.leaves(tree):
            assert isinstance(leaf, jax.Array), type(leaf)
