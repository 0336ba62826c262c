import jax
import jax.numpy as jnp
import numpy as np
import pytest

from consolver_tpu.rewards.registry import make_reward_fn
from consolver_tpu.rl.ppo import PPOConfig
from consolver_tpu.rl.train import TrainConfig
from consolver_tpu.rl.train_edit import EditPPOTrainer
from tests.test_edit import pipe  # noqa: F401  (fixture)


@pytest.mark.slow
def test_edit_trainer_end_to_end(pipe, tmp_path):  # noqa: F811
    config = TrainConfig(
        max_train_steps=2,
        guidance_scale=2.5,
        min_inference_steps=2,
        max_inference_steps=4,
        output_dir=str(tmp_path),
        ppo=PPOConfig(ppo_epochs=2, learning_rate=1e-3, advantage_scale=1.0),
    )
    trainer = EditPPOTrainer(
        pipe, make_reward_fn("image_psnr"), config,
        dump_samples_to=str(tmp_path / "dumps"),
    )
    rng = np.random.default_rng(0)
    batch = {
        "noise": rng.standard_normal((3, 8, 8, 4)).astype(np.float32),
        "latent": rng.standard_normal((3, 8, 8, 4)).astype(np.float32),
        "ref_image": np.zeros((3, 16, 16, 3), np.float32),
        "t5_ids": np.ones((3, 4), np.int64),
        "clip_ids": np.ones((3, 4), np.int64),
    }
    m = trainer.train_step(dict(batch))
    assert np.isfinite(m["loss"]) and np.isfinite(m["reward"])
    assert np.isfinite(m["baseline_reward"])
    assert 2 <= m["num_inference"] < 4
    m2 = trainer.train_step(dict(batch))
    assert trainer.global_step == 2
    # sample dumps written with advantage-labeled names
    dumps = list((tmp_path / "dumps" / "step_0").glob("sample_*_adv_*.png"))
    assert len(dumps) == 3
    # params actually updated
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(pipe.factor_net.init(jax.random.key(99))),
            jax.tree.leaves(trainer.params),
        )
    )
    assert changed


def test_edit_padded_rollout_matches_per_count(pipe, tmp_path):  # noqa: F811
    """padded_rollout=True: ONE compiled policy program + ONE baseline
    program serve every step count, with train metrics identical to the
    per-count trainer (valid-masked PPO means; same RNG chain prefix)."""

    def run(padded):
        pipe.factor_params = pipe.factor_net.init(jax.random.key(11))
        config = TrainConfig(
            min_inference_steps=2, max_inference_steps=4, seed=7,
            output_dir=str(tmp_path / ("p" if padded else "c")),
            padded_rollout=padded,
            ppo=PPOConfig(ppo_epochs=1, learning_rate=1e-3),
        )
        trainer = EditPPOTrainer(pipe, make_reward_fn("image_psnr"), config)
        rng = np.random.default_rng(5)
        batch = {
            "noise": rng.standard_normal((2, 8, 8, 4)).astype(np.float32),
            "latent": rng.standard_normal((2, 8, 8, 4)).astype(np.float32),
            "ref_image": np.zeros((2, 16, 16, 3), np.float32),
            "t5_ids": np.ones((2, 4), np.int64),
            "clip_ids": np.ones((2, 4), np.int64),
        }
        metrics = trainer.train_step(batch)
        return metrics, trainer.params

    m_pc, p_pc = run(False)
    m_p, p_p = run(True)
    assert m_pc["num_inference"] == m_p["num_inference"]
    np.testing.assert_allclose(m_p["reward"], m_pc["reward"], rtol=1e-6)
    np.testing.assert_allclose(
        m_p["baseline_reward"], m_pc["baseline_reward"], rtol=1e-6
    )
    np.testing.assert_allclose(m_p["loss"], m_pc["loss"], rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree.leaves(p_pc), jax.tree.leaves(p_p)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )


def test_edit_trainer_mesh_matches_single_device(pipe, tmp_path):  # noqa: F811
    """EditPPOTrainer(mesh=...) — the TPU-native replacement for the
    reference's 8-way DDP FLUX trainer (edit_ppo/run_ppo.sh:5) — must
    produce the same rollout rewards as the unsharded trainer, and its
    params must live replicated on all devices."""
    from consolver_tpu.dist import mesh as meshlib

    def build(mesh, out):
        # fresh factor params per trainer (the fixture pipe is shared)
        pipe.factor_params = pipe.factor_net.init(jax.random.key(7))
        config = TrainConfig(
            min_inference_steps=2, max_inference_steps=3, seed=5,
            output_dir=out, ppo=PPOConfig(ppo_epochs=1, learning_rate=1e-3),
            # pin the group structure so mesh and single-device trainers run
            # the identical computation (mesh would default to 8 groups)
            num_groups=2,
        )
        return EditPPOTrainer(pipe, make_reward_fn("image_psnr"), config, mesh=mesh)

    rng = np.random.default_rng(2)
    batch = {
        "noise": rng.standard_normal((8, 8, 8, 4)).astype(np.float32),
        "latent": rng.standard_normal((8, 8, 8, 4)).astype(np.float32),
        "ref_image": np.zeros((8, 16, 16, 3), np.float32),
        "t5_ids": np.ones((8, 4), np.int64),
        "clip_ids": np.ones((8, 4), np.int64),
    }
    t_ref = build(None, str(tmp_path / "ref"))
    m_ref = t_ref.train_step(dict(batch))

    t_dp = build(meshlib.make_mesh(), str(tmp_path / "dp"))
    m_dp = t_dp.train_step(dict(batch))

    np.testing.assert_allclose(m_ref["reward"], m_dp["reward"], rtol=1e-4)
    np.testing.assert_allclose(
        m_ref["baseline_reward"], m_dp["baseline_reward"], rtol=1e-4
    )
    for leaf in jax.tree.leaves(t_dp.params):
        assert np.isfinite(np.asarray(leaf)).all()
    some = jax.tree.leaves(t_dp.params)[0]
    assert len(some.sharding.device_set) == 8


def test_edit_trainer_2d_mesh_tp(pipe, tmp_path):  # noqa: F811
    """4x2 data x model mesh: the frozen DiT tensor-shards by
    dist/tp.FLUX_TP_RULES while the batch shards over the data axis."""
    from consolver_tpu.dist import mesh as meshlib

    pipe.factor_params = pipe.factor_net.init(jax.random.key(7))
    m = meshlib.make_mesh(
        axis_shape=(4, 2), axis_names=(meshlib.DATA_AXIS, meshlib.MODEL_AXIS)
    )
    config = TrainConfig(
        min_inference_steps=2, max_inference_steps=3, seed=5,
        output_dir=str(tmp_path), ppo=PPOConfig(ppo_epochs=1),
    )
    trainer = EditPPOTrainer(pipe, make_reward_fn("image_psnr"), config, mesh=m)
    rng = np.random.default_rng(3)
    batch = {
        "noise": rng.standard_normal((4, 8, 8, 4)).astype(np.float32),
        "latent": rng.standard_normal((4, 8, 8, 4)).astype(np.float32),
        "ref_image": np.zeros((4, 16, 16, 3), np.float32),
        "t5_ids": np.ones((4, 4), np.int64),
        "clip_ids": np.ones((4, 4), np.int64),
    }
    metrics = trainer.train_step(dict(batch))
    assert np.isfinite(metrics["loss"]) and np.isfinite(metrics["reward"])


@pytest.mark.slow
def test_edit_trainer_checkpoint_resume(pipe, tmp_path):  # noqa: F811
    config = TrainConfig(
        min_inference_steps=2, max_inference_steps=3,
        output_dir=str(tmp_path), ppo=PPOConfig(ppo_epochs=1),
    )
    trainer = EditPPOTrainer(pipe, make_reward_fn("image_psnr"), config)
    rng = np.random.default_rng(1)
    batch = {
        "noise": rng.standard_normal((2, 8, 8, 4)).astype(np.float32),
        "latent": rng.standard_normal((2, 8, 8, 4)).astype(np.float32),
        "ref_image": np.zeros((2, 16, 16, 3), np.float32),
        "t5_ids": np.ones((2, 4), np.int64),
        "clip_ids": np.ones((2, 4), np.int64),
    }
    trainer.train_step(dict(batch))
    trainer.save_checkpoint()
    # save_pretrained export
    export = trainer.save_pretrained(str(tmp_path / "final"))
    import os
    assert os.path.isdir(export)
    assert (tmp_path / "final" / "factor_net_config.json").exists()

    trainer2 = EditPPOTrainer(pipe, make_reward_fn("image_psnr"), config)
    assert trainer2.resume_from_checkpoint("latest")
    assert trainer2.global_step == 1
    same = all(
        np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(trainer.params), jax.tree.leaves(trainer2.params))
    )
    assert same


@pytest.mark.slow
def test_edit_resume_replays_uninterrupted_run(pipe, tmp_path):  # noqa: F811
    """Edit-family kill/resume parity (edit_ppo/train_ppo.py:117-133): a
    run checkpointed at step 3 and resumed must reach step 6 with params +
    opt_state BIT-EQUAL to an uninterrupted 6-step run over the same data
    stream — the FLUX twin of test_ppo.test_resume_replays_uninterrupted_run.
    Exercises fit()'s data fast-forward and the (seed, global_step)-derived
    rollout/step-count draws through EditPPOTrainer."""

    def batches():
        # index-dependent content: any stream misalignment after resume
        # changes the consumed data and breaks bit-equality
        i = 0
        while True:
            rng = np.random.default_rng(300 + i)
            yield {
                "noise": rng.standard_normal((2, 8, 8, 4)).astype(np.float32),
                "latent": rng.standard_normal((2, 8, 8, 4)).astype(np.float32),
                "ref_image": np.zeros((2, 16, 16, 3), np.float32),
                "t5_ids": rng.integers(1, 20, (2, 4)).astype(np.int64),
                "clip_ids": rng.integers(1, 20, (2, 4)).astype(np.int64),
            }
            i += 1

    def config(out, max_steps, ckpt_steps=100):
        return TrainConfig(
            max_train_steps=max_steps, min_inference_steps=2,
            max_inference_steps=3, output_dir=str(out), seed=7,
            checkpointing_steps=ckpt_steps,
            ppo=PPOConfig(ppo_epochs=1, learning_rate=1e-3),
        )

    def make_trainer(cfg):
        pipe.factor_params = pipe.factor_net.init(jax.random.key(21))
        return EditPPOTrainer(pipe, make_reward_fn("image_psnr"), cfg)

    # uninterrupted control: 6 steps straight through
    control = make_trainer(config(tmp_path / "a", 6))
    control.fit(batches())
    assert control.global_step == 6

    # victim: 3 steps, checkpoint, "crash"; a FRESH trainer resumes to 6
    victim = make_trainer(config(tmp_path / "b", 3, ckpt_steps=3))
    victim.fit(batches())
    assert victim.global_step == 3

    resumed = make_trainer(config(tmp_path / "b", 6))
    assert resumed.resume_from_checkpoint("latest")
    assert resumed.global_step == 3
    resumed.fit(batches())
    assert resumed.global_step == 6

    for got, want in zip(
        jax.tree.leaves((resumed.params, resumed.opt_state)),
        jax.tree.leaves((control.params, control.opt_state)),
    ):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
