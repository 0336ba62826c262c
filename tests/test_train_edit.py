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
