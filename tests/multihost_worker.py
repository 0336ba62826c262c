"""Worker for the 2-process multi-host readiness test (test_multihost.py).

Each process runs with 4 virtual CPU devices and joins a jax.distributed
cluster, then exercises the multi-host-sensitive pieces of the trainer
stack: the deterministic per-step inference-count draw (replacing the
reference's rank-0 broadcast, edit_ppo/train_ppo.py:275-283), process-0
checkpoint gating (rl/checkpointing.py), resume on every process, and a
global-mesh computation over all 8 devices.

Invoked as: python multihost_worker.py <coordinator> <num_procs> <pid> <out_dir>
"""

import json
import os
import sys


def main():
    coordinator, num_procs, pid, out_dir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=num_procs, process_id=pid
    )
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.device_count() == 4 * num_procs
    assert len(jax.local_devices()) == 4

    import numpy as np

    from consolver_tpu.dist import mesh as meshlib
    from consolver_tpu.rl.checkpointing import CheckpointMixin
    from consolver_tpu.rl.train import PPOTrainer, TrainConfig

    result = {"pid": pid}

    # --- deterministic per-step count draw: same on every process with NO
    # collective (the method only reads (seed, step)) ---
    class _Dummy(CheckpointMixin):
        pass

    dummy = _Dummy()
    dummy.config = TrainConfig(seed=7, output_dir=os.path.join(out_dir, "ckpts"))
    result["counts"] = [
        PPOTrainer._num_inference_for_step(dummy, step) for step in range(12)
    ]

    # --- global 8-device mesh spanning both processes; replicated params
    # visible identically from each host ---
    m = meshlib.make_mesh()
    assert m.devices.size == 8, m.shape
    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3), "b": np.ones(3, np.float32)}
    rep = meshlib.replicate(m, params)
    result["param_sum"] = meshlib.assert_params_synced(rep)

    # --- coordinated checkpointing: every process enters orbax's save
    # barrier, orbax's primary-host logic writes exactly once; every
    # process resumes the same state ---
    dummy.params = jax.tree.map(np.asarray, params)
    dummy.opt_state = {"count": np.asarray(3)}
    dummy.global_step = 5
    dummy.pipe = type("P", (), {"factor_net": None, "factor_params": None})()
    path = dummy.save_checkpoint()
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("after_save")
    result["ckpt_exists"] = os.path.isdir(path)

    dummy2 = _Dummy()
    dummy2.config = dummy.config
    dummy2.params = jax.tree.map(np.zeros_like, params)
    dummy2.opt_state = {"count": np.asarray(0)}
    dummy2.global_step = 0
    dummy2.pipe = dummy.pipe
    assert dummy2.resume_from_checkpoint("latest")
    result["resumed_step"] = dummy2.global_step
    result["resumed_w0"] = float(np.asarray(dummy2.params["w"]).ravel()[1])

    # --- a REAL cross-process train step: tiny PPOTrainer over the global
    # 8-device mesh, every process feeding the same host batch (per-shard
    # groups + sharded update + implicit psum spanning both processes) ---
    from consolver_tpu.core import schedules
    from consolver_tpu.pipelines.t2i import TextToImagePipeline
    from consolver_tpu.policy import FactorNet, FactorNetConfig
    from consolver_tpu.rewards.registry import make_reward_fn
    from consolver_tpu.rl.ppo import PPOConfig
    from tests.test_pipeline import make_tiny_stack

    (unet, up), (te, tp), (vae, vp) = make_tiny_stack()
    fnet = FactorNet(FactorNetConfig(
        order_dim=3, scaler_dim=0, num_actions=11, family="sd"
    ))
    pipe = TextToImagePipeline(
        unet, up, te, tp, vae, vp, schedules.DiffusionSchedule.sd15(),
        factor_net=fnet, factor_params=fnet.init(jax.random.key(0)),
    )
    trainer = PPOTrainer(
        pipe, make_reward_fn("image_psnr"),
        TrainConfig(min_inference_steps=2, max_inference_steps=3, seed=3,
                    output_dir=os.path.join(out_dir, "train_ckpts")),
        mesh=m,
    )
    brng = np.random.default_rng(7)  # same batch on every process
    batch = {
        "noise": brng.standard_normal((8, 8, 8, 4)).astype(np.float32),
        "latent": brng.standard_normal((8, 8, 8, 4)).astype(np.float32),
        "prompt_ids": np.ones((8, 4), np.int64),
    }
    metrics = trainer.train_step(batch)
    result["train_reward"] = metrics["reward"]
    result["train_loss"] = metrics["loss"]
    result["train_num_groups"] = trainer.num_groups
    result["train_param_sum"] = meshlib.assert_params_synced(trainer.params)

    with open(os.path.join(out_dir, f"result_{pid}.json"), "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
