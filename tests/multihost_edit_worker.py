"""Worker for the 2-process EDIT-family multi-host test (test_multihost.py).

VERDICT r4 task #5: the SD-family cluster test (multihost_worker.py) proves
data parallelism + orbax gating across processes, but the bf16 11.9B
Kontext deployment needs the DiT *tensor-sharded across the process
boundary* (23.8 GB bf16 > one 16 GB chip, docs/SERVING.md).  This worker
runs one real EditPPOTrainer.train_step on a (data=4, model=2) mesh whose
MODEL axis is deliberately laid out to pair one device from EACH process
(the transpose below) — every TP collective in the DiT then crosses the
process boundary — plus the coordinated orbax save/resume.

Covers the reference's 8-rank DDP edit trainer (edit_ppo/run_ppo.sh:5,
edit_ppo/accelerate_config.yaml:1-5) in the topology accelerate cannot
express (accelerate/NCCL DDP never model-shards).

Invoked as: python multihost_edit_worker.py <coordinator> <num_procs> <pid> <out_dir>
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
        coordinator_address=coordinator, num_processes=num_procs,
        process_id=pid,
    )
    assert jax.device_count() == 4 * num_procs

    import numpy as np
    from jax.sharding import Mesh

    from consolver_tpu.dist import mesh as meshlib
    from consolver_tpu.rewards.registry import make_reward_fn
    from consolver_tpu.rl.ppo import PPOConfig
    from consolver_tpu.rl.train import TrainConfig
    from consolver_tpu.rl.train_edit import EditPPOTrainer
    from tests.test_edit import make_tiny_flux_pipeline

    result = {"pid": pid}

    # jax.devices() is process-major ([proc0 x4, proc1 x4]); reshape(2, 4).T
    # gives a (data=4, model=2) mesh where every MODEL group holds one
    # device from each process — the TP collectives must cross the process
    # boundary (a plain reshape would keep each TP pair inside one process
    # and prove nothing)
    arr = np.asarray(jax.devices()).reshape(num_procs, 4).T
    mesh = Mesh(arr, (meshlib.DATA_AXIS, meshlib.MODEL_AXIS))
    result["model_groups_cross_processes"] = all(
        len({d.process_index for d in arr[i]}) == num_procs
        for i in range(arr.shape[0])
    )

    pipe = make_tiny_flux_pipeline()
    trainer = EditPPOTrainer(
        pipe, make_reward_fn("image_psnr"),
        TrainConfig(min_inference_steps=2, max_inference_steps=3, seed=11,
                    output_dir=os.path.join(out_dir, "edit_ckpts"),
                    ppo=PPOConfig(ppo_epochs=1, learning_rate=1e-3)),
        mesh=mesh,
    )
    batch = meshlib.data_axis_size(mesh)
    rng = np.random.default_rng(5)  # same host batch on every process
    host_batch = {
        "noise": rng.standard_normal((batch, 8, 8, 4)).astype(np.float32),
        "latent": rng.standard_normal((batch, 8, 8, 4)).astype(np.float32),
        "ref_image": rng.uniform(-1, 1, (batch, 16, 16, 3)).astype(np.float32),
        "t5_ids": np.ones((batch, 4), np.int64),
        "clip_ids": np.ones((batch, 4), np.int64),
    }
    metrics = trainer.train_step(host_batch)
    result["train_reward"] = metrics["reward"]
    result["train_loss"] = metrics["loss"]
    result["train_num_groups"] = trainer.num_groups
    result["train_param_sum"] = meshlib.assert_params_synced(trainer.params)

    # coordinated orbax save across the cluster (every process enters the
    # barrier; orbax's primary host writes once), then resume on both
    path = trainer.save_checkpoint()
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("after_edit_save")
    result["ckpt_exists"] = os.path.isdir(path)
    saved_step = trainer.global_step
    trainer.global_step = -1
    assert trainer.resume_from_checkpoint("latest")
    result["resumed_step"] = trainer.global_step
    assert trainer.global_step == saved_step

    with open(os.path.join(out_dir, f"edit_result_{pid}.json"), "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
