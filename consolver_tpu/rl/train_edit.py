"""FLUX-Kontext editing PPO trainer.

TPU-native rebuild of edit_ppo/train_ppo.py:48-431.  Deltas vs the SD
trainer (rl/train.py), reproduced from the reference:

  * inference-step count drawn in [2, 6) deterministically per step
    (replaces the rank-0 broadcast, edit_ppo/train_ppo.py:275-283);
  * an extra BASELINE rollout with the naive Euler FM solver on one sample
    PER GROUP (:290-300 — the reference computes it per rank) whose reward
    clips that group's mean from below in the advantage (:316-326) — no
    x10 scaling;
  * ppo_epochs=4 (run_ppo.sh), group batch includes the reference image;
  * optional per-step sample dumps labeled with the advantage (:404-416);
  * mesh data-parallelism: the reference's FLUX trainer is the 8-way DDP
    one (edit_ppo/run_ppo.sh:5, accelerate_config.yaml:1-5) — here the
    group batch shards over the mesh's data axis, the policy/optimizer
    replicate, XLA inserts the gradient psum, and (on a 2-D mesh) the
    frozen DiT tensor-shards by dist/tp.FLUX_TP_RULES.
"""

from __future__ import annotations

import os
import random
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from consolver_tpu.data.group import repeat_random_sample_groups
from consolver_tpu.pipelines.edit import FluxKontextPipeline
from consolver_tpu.rl import ppo
from consolver_tpu.rl.train import TrainConfig


from consolver_tpu.rl.checkpointing import CheckpointMixin


class EditPPOTrainer(CheckpointMixin):
    def __init__(
        self,
        pipeline: FluxKontextPipeline,
        reward_fn: Callable[[jax.Array, jax.Array], jax.Array],
        config: TrainConfig,
        mesh=None,
        dump_samples_to: Optional[str] = None,
    ):
        if pipeline.factor_net is None:
            raise ValueError("EditPPOTrainer needs a pipeline with a factor_net")
        self.pipe = pipeline
        self.reward_fn = reward_fn
        self.config = config
        self.mesh = mesh
        self.dump_samples_to = dump_samples_to

        from consolver_tpu.dist.mesh import resolve_num_groups

        # one independent prompt group (and one Euler baseline) per data
        # shard, like the reference's per-rank groups
        self.num_groups = resolve_num_groups(config.num_groups, mesh)

        self.params = pipeline.factor_params
        self.optimizer = ppo.make_optimizer(config.ppo)
        self.opt_state = self.optimizer.init(self.params)
        self.global_step = 0
        update = ppo.make_update_fn(self.factor_net, self.optimizer, config.ppo)
        if mesh is not None:
            from consolver_tpu.dist import mesh as meshlib
            from consolver_tpu.dist.tp import FLUX_TP_RULES, shard_params_by_rules

            self._update = meshlib.data_parallel_jit(
                update, mesh, batch_argnums=(2, 3, 4, 5, 6)
            )
            self.params = meshlib.replicate(mesh, self.params)
            self.opt_state = meshlib.replicate(mesh, self.opt_state)
            pipeline.factor_params = self.params
            if meshlib.MODEL_AXIS in mesh.axis_names:
                pipeline.transformer_params = shard_params_by_rules(
                    mesh, pipeline.transformer_params, FLUX_TP_RULES
                )
            else:
                pipeline.transformer_params = meshlib.replicate(
                    mesh, pipeline.transformer_params
                )
            pipeline.t5_params = meshlib.replicate(mesh, pipeline.t5_params)
            pipeline.clip_params = meshlib.replicate(mesh, pipeline.clip_params)
            pipeline.vae_params = meshlib.replicate(mesh, pipeline.vae_params)
        else:
            self._update = jax.jit(update)
            # Single chip: pin the (possibly orbax-restored host-numpy)
            # model trees on device ONCE — numpy leaves re-stage the whole
            # tree on every jitted call (see rl/train.py; ~12 GB/step for
            # full-size FLUX through the tunnel).
            pipeline.transformer_params = jax.device_put(
                pipeline.transformer_params
            )
            pipeline.t5_params = jax.device_put(pipeline.t5_params)
            pipeline.clip_params = jax.device_put(pipeline.clip_params)
            pipeline.vae_params = jax.device_put(pipeline.vae_params)

    @property
    def factor_net(self):
        return self.pipe.factor_net

    def _num_inference_for_step(self, step: int) -> int:
        rng = random.Random(f"{self.config.seed}-{step}")
        return rng.randrange(
            self.config.min_inference_steps, self.config.max_inference_steps
        )

    def _group_rng(self) -> random.Random:
        """Per-step host RNG derived from (seed, global_step) — not a
        stateful stream, so resume replays an uninterrupted run's draws
        exactly (see rl/train.PPOTrainer._group_rng)."""
        return random.Random(f"{self.config.seed}-group-{self.global_step}")

    def train_step(self, batch: Dict[str, np.ndarray]) -> Dict[str, float]:
        """Host batch keys: ``noise`` [B,h,w,16] latent noise, ``latent``
        (teacher final latents) [B,h,w,16], ``ref_image`` [B,H,W,3] in
        [-1,1], ``t5_ids`` [B,S], ``clip_ids`` [B,S]."""
        cfg = self.config
        batch = repeat_random_sample_groups(batch, self._group_rng(), self.num_groups)
        num_inference = self._num_inference_for_step(self.global_step)
        key = jax.random.fold_in(jax.random.key(cfg.seed), self.global_step)
        # distinct streams for the baseline vs policy rollouts: the Euler
        # baseline consumes no randomness today, but sde zoo solvers would
        # silently correlate with the policy rollout on a shared key
        base_key, policy_key = jax.random.split(key)

        t5_ids = jnp.asarray(batch["t5_ids"])
        clip_ids = jnp.asarray(batch["clip_ids"])
        ref_image = jnp.asarray(batch["ref_image"])
        noise = jnp.asarray(batch["noise"])
        target = jnp.asarray(batch["latent"])

        # --- baseline rollouts: naive Euler on ONE sample PER GROUP
        # (:290-300 runs per rank) — row g*gs is every row of group g, so
        # the strided slice is each group's sample ---
        gs = noise.shape[0] // self.num_groups
        base_in = (t5_ids[::gs], clip_ids[::gs], ref_image[::gs], noise[::gs])

        if self.mesh is not None:
            from consolver_tpu.dist import mesh as meshlib

            # group batch shards over the data axis (groups align with the
            # contiguous device shards); the [G]-row baseline batch shards
            # one-per-device when G divides the axis, else replicates
            t5_ids, clip_ids, ref_image, noise, target = meshlib.shard_batch(
                self.mesh, (t5_ids, clip_ids, ref_image, noise, target)
            )
            if self.num_groups % meshlib.data_axis_size(self.mesh) == 0:
                base_in = meshlib.shard_batch(self.mesh, base_in)
            else:
                base_in = meshlib.replicate(self.mesh, base_in)
        # padded_rollout: ONE compiled program each for the policy and the
        # Euler-baseline rollouts across every step count in
        # [min, max_inference_steps) — each per-count compile of the
        # full-size DiT costs ~10 min through the tunnel, x4 counts x2
        # programs without padding (rl/train.TrainConfig.padded_rollout)
        padded = (cfg.max_inference_steps - 1) if cfg.padded_rollout else None
        base_latents, _ = self.pipe(
            base_key, *base_in,
            num_inference_steps=num_inference,
            guidance_scale=cfg.guidance_scale, solver="euler", decode=False,
            padded_max_steps=padded, record=False,
        )

        # --- policy rollout over the group batch ---
        latents, traj = self.pipe(
            policy_key, t5_ids, clip_ids, ref_image, noise,
            num_inference_steps=num_inference,
            guidance_scale=cfg.guidance_scale, solver="fmppo", decode=False,
            padded_max_steps=padded,
        )

        chunk = cfg.decode_chunk
        pred_img = self.pipe.decode_latents(latents, chunk=chunk)
        target_img = self.pipe.decode_latents(target, chunk=chunk)
        base_img = self.pipe.decode_latents(base_latents)

        rewards = self.reward_fn(pred_img, target_img).reshape(-1)
        base_reward = self.reward_fn(base_img, target_img[::gs]).reshape(-1)
        advantages = ppo.baseline_clipped_advantages(
            rewards, base_reward, num_groups=self.num_groups
        )

        conds, actions, old_probs, adv, valid = ppo.flatten_trajectory(
            traj, advantages
        )
        if self.mesh is not None:
            from consolver_tpu.dist import mesh as meshlib

            conds, actions, old_probs, adv, valid = meshlib.shard_batch(
                self.mesh, (conds, actions, old_probs, adv, valid)
            )
        metrics = {}
        for _ in range(cfg.ppo.ppo_epochs):
            self.params, self.opt_state, metrics = self._update(
                self.params, self.opt_state, conds, actions, old_probs, adv,
                valid,
            )
        self.pipe.factor_params = self.params

        if self.dump_samples_to:
            self._dump_samples(pred_img, advantages)

        self.global_step += 1
        out = {k: float(v) for k, v in metrics.items()}
        out.update(
            reward=float(rewards.mean()),
            baseline_reward=float(base_reward.mean()),
            num_inference=num_inference,
        )
        return out

    def _dump_samples(self, images, advantages, limit: int = 4):
        """Per-step JPEG dumps labeled with the advantage
        (edit_ppo/train_ppo.py:404-416)."""
        from consolver_tpu.eval.gen_sweep import save_png

        out_dir = os.path.join(self.dump_samples_to, f"step_{self.global_step}")
        os.makedirs(out_dir, exist_ok=True)
        imgs = np.asarray(images[:limit])
        advs = np.asarray(advantages[:limit])
        for i, (img, a) in enumerate(zip(imgs, advs)):
            save_png(os.path.join(out_dir, f"sample_{i}_adv_{float(a):.3f}.png"), img)
