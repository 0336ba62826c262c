"""The PPO trainer: rollout -> decode -> reward -> advantage -> update.

TPU-native rebuild of train_ppo.py:45-469 (SD) / edit_ppo/train_ppo.py
(FLUX baseline-clip variant).  Differences by design:

  * the rollout + decode + reward + advantage path is jit-compiled per
    inference-step count (the reference randomizes num_inference in [2, 16)
    per step, train_ppo.py:345 — here each count compiles once and caches);
  * the per-step inference count is drawn from a host RNG keyed by
    (seed, global_step), so every data-parallel host computes the same count
    with NO collective — replacing accelerate broadcast
    (edit_ppo/train_ppo.py:275-283);
  * checkpoint/resume via orbax with the reference's "latest" semantics
    (checkpoint-{step} dirs, train_ppo.py:290-311,445-449).
"""

from __future__ import annotations

import dataclasses
import os
import random
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from consolver_tpu.data.group import repeat_random_sample_groups
from consolver_tpu.models.vae import decode_latents
from consolver_tpu.pipelines.t2i import TextToImagePipeline
from consolver_tpu.rl import ppo
from consolver_tpu.rl.ppo import PPOConfig


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    max_train_steps: int = 3001
    guidance_scale: float = 3.0
    min_inference_steps: int = 2
    max_inference_steps: int = 16  # exclusive, like random.choice(range(2, 16))
    seed: int = 0
    output_dir: str = "runs/ppo"
    checkpointing_steps: int = 500
    checkpoints_total_limit: Optional[int] = None
    log_every: int = 10
    # ONE padded rollout program (pipelines/t2i.make_padded_denoise_fn)
    # instead of a compiled program per inference-step count.  Measured on
    # the real chip (scripts/probe_padded.py, SD-1.5 bf16 batch 8): per-count
    # ~80s compile x14 = 18.5 min warmup, steady 122ms/step; padded 2 min
    # warmup but flat 1825ms (= max_steps) per rollout -> break-even ~1300
    # train steps.  Production runs 3001 steps (run_ppo.sh), so per-count is
    # the default; turn this on for short runs/sweeps (< ~1300 steps).
    padded_rollout: bool = False
    # Group count for the GRPO batch: the reference's DDP run forms one
    # independent prompt group PER RANK (each rank's repeat_random_sample +
    # its own advantage normalization, train_ppo.py:337,376 /
    # edit_ppo/train_ppo.py:258-326).  None = one group per data shard when
    # a mesh is present, else 1.
    num_groups: Optional[int] = None
    # micro-batch the VAE decodes inside the jitted reward program (lax.map
    # over chunks — the reference decodes in micro-batches of 8,
    # utils.py:6-34).  None = whole-batch fused decode; the production
    # batch-80 512^2 step needs a chunk (whole-batch OOMs one 16GB chip).
    decode_chunk: Optional[int] = None
    ppo: PPOConfig = dataclasses.field(default_factory=PPOConfig)


from consolver_tpu.rl.checkpointing import CheckpointMixin


class PPOTrainer(CheckpointMixin):
    """Single- or multi-host PPO trainer over a :class:`TextToImagePipeline`
    whose scheduler is the learnable solver (factor_net attached)."""

    def __init__(
        self,
        pipeline: TextToImagePipeline,
        reward_fn: Callable[[jax.Array, jax.Array], jax.Array],
        config: TrainConfig,
        mesh=None,
    ):
        if pipeline.factor_net is None:
            raise ValueError("PPOTrainer needs a pipeline with a factor_net")
        self.pipe = pipeline
        self.reward_fn = reward_fn
        self.config = config
        self.mesh = mesh

        from consolver_tpu.dist.mesh import resolve_num_groups

        self.num_groups = resolve_num_groups(config.num_groups, mesh)

        self.factor_net = pipeline.factor_net
        self.params = pipeline.factor_params
        self.optimizer = ppo.make_optimizer(config.ppo)
        self.opt_state = self.optimizer.init(self.params)
        self.global_step = 0
        update = ppo.make_update_fn(self.factor_net, self.optimizer, config.ppo)
        if mesh is not None:
            # data-parallel: rollout and PPO batches shard over the mesh's
            # data axis, all params replicate; XLA inserts the gradient psum
            from consolver_tpu.dist import mesh as meshlib

            self._update = meshlib.data_parallel_jit(
                update, mesh, batch_argnums=(2, 3, 4, 5, 6)
            )
            self.params = meshlib.replicate(mesh, self.params)
            self.opt_state = meshlib.replicate(mesh, self.opt_state)
            self.pipe.factor_params = self.params
            self.pipe.unet_params = meshlib.replicate(mesh, self.pipe.unet_params)
            self.pipe.text_params = meshlib.replicate(mesh, self.pipe.text_params)
            self.pipe.vae_params = meshlib.replicate(mesh, self.pipe.vae_params)
        else:
            self._update = jax.jit(update)
            # Single chip: pin the model trees on device ONCE.  An
            # orbax-restored tree is host numpy, and host-numpy leaves
            # re-stage the whole tree through the (tunneled) transfer path
            # on EVERY jitted call — measured ~100 s/step vs 13 s for the
            # full-size SD stack (the same pitfall probe_train_edit_tpu
            # found for serving in round 2).
            self.pipe.unet_params = jax.device_put(self.pipe.unet_params)
            self.pipe.text_params = jax.device_put(self.pipe.text_params)
            self.pipe.vae_params = jax.device_put(self.pipe.vae_params)
        if getattr(reward_fn, "host_side", False):
            # VLM-judge rewards are host callables (registry.make_reward_fn
            # marks them): jit only the decodes, score eagerly
            self._decode_and_reward = self._decode_and_reward_host
            self._decode = jax.jit(
                lambda vp, lat: decode_latents(
                    self.pipe.vae, vp, lat, chunk=config.decode_chunk
                )
            )
        else:
            self._decode_and_reward = jax.jit(self._decode_and_reward_impl)

    def _group_rng(self) -> random.Random:
        """Per-step host RNG for the group repeat draw, derived from
        (seed, global_step) like :meth:`_num_inference_for_step` — NOT a
        stateful stream, so a resumed run replays the exact draws of an
        uninterrupted one (train_ppo.py:290-311 resume semantics) and every
        data-parallel host agrees without a broadcast."""
        return random.Random(f"{self.config.seed}-group-{self.global_step}")

    # ------------------------------------------------------------------
    def _decode_and_reward_impl(self, vae_params, pred_latents, target_latents):
        chunk = self.config.decode_chunk
        pred = decode_latents(self.pipe.vae, vae_params, pred_latents, chunk=chunk)
        target = decode_latents(
            self.pipe.vae, vae_params, target_latents, chunk=chunk
        )
        rewards = self.reward_fn(pred, target)
        adv = ppo.group_advantages(
            rewards.reshape(-1), self.config.ppo.advantage_scale,
            num_groups=self.num_groups,
        )
        return rewards, adv

    def _decode_and_reward_host(self, vae_params, pred_latents, target_latents):
        """Eager variant for host-side (VLM-judge) reward callables
        (reward_model.py:259-317 runs its judges on host too)."""
        pred = self._decode(vae_params, pred_latents)
        target = self._decode(vae_params, target_latents)
        rewards = self.reward_fn(pred, target)
        adv = ppo.group_advantages(
            rewards.reshape(-1), self.config.ppo.advantage_scale,
            num_groups=self.num_groups,
        )
        return rewards, adv

    def _num_inference_for_step(self, step: int) -> int:
        """Deterministic per-step draw: every host computes the same count
        (replaces the rank-0 broadcast, edit_ppo/train_ppo.py:275-283)."""
        rng = random.Random(f"{self.config.seed}-{step}")
        return rng.randrange(
            self.config.min_inference_steps, self.config.max_inference_steps
        )

    # ------------------------------------------------------------------
    def train_step(self, batch: Dict[str, np.ndarray]) -> Dict[str, float]:
        """One PPO step on a host batch with keys ``noise`` [B, h, w, c],
        ``latent`` (teacher final latent) [B, h, w, c], and ``prompt_ids``
        [B, S]  (group-repeat happens here, train_ppo.py:337)."""
        cfg = self.config
        batch = repeat_random_sample_groups(batch, self._group_rng(), self.num_groups)
        num_inference = self._num_inference_for_step(self.global_step)

        if self.mesh is not None:
            from consolver_tpu.dist import mesh as meshlib

            batch = meshlib.shard_batch(
                self.mesh, {k: jnp.asarray(v) for k, v in batch.items()}
            )
        prompt_ids = jnp.asarray(batch["prompt_ids"])
        uncond_ids = (
            jnp.asarray(batch["uncond_ids"])
            if "uncond_ids" in batch
            else self.pipe.uncond_ids_for(prompt_ids)
        )
        context, uncond_context = self.pipe._encode(
            self.pipe.text_params, prompt_ids, uncond_ids
        )

        key = jax.random.fold_in(jax.random.key(cfg.seed), self.global_step)
        if cfg.padded_rollout:
            from consolver_tpu.pipelines.t2i import padded_ladder

            max_steps = cfg.max_inference_steps - 1  # exclusive upper bound
            denoise = self.pipe.padded_denoise_fn(max_steps, cfg.guidance_scale)
            ladder = padded_ladder(
                self.pipe.schedule, num_inference, max_steps,
                self.pipe.timestep_spacing, self.pipe.steps_offset,
            )
            latents, traj = denoise(
                self.pipe.unet_params, self.params, key,
                jnp.asarray(batch["noise"]), context, uncond_context, *ladder,
            )
        else:
            denoise = self.pipe.denoise_fn(num_inference, cfg.guidance_scale)
            latents, traj = denoise(
                self.pipe.unet_params,
                self.params,
                key,
                jnp.asarray(batch["noise"]),
                context,
                uncond_context,
            )

        rewards, advantages = self._decode_and_reward(
            self.pipe.vae_params, latents, jnp.asarray(batch["latent"])
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
        self.global_step += 1
        out = {k: float(v) for k, v in metrics.items()}
        out["reward"] = float(rewards.mean())
        out["num_inference"] = num_inference
        return out

    # fit() — the shared training loop with failure checkpointing and the
    # replication probe — comes from CheckpointMixin.
