"""Shared trainer checkpointing: orbax with the reference's "latest"
semantics (checkpoint-{step} dirs, total-limit pruning, resume restoring
global_step — train_ppo.py:290-311,445-449; identical hooks in the edit
trainer, edit_ppo/train_ppo.py:117-133).
"""

from __future__ import annotations

import json
import os
import shutil


class CheckpointMixin:
    """Requires: self.config (output_dir, checkpoints_total_limit),
    self.params, self.opt_state, self.global_step, self.pipe."""

    def fit(self, batches, log_fn=None):
        """Shared training loop: iterate host batches through train_step
        with periodic checkpoints and the param-replication probe.

        On an unexpected failure the current state is checkpointed before
        re-raising, so ``resume_from_checkpoint('latest')`` restarts from
        the failed step (the reference has no such recovery; SURVEY.md §5).
        Every 10th log interval also logs ``param_sum`` — the TPU-native
        version of the reference's DDP param-sum print
        (train_ppo.py:452-455; edit twin edit_ppo/train_ppo.py:404-407).
        """
        from consolver_tpu.dist.mesh import assert_params_synced

        batches = iter(batches)
        # Resumed run: fast-forward the (deterministic) data stream past the
        # batches the interrupted run already consumed — one batch per step
        # — so a resume replays the uninterrupted run exactly (the
        # reference's accelerate resume skips dataloader batches the same
        # way, train_ppo.py:290-311).
        for _ in range(self.global_step):
            next(batches, None)

        try:
            for batch in batches:
                if self.global_step >= self.config.max_train_steps:
                    break
                metrics = self.train_step(batch)
                if self.global_step % self.config.checkpointing_steps == 0:
                    self.save_checkpoint()
                if log_fn and self.global_step % self.config.log_every == 0:
                    if self.global_step % (self.config.log_every * 10) == 0:
                        metrics["param_sum"] = assert_params_synced(self.params)
                    log_fn(self.global_step, metrics)
        except KeyboardInterrupt:
            if self._can_failure_save():
                self.save_checkpoint()
            raise
        except Exception:
            if self._can_failure_save():
                try:
                    self.save_checkpoint()
                except Exception:
                    pass
            raise
        return self.params

    @staticmethod
    def _can_failure_save() -> bool:
        """Failure/interrupt saves run only single-process: save_checkpoint
        enters orbax's coordinated save, which has an internal cross-process
        barrier — if only the failing process reaches it while its peers are
        blocked in the next step's collective, the cluster deadlocks instead
        of surfacing the error.  Multi-host recovery relies on the periodic
        checkpoints, which every process reaches symmetrically."""
        import jax

        return jax.process_count() == 1

    @staticmethod
    def _local_numpy(tree):
        """Materialize a (replicated) array tree to host numpy.  Each host's
        addressable shard of a fully-replicated array holds the complete
        value, so this needs no collective — which is what makes the
        process-0-only orbax save below correct on multi-host meshes
        (saving non-fully-addressable jax.Arrays from one process would
        otherwise raise/hang in orbax's coordinated-save path).  Valid
        because the trained state here is the tiny replicated factor net +
        optimizer (the reference saves the DDP-replicated state dict the
        same way, train_ppo.py:174-190)."""
        import jax
        import numpy as np

        def to_np(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return np.asarray(x.addressable_data(0))
            return np.asarray(x) if isinstance(x, jax.Array) else x

        return jax.tree.map(to_np, tree)

    def save_checkpoint(self) -> str:
        import jax
        import orbax.checkpoint as ocp

        path = os.path.abspath(
            os.path.join(self.config.output_dir, f"checkpoint-{self.global_step}")
        )
        payload = {
            "params": self._local_numpy(self.params),
            "opt_state": self._local_numpy(self.opt_state),
            "global_step": self.global_step,
        }
        # multi-host: EVERY process must enter orbax's coordinated save (it
        # has an internal cross-process barrier — a process-0-only call
        # deadlocks the cluster); orbax's primary_host=0 default makes
        # process 0 the single writer.  Found by tests/test_multihost.py.
        ocp.PyTreeCheckpointer().save(path, payload, force=True)
        if jax.process_index() == 0:
            self._enforce_total_limit()
        return path

    def _enforce_total_limit(self):
        limit = getattr(self.config, "checkpoints_total_limit", None)
        if not limit:
            return
        for d in self._checkpoint_dirs()[:-limit]:
            shutil.rmtree(
                os.path.join(self.config.output_dir, d), ignore_errors=True
            )

    def _checkpoint_dirs(self):
        if not os.path.isdir(self.config.output_dir):
            return []
        dirs = [
            d for d in os.listdir(self.config.output_dir)
            if d.startswith("checkpoint-")
        ]
        return sorted(dirs, key=lambda d: int(d.split("-")[1]))

    def resume_from_checkpoint(self, which: str = "latest") -> bool:
        import orbax.checkpoint as ocp

        if which == "latest":
            dirs = self._checkpoint_dirs()
            if not dirs:
                return False
            path = os.path.join(self.config.output_dir, dirs[-1])
        else:
            path = which
        restored = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(path),
            item={
                "params": self.params,
                "opt_state": self.opt_state,
                "global_step": 0,
            },
        )
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.global_step = int(restored["global_step"])
        self.pipe.factor_params = self.params
        return True

    def save_pretrained(self, output_dir: str) -> str:
        """Final policy export: factor-net params + config json (the
        reference's save_pretrained / model.ckpt, train_ppo.py:466-469).
        Loadable via orbax restore + FactorNetConfig(**json).  The config
        json (a raw host write) is process-0-gated; the orbax save itself
        must run on every process."""
        import dataclasses

        import jax
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(output_dir, "factor_net"))
        payload = self._local_numpy(self.params)
        # all processes join the coordinated save; orbax writes from
        # primary host 0 only (see save_checkpoint)
        ocp.PyTreeCheckpointer().save(path, payload, force=True)
        if jax.process_index() != 0:
            return path
        net = self.pipe.factor_net
        cfg = getattr(net, "config", None)
        if cfg is not None:
            with open(os.path.join(output_dir, "factor_net_config.json"), "w") as f:
                json.dump(dataclasses.asdict(cfg), f, indent=2)
        return path
