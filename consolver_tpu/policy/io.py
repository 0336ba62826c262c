"""Policy checkpoint IO, shared by the generation CLIs and the serving
engines' hot-reload path.

The reference's product loop trains a FactorNet checkpoint every N steps
(train_ppo.py:445-449) and generation loads it into the scheduler with
CLI-provided dims (gen_ppo.py:189-195); here the dims ride WITH the
checkpoint (a ``factor_net_config.json`` sidecar) so a load can never
silently mismatch the trained grid.
"""

from __future__ import annotations

import json
import os


def load_orbax(path):
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))


def load_factor_ckpt(path, default_cfg):
    """Restore a trained policy for generation (gen_ppo.py:189-195 loads
    model.ckpt with CLI-provided dims; the reference's gen.sh uses e.g.
    --factor_num_actions=21 while training used 11 — the dims are a
    checkpoint property).  Returns (FactorNetConfig, params).

    Accepts either a trainer ``checkpoint-{step}`` dir (payload holds
    "params") or a ``save_pretrained`` export (bare params with a
    ``factor_net_config.json`` beside it, rl/checkpointing.py:150-155);
    the json, when present next to the ckpt or in its parent, overrides
    ``default_cfg`` so generation can't silently mismatch the trained
    dims."""
    from consolver_tpu.policy import FactorNetConfig

    cfg = default_cfg
    candidates = (
        # converter sidecar (collision-free sibling name)
        path.rstrip("/") + "_factor_net_config.json",
        # save_pretrained layout: output_dir/factor_net + the json beside it
        os.path.join(path, "factor_net_config.json"),
        os.path.join(os.path.dirname(path.rstrip("/")),
                     "factor_net_config.json"),
    )
    for cfg_path in candidates:
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = FactorNetConfig(**json.load(f))
            break
    restored = load_orbax(path)
    # trainer checkpoint payloads carry opt_state/global_step next to
    # "params"; a bare export/conversion IS the flax tree (whose top-level
    # key is also "params" — do not strip it)
    if isinstance(restored, dict) and "opt_state" in restored:
        return cfg, restored["params"]
    return cfg, restored
