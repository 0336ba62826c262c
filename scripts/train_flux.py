#!/usr/bin/env python
"""FLUX-Kontext editing ConsistencySolver PPO training entrypoint.

TPU-native equivalent of edit_ppo/run_ppo.sh -> edit_ppo/train_ppo.py.

  python scripts/train_flux.py --preset flux_ppo \
      --set model.pretrained_path=ckpts/flux \
      --set data.train_data_dir=data/teacher/flux

Checkpoint layout under pretrained_path: transformer/ t5/ clip_text/ vae/
(orbax trees from scripts/convert_checkpoints.py).  Without it the loop
runs in tiny-random smoke mode.
"""

from __future__ import annotations

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon TPU plugin ignores the plain env override; CPU smoke runs
    # need the config pin (see scripts/train_sd15.py)
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def load_orbax(path):
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))


def build_pipeline(cfg, factor_net, factor_params):
    from consolver_tpu.models.clip_text import ClipTextConfig, ClipTextEncoder
    from consolver_tpu.models.flux import FluxConfig, FluxTransformer
    from consolver_tpu.models.t5 import T5Config, T5Encoder
    from consolver_tpu.models.vae import AutoencoderKL, VaeConfig
    from consolver_tpu.pipelines.edit import FluxKontextPipeline

    dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32
    pretrained = cfg.model.pretrained_path
    if pretrained:
        from scripts.train_sd15 import load_model_config

        # per-component _config.json (convert_checkpoints.py) overrides the
        # full-size defaults — also how int8 serving checkpoints
        # (quantize_checkpoint.py writes quant_int8: true) load directly
        transformer = FluxTransformer(
            load_model_config(os.path.join(pretrained, "transformer"),
                              FluxConfig, FluxConfig.flux_kontext()),
            dtype=dtype,
        )
        t5 = T5Encoder(
            load_model_config(os.path.join(pretrained, "t5"), T5Config,
                              T5Config.xxl()),
            dtype=dtype,
        )
        clip = ClipTextEncoder(
            load_model_config(os.path.join(pretrained, "clip_text"),
                              ClipTextConfig, ClipTextConfig.sd15()),
            dtype=dtype,
        )
        vae = AutoencoderKL(
            load_model_config(
                os.path.join(pretrained, "vae"), VaeConfig,
                VaeConfig(latent_channels=16, scaling_factor=0.3611),
            ),
            dtype=dtype,
        )
        from consolver_tpu.utils.trees import cast_floating

        def load_cast(sub, mcfg):
            params = load_orbax(os.path.join(pretrained, sub))
            # quantized serving checkpoints load VERBATIM (scales/biases
            # must stay bit-identical to in-memory .quantize());
            # float checkpoints cast to model.dtype like the reference's
            # weight_dtype cast (train_ppo.py:156-165)
            if getattr(mcfg, "quant_int8", False) or getattr(
                mcfg, "quant_int4", False
            ):
                return params
            return cast_floating(params, dtype)

        return FluxKontextPipeline(
            transformer, load_cast("transformer", transformer.cfg),
            t5, load_cast("t5", t5.cfg),
            clip, load_cast("clip_text", clip.cfg),
            vae, load_cast("vae", vae.cfg),
            factor_net=factor_net, factor_params=factor_params,
        )

    print("[smoke mode] no pretrained_path: tiny random models")
    fcfg = FluxConfig.tiny()
    transformer = FluxTransformer(fcfg)
    k = jax.random.split(jax.random.key(0), 8)
    s_txt = 8
    t5 = T5Encoder(T5Config(vocab_size=64, d_model=fcfg.joint_text_dim, d_kv=8,
                            d_ff=64, num_layers=1, num_heads=4))
    clip = ClipTextEncoder(ClipTextConfig(
        vocab_size=64, hidden_size=fcfg.pooled_text_dim, num_layers=1,
        num_heads=2, intermediate_size=32))
    vae = AutoencoderKL(VaeConfig(block_out_channels=(8, 16), layers_per_block=1,
                                  norm_num_groups=4, latent_channels=4))
    img = jnp.zeros((1, 32, fcfg.in_channels))
    # jitted inits: eager flax .init dispatches hundreds of per-op compiles,
    # each a serialized RPC on the tunneled TPU (minutes)
    tr_params = jax.jit(transformer.init)(
        k[0], img, jnp.zeros((1, s_txt, fcfg.joint_text_dim)),
        jnp.zeros((1, fcfg.pooled_text_dim)), jnp.ones((1,)), jnp.ones((1,)),
        jnp.zeros((32, 3)), jnp.zeros((s_txt, 3)),
    )
    return FluxKontextPipeline(
        transformer, tr_params,
        t5, jax.jit(t5.init)(k[1], jnp.zeros((1, s_txt), jnp.int32)),
        clip, jax.jit(clip.init)(k[2], jnp.zeros((1, s_txt), jnp.int32)),
        vae, jax.jit(vae.init)(k[3], jnp.zeros((1, 16, 16, 3)), k[4]),
        factor_net=factor_net, factor_params=factor_params,
    )


def maybe_quantize_rollout(pipe, cfg):
    """model.quantize_rollout: swap the FROZEN rollout DiT + VAE decoder to
    the quantized path (model.quantize_bits: 8 = W8A8 speed, 4 = packed
    int4 memory).  Skipped when the checkpoint is already a quantized
    serving tree (its _config.json sets quant_int8/int4)."""
    if not cfg.model.quantize_rollout:
        return pipe
    tcfg = pipe.transformer.cfg
    if tcfg.quant_int8 or tcfg.quant_int4:
        return pipe
    return pipe.quantize(bits=cfg.model.quantize_bits)


def main():
    from consolver_tpu.configs.config import parse_cli
    from consolver_tpu.data.group import TeacherDataset
    from consolver_tpu.policy import FactorNet
    from consolver_tpu.rl.train_edit import EditPPOTrainer
    from consolver_tpu.utils.logging import MetricLogger
    from scripts.train_sd15 import build_reward

    from consolver_tpu.dist import mesh as meshlib

    cfg = parse_cli()
    fnet = FactorNet(cfg.factor_net)
    fparams = fnet.init(jax.random.key(cfg.train.seed))
    pipe = maybe_quantize_rollout(build_pipeline(cfg, fnet, fparams), cfg)
    reward_fn = build_reward(cfg)

    # topology from config (edit_ppo/run_ppo.sh:5 runs 8-way DDP): one
    # prompt group + one Euler baseline per data shard, grads psum-averaged
    mesh = meshlib.mesh_from_config(
        cfg.dist.data_parallel, cfg.dist.model_parallel
    )
    trainer = EditPPOTrainer(
        pipe, reward_fn, cfg.train, mesh=mesh,
        dump_samples_to=os.path.join(cfg.train.output_dir, "samples"),
    )
    trainer.resume_from_checkpoint("latest")
    logger = MetricLogger(cfg.train.output_dir, config=dataclasses.asdict(cfg))
    dataset = TeacherDataset(cfg.data.train_data_dir)
    # data.batch_size is PER SHARD (10/process in edit_ppo/run_ppo.sh);
    # global batch = per-shard x shards (80 at the production topology)
    global_batch = cfg.data.batch_size * (
        meshlib.data_axis_size(mesh) if mesh is not None else 1
    )

    def batches():
        epoch = 0
        while True:
            yield from dataset.batches(
                global_batch, seed=epoch, shuffle=cfg.data.shuffle
            )
            epoch += 1

    trainer.fit(batches(), log_fn=logger.log)
    trainer.save_checkpoint()
    logger.close()


if __name__ == "__main__":
    main()
