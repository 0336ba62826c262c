#!/usr/bin/env python
"""Eval-day rehearsal at real scale on the chip (VERDICT r4 #4).

Drives the full BASELINE.md reproduction chain once, at real SD-1.5 model
size (converted random-weight checkpoint), recording throughput and wall
time per stage, so the eval harness has perf numbers BEFORE weights day:

  1. prepare  — full-size converted ckpt at ckpts/sd15 (unet+vae from
                scripts/make_bench_ckpt.py; a real transformers
                CLIPTextModel at the SD-1.5 config converted through
                scripts/convert_checkpoints.py), plus random-weight
                DINOv2-base and InceptionV3 encoder trees for the metric
                stages.
  2. teacher  — 40-step multistep-dpm sweep over N synthetic prompts
                (the reference's teacher dir, gen.sh:1-35).
  3. sweep    — zoo solvers x {5, 8} steps over the SAME prompts
                (gen_ppo.py:118-169 solver list), per-config compile time
                and steady img/s.
  4. metrics  — eval/consistency.py of every sweep dir vs the teacher dir
                (image_psnr batched on device; one DINOv2-cosine run on
                the flagship dir), then eval/fid.py with the real
                InceptionV3 pool3 2048-d feature path
                (compute_reward.sh + fid_test.py).

  python scripts/drive_eval.py [--prompts 256] [--out EVAL_r05.json]
      [--root /tmp/drive_eval] [--ckpt ckpts/sd15]

Generation timing uses record=False inference programs (no RL trajectory),
matching what gen_ppo.py measures.  One v5e chip: ~19 denoise compiles
(~30-50 min through the tunnel, persistent-cached) + ~15 min of steady
generation at the default 256 prompts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SWEEP_SOLVERS = (
    "consistencysolver", "ddim", "ipndm", "unipc", "deis", "multistep-dpm",
    "amed", "dmd2", "sde-dpmsolver++",
)

# AMED's learned schedules exist only at the published NFE counts
# (solver_zoo.AMED_SCHEDULES, gen_ppo.py:24-52); snap to the nearest
AMED_STEPS = (4, 6, 8, 10, 14)


def valid_steps(solver_name: str, steps: int) -> int:
    if solver_name == "amed":
        return min(AMED_STEPS, key=lambda s: (abs(s - steps), s))
    return steps


def run_cli(module, argv):
    old = sys.argv
    sys.argv = [module.__name__] + argv
    try:
        module.main()
    finally:
        sys.argv = old


def prepare(ckpt_root: str, enc_root: str):
    """Ensure the full-size converted SD stack + random encoder trees."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    cpu = jax.devices("cpu")[0]
    if not os.path.isdir(os.path.join(ckpt_root, "unet")):
        # subprocess, NOT run_cli: make_bench_ckpt pins jax_platforms=cpu
        # process-wide, which would silently demote this process's TPU
        # session to the host CPU
        import subprocess

        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "make_bench_ckpt.py"),
             "--dst", ckpt_root],
            check=True, env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )

    if not os.path.isdir(os.path.join(ckpt_root, "clip_text")):
        # a REAL transformers CLIPTextModel at the SD-1.5 config (random
        # init), converted through the production CLI — true hub key names
        import tempfile

        import torch
        from safetensors.numpy import save_file
        from transformers import CLIPTextConfig as HfClipConfig, CLIPTextModel

        from consolver_tpu.models.clip_text import ClipTextConfig
        from scripts import convert_checkpoints

        tcfg = ClipTextConfig.sd15()
        torch.manual_seed(0)
        hf = CLIPTextModel(
            HfClipConfig(
                vocab_size=tcfg.vocab_size, hidden_size=tcfg.hidden_size,
                num_hidden_layers=tcfg.num_layers,
                num_attention_heads=tcfg.num_heads,
                intermediate_size=tcfg.intermediate_size,
                max_position_embeddings=tcfg.max_position_embeddings,
                hidden_act="quick_gelu",
            )
        )
        sd = {k: v.numpy().astype(np.float32)
              for k, v in hf.state_dict().items() if "position_ids" not in k}
        with tempfile.TemporaryDirectory() as tmp:
            save_file(sd, os.path.join(tmp, "model.safetensors"))
            run_cli(convert_checkpoints, [
                "--kind", "clip_text", "--src", tmp,
                "--dst", os.path.join(ckpt_root, "clip_text"),
                "--config", "sd15",
            ])
        print(f"prepared {ckpt_root}/clip_text", flush=True)

    from bench import random_params_like

    specs = {}
    if not os.path.isdir(os.path.join(enc_root, "dino")):
        from consolver_tpu.models.vit import ViT, ViTConfig

        cfg = ViTConfig.dinov2_base()
        specs["dino"] = jax.eval_shape(
            ViT(cfg).init, jax.random.key(0), jnp.zeros((1, 224, 224, 3))
        )
    if not os.path.isdir(os.path.join(enc_root, "inception")):
        from consolver_tpu.models.inception import InceptionV3

        specs["inception"] = jax.eval_shape(
            InceptionV3().init, jax.random.key(0), jnp.zeros((1, 299, 299, 3))
        )
    with jax.default_device(cpu):
        for i, (name, shapes) in enumerate(specs.items()):
            params = random_params_like(shapes, 40 + i, jnp.float32)
            params = jax.tree.map(np.asarray, params)
            ocp.PyTreeCheckpointer().save(
                os.path.abspath(os.path.join(enc_root, name)), params)
            print(f"prepared {enc_root}/{name}", flush=True)


class TimedGen:
    """Wrap a generate_batch closure, recording per-call durations."""

    def __init__(self, fn):
        self.fn, self.calls = fn, []

    def __call__(self, key, prompts):
        t0 = time.perf_counter()
        out = self.fn(key, prompts)
        np.asarray(out)  # force host materialization into the timing
        self.calls.append(time.perf_counter() - t0)
        return out

    def stats(self, batch_size):
        steady = self.calls[1:] or self.calls
        med = float(np.median(steady))
        return {
            "batches": len(self.calls),
            "first_call_s": round(self.calls[0], 3),
            "compile_s_est": round(self.calls[0] - med, 3),
            "steady_batch_s": round(med, 4),
            "steady_img_per_s": round(batch_size / med, 3),
        }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompts", type=int, default=256)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--teacher-steps", type=int, default=40)
    ap.add_argument("--sweep-steps", type=int, nargs="+", default=[5, 8])
    ap.add_argument("--solvers", nargs="+", default=list(SWEEP_SOLVERS))
    ap.add_argument("--root", default="/tmp/drive_eval")
    ap.add_argument("--ckpt", default="ckpts/sd15")
    ap.add_argument("--out", default="EVAL_r05.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_compilation_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    enc_root = os.path.join(args.root, "encoders")
    prepare(args.ckpt, enc_root)

    from consolver_tpu.configs.config import ExperimentConfig, apply_overrides
    from consolver_tpu.data.tokenizer import load_tokenizer, tokenize_batch
    from consolver_tpu.eval.consistency import evaluate_consistency, _load_image
    from consolver_tpu.eval import fid as fid_lib
    from consolver_tpu.eval.gen_sweep import generate_sweep
    from consolver_tpu.models.vae import decode_latents
    from consolver_tpu.policy import FactorNet
    from consolver_tpu.rewards.registry import (
        RewardModel, build_encoder_for, make_reward_fn,
    )
    from scripts.train_sd15 import build_pipeline, load_orbax

    cfg = ExperimentConfig.sd15_ppo()
    cfg = apply_overrides(cfg, {"model.pretrained_path": args.ckpt})
    fnet = FactorNet(cfg.factor_net)
    pipe = build_pipeline(cfg, fnet, fnet.init(jax.random.key(0)))
    pipe.unet_params = jax.device_put(pipe.unet_params)
    pipe.text_params = jax.device_put(pipe.text_params)
    pipe.vae_params = jax.device_put(pipe.vae_params)
    pipe.factor_params = jax.device_put(pipe.factor_params)
    tokenizer = load_tokenizer(None)

    prompts = [f"a photo of scene number {i}, highly detailed" for i in
               range(args.prompts)]

    def make_gen(solver_name, steps):
        def generate_batch(key, batch_prompts):
            ids = jnp.asarray(tokenize_batch(
                tokenizer, batch_prompts, 77,
                vocab_size=pipe.text_encoder.cfg.vocab_size))
            noise = jax.random.normal(key, (len(batch_prompts), 64, 64, 4))
            images, _ = pipe(key, ids, noise, steps, cfg.train.guidance_scale,
                             solver=solver_name, record=False)
            return images

        return TimedGen(generate_batch)

    report = {
        "config": {
            "prompts": args.prompts, "batch_size": args.batch_size,
            "resolution": 512, "model": "converted SD-1.5 stack "
            "(859.5M UNet + 83.7M VAE + 123M CLIP-text, random weights)",
            "hardware": "one v5e chip via tunnel",
            "chain": "gen.sh + compute_reward.sh + fid_test.py equivalent",
        },
        "sweep": {},
        "consistency": {},
    }
    wall0 = time.monotonic()

    # stage-level resume: each completed stage's row lands in
    # root/progress.json immediately, so a crash (or a per-solver
    # step-validity error) doesn't forfeit the hours of remote compiles
    # and generation already done — the rerun replays recorded rows and
    # continues from the first missing stage
    progress_path = os.path.join(args.root, "progress.json")
    done = {}
    if os.path.exists(progress_path):
        with open(progress_path) as f:
            done = json.load(f)
        print(f"resuming past {len(done)} recorded stages", flush=True)

    def record(stage, row):
        done[stage] = row
        with open(progress_path, "w") as f:
            json.dump(done, f, indent=2)
        print(f"{stage}: {row}", flush=True)
        return row

    def dir_complete(d):
        import glob

        return len(glob.glob(os.path.join(d, "*.png"))) >= args.prompts

    # -- teacher -----------------------------------------------------------
    teacher_dir = os.path.join(args.root, "teacher")
    if "teacher" in done and dir_complete(teacher_dir):
        report["teacher"] = done["teacher"]
    else:
        gen = make_gen("multistep-dpm", args.teacher_steps)
        t0 = time.monotonic()
        generate_sweep(gen, prompts, teacher_dir, args.batch_size, seed=0)
        report["teacher"] = record("teacher", {
            "solver": "multistep-dpm", "steps": args.teacher_steps,
            "wall_s": round(time.monotonic() - t0, 1),
            **gen.stats(args.batch_size),
        })

    # -- solver sweep ------------------------------------------------------
    sweep_dirs = {}
    for solver_name in args.solvers:
        for steps in args.sweep_steps:
            steps = valid_steps(solver_name, steps)
            name = f"{solver_name}-{steps}"
            if name in sweep_dirs:
                continue  # step snapping can collide (amed 5 -> 4)
            d = os.path.join(args.root, "sweep", name)
            sweep_dirs[name] = d
            if name in done and dir_complete(d):
                report["sweep"][name] = done[name]
                continue
            gen = make_gen(solver_name, steps)
            t0 = time.monotonic()
            generate_sweep(gen, prompts, d, args.batch_size, seed=0)
            report["sweep"][name] = record(name, {
                "wall_s": round(time.monotonic() - t0, 1),
                **gen.stats(args.batch_size),
            })

    # -- consistency (psnr all dirs; dino on the flagship) ------------------
    psnr_fn = make_reward_fn("image_psnr")
    for name, d in sweep_dirs.items():
        ckey = f"consistency/{name}"
        if ckey in done:
            report["consistency"][name] = done[ckey]
            continue
        t0 = time.monotonic()
        stats = evaluate_consistency(psnr_fn, d, teacher_dir, batch_size=32)
        report["consistency"][name] = record(ckey, {
            "reward": "image_psnr", "wall_s": round(time.monotonic() - t0, 1),
            "pairs_per_s": round(stats["num_scored"] / (time.monotonic() - t0), 1),
            "mean": stats["mean"], "num_scored": stats["num_scored"],
            "num_errors": stats["num_errors"],
        })

    flagship = f"consistencysolver-{args.sweep_steps[-1]}"
    if flagship not in sweep_dirs:  # --solvers without consistencysolver
        flagship = next(iter(sweep_dirs))
    dino_fn = make_reward_fn(
        "dino",
        RewardModel(encode=build_encoder_for(
            "dino", load_orbax(os.path.join(enc_root, "dino")))),
    )
    if "consistency/dino" in done:
        report["consistency"][flagship + "+dino"] = done["consistency/dino"]
    else:
        t0 = time.monotonic()
        stats = evaluate_consistency(dino_fn, sweep_dirs[flagship],
                                     teacher_dir, batch_size=32,
                                     size=(224, 224))
        report["consistency"][flagship + "+dino"] = record("consistency/dino", {
            "reward": "dino (DINOv2-base CLS cosine, random weights)",
            "wall_s": round(time.monotonic() - t0, 1),
            "pairs_per_s": round(stats["num_scored"] / (time.monotonic() - t0), 1),
            "mean": stats["mean"], "num_scored": stats["num_scored"],
            "num_errors": stats["num_errors"],
        })

    # -- FID (real InceptionV3 pool3 2048-d path) ---------------------------
    from consolver_tpu.models.inception import InceptionV3, make_inception_encoder

    encode = make_inception_encoder(
        InceptionV3(), load_orbax(os.path.join(enc_root, "inception")))

    def stream(d):
        import glob

        files = sorted(glob.glob(os.path.join(d, "*.png")))
        for start in range(0, len(files), 32):
            yield np.stack([_load_image(p, (256, 256))
                            for p in files[start:start + 32]])

    if "fid" in done:
        report["fid"] = done["fid"]
    else:
        t0 = time.monotonic()
        fid_value = fid_lib.compute_fid(encode, stream(sweep_dirs[flagship]),
                                        stream(teacher_dir))
        report["fid"] = record("fid", {
            "generated": flagship, "reference": "teacher",
            "encoder": "InceptionV3 pool3 2048-d (random weights)",
            "value": round(float(fid_value), 4),
            "wall_s": round(time.monotonic() - t0, 1),
            "images_per_s": round(2 * args.prompts / (time.monotonic() - t0), 1),
        })

    report["total_wall_s"] = round(time.monotonic() - wall0, 1)
    out_path = os.path.join(REPO, args.out)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out_path} (total {report['total_wall_s']}s)")


if __name__ == "__main__":
    main()
