#!/usr/bin/env python
"""End-to-end dry run of the real-weight validation chain (VERDICT r1 #10):

  hub-layout state dicts --> scripts/convert_checkpoints.py --> orbax ckpts
  --> scripts/generate.py (teacher sweep + consistencysolver sweep)
  --> scripts/evaluate.py consistency + fid

using locally-synthesized random-weight models at tiny sizes (a REAL
transformers CLIPTextModel for the text encoder; hub-layout UNet/VAE state
dicts inverted from our init trees).  Proves that the day real checkpoints
appear, the BASELINE.md table reproduction (gen.sh:1-35, compute_reward.sh,
fid_test.py:11-16) is one command per step — the exact commands are printed
at the end.

  python scripts/selftest_eval.py [--workdir DIR] [--keep]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the chain must run anywhere (zero egress, no TPU): force CPU before jax
# initializes (needs BOTH the env var and the config flag under the ambient
# TPU plugin)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

if os.environ["JAX_PLATFORMS"] == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def run_cli(module, argv):
    """Run a scripts/ CLI main() in-process with the given argv."""
    old = sys.argv
    sys.argv = [module.__name__] + argv
    try:
        module.main()
    finally:
        sys.argv = old


def synthesize_sources(src_root: str):
    """Write tiny random hub-layout checkpoints for unet/vae/clip_text."""
    from safetensors.numpy import save_file

    from scripts.selftest_conversion import tree_to_torch_sd
    from consolver_tpu.models.unet_2d import UNetConfig, UNet2DCondition
    from consolver_tpu.models.vae import AutoencoderKL, VaeConfig

    rng = np.random.default_rng(0)

    ucfg = UNetConfig.tiny()
    unet = UNet2DCondition(ucfg)
    init = jax.eval_shape(
        unet.init, jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 4, ucfg.cross_attention_dim)),
    )["params"]
    sd = tree_to_torch_sd(init, "unet")
    sd = {k: rng.standard_normal(v.shape).astype(np.float32) * 0.05 for k, v in sd.items()}
    os.makedirs(os.path.join(src_root, "unet"), exist_ok=True)
    save_file(sd, os.path.join(src_root, "unet", "diffusion_pytorch_model.safetensors"))

    vcfg = VaeConfig.tiny()
    vae = AutoencoderKL(vcfg)
    vinit = jax.eval_shape(
        vae.init, jax.random.key(0), jnp.zeros((1, 16, 16, 3)), jax.random.key(1)
    )["params"]
    vsd = tree_to_torch_sd(vinit, "vae")
    vsd = {k: rng.standard_normal(v.shape).astype(np.float32) * 0.05 for k, v in vsd.items()}
    os.makedirs(os.path.join(src_root, "vae"), exist_ok=True)
    save_file(vsd, os.path.join(src_root, "vae", "diffusion_pytorch_model.safetensors"))

    # text encoder: a REAL transformers CLIPTextModel at the tiny config
    # (random init) — exercises the true hub key names through the converter
    import torch
    from transformers import CLIPTextConfig as HfClipConfig, CLIPTextModel

    from consolver_tpu.models.clip_text import ClipTextConfig

    tcfg = ClipTextConfig.tiny()
    hf = CLIPTextModel(
        HfClipConfig(
            vocab_size=tcfg.vocab_size, hidden_size=tcfg.hidden_size,
            num_hidden_layers=tcfg.num_layers, num_attention_heads=tcfg.num_heads,
            intermediate_size=tcfg.intermediate_size,
            max_position_embeddings=tcfg.max_position_embeddings,
            hidden_act="quick_gelu",
        )
    )
    torch.manual_seed(0)
    tsd = {k: v.numpy().astype(np.float32) for k, v in hf.state_dict().items()
           if "position_ids" not in k}
    os.makedirs(os.path.join(src_root, "clip_text"), exist_ok=True)
    save_file(tsd, os.path.join(src_root, "clip_text", "model.safetensors"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    work = args.workdir or tempfile.mkdtemp(prefix="consolver_selftest_eval_")
    src, ckpts, out = (os.path.join(work, d) for d in ("src", "ckpts", "out"))
    print(f"[1/8] synthesizing tiny hub-layout checkpoints under {src}")
    synthesize_sources(src)

    from scripts import convert_checkpoints, evaluate, generate

    print("[2/8] converting via scripts/convert_checkpoints.py")
    for kind in ("unet", "vae", "clip_text"):
        run_cli(convert_checkpoints, [
            "--kind", kind, "--src", os.path.join(src, kind),
            "--dst", os.path.join(ckpts, kind), "--config", "tiny",
        ])

    print("[3/8] generating teacher + preview sweeps via scripts/generate.py")
    common = ["--pretrained", ckpts, "--latent-size", "8", "--max-prompts", "8",
              "--batch-size", "4"]
    run_cli(generate, ["--solver", "multistep-dpm", "--steps", "12",
                       "--out", os.path.join(out, "teacher")] + common)
    run_cli(generate, ["--solver", "consistencysolver", "--steps", "3",
                       "--out", os.path.join(out, "ours")] + common)

    print("[4/8] consistency stats via scripts/evaluate.py")
    stats_path = os.path.join(out, "stats.json")
    run_cli(evaluate, ["consistency", "--generated", os.path.join(out, "ours"),
                       "--reference", os.path.join(out, "teacher"),
                       "--reward", "image_psnr", "--out", stats_path])
    with open(stats_path) as f:
        stats = json.load(f)
    assert stats["num_scored"] == 8, stats
    assert stats["num_errors"] == 0, stats
    assert np.isfinite(stats["mean"]), stats

    print("[5/8] FID smoke via scripts/evaluate.py fid")
    run_cli(evaluate, ["fid", "--generated", os.path.join(out, "ours"),
                       "--reference", os.path.join(out, "teacher")])

    # ---- FLUX edit chain (edit_pretrain + generate_ours + EditScore) ----
    from PIL import Image

    from scripts import generate_edit, generate_teacher

    print("[6/8] edit data prep + edit teacher via generate_teacher.py --family flux")
    edit_src = os.path.join(work, "edit_src")
    os.makedirs(edit_src, exist_ok=True)
    rng = np.random.default_rng(1)
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 255, (24, 24, 3), dtype=np.uint8), "RGB"
        ).save(os.path.join(edit_src, f"im{i}.png"))
        with open(os.path.join(edit_src, f"im{i}.txt"), "w") as f:
            f.write(f"make it bluer {i}")
    from consolver_tpu.data.edit_prep import prepare_edit_set

    edit_prep = os.path.join(work, "edit_prepared")
    assert prepare_edit_set(edit_src, edit_prep, resolution=16) == 2
    run_cli(generate_teacher, [
        "--family", "flux", "--source", edit_prep,
        "--out", os.path.join(out, "edit_teacher"), "--steps", "2",
        "--batch-size", "2",
    ])
    import glob

    assert len(glob.glob(os.path.join(out, "edit_teacher", "*.npz"))) == 2

    print("[7/8] edit benchmark generation via scripts/generate_edit.py")
    run_cli(generate_edit, [
        "--source", edit_src, "--out", os.path.join(out, "edits"),
        "--solver", "euler", "--steps", "2", "--batch-size", "2",
    ])

    print("[8/8] EditScore via scripts/evaluate.py edit-score (tiny local VLM)")
    from tests.vlm_fixtures import build_tiny_llava

    judge = build_tiny_llava(os.path.join(work, "tiny_llava"))
    edit_stats_path = os.path.join(out, "edit_stats.json")
    run_cli(evaluate, ["edit-score", "--results", os.path.join(out, "edits"),
                       "--judge-ckpt", judge, "--out", edit_stats_path])
    with open(edit_stats_path) as f:
        estats = json.load(f)
    assert estats["num_scored"] == 2, estats
    assert 0.0 <= estats["mean"] <= 10.0, estats

    print("\nSELFTEST EVAL: PASS — full chain convert -> generate -> evaluate"
          " (SD) + prepare -> teacher -> edit-generate -> edit-score (FLUX)")
    print("With real checkpoints, the BASELINE.md reproduction is:")
    print("  python scripts/convert_checkpoints.py --kind unet --src <hub>/unet --dst ckpts/sd15/unet")
    print("  python scripts/convert_checkpoints.py --kind vae --src <hub>/vae --dst ckpts/sd15/vae")
    print("  python scripts/convert_checkpoints.py --kind clip_text --src <hub>/text_encoder --dst ckpts/sd15/clip_text")
    print("  python scripts/generate.py --solver consistencysolver --steps 8 --pretrained ckpts/sd15 \\")
    print("      --prompts coco_captions.json --factor-ckpt <model.ckpt dir> --out results/ours8")
    print("  python scripts/evaluate.py consistency --generated results/ours8 --reference results/teacher40 --reward dino")
    print("  python scripts/evaluate.py fid --generated results/ours8 --reference coco/val2017")
    if not args.keep and args.workdir is None:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
